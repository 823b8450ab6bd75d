package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Kernels

class KernelsSpec extends AnyFunSuite {

  test("sinc kernel: unit peak, symmetric, zero at integer offsets") {
    val k = Kernels.sinc(3, 5)
    val n = 15
    assert(k(n) === 1.0)
    (1 to n).foreach(i => assert(k(n - i) === k(n + i)))
    (1 to 3).foreach(o => assert(math.abs(k(n + o * 5)) < 1e-15))
  }

  test("bessel I0 matches known values") {
    assert(math.abs(Kernels.besselI0(0.0) - 1.0) < 1e-15)
    assert(math.abs(Kernels.besselI0(1.0) - 1.2660658777520084) < 1e-12)
    assert(math.abs(Kernels.besselI0(3.0) - 4.880792585865024) < 1e-10)
  }

  test("windowed kernels taper the sinc tails") {
    val s = Kernels.sinc(3, 5)
    val kb = Kernels.kbSinc(3, 5)
    val hn = Kernels.hanningSinc(3, 5)
    assert(kb(15) === 1.0 && math.abs(hn(15) - 1.0) < 1e-12)
    // away from centre the windows shrink the magnitude
    for (i <- Seq(0, 2, 28, 30)) {
      assert(math.abs(kb(i)) <= math.abs(s(i)) + 1e-15)
      assert(math.abs(hn(i)) <= math.abs(s(i)) + 1e-15)
    }
  }

  test("taps extraction picks per-cell centre weights") {
    val k = Kernels.sinc(2, 5)
    val t = Kernels.taps(k, 2, 5)
    assert(t.length === 5)
    assert(t.find(_._1 == 0).get._2 === 1.0)
    assert(t.filter(_._1 != 0).forall(p => math.abs(p._2) < 1e-15))
  }
}
