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

  test("separable detaper equals the full 2-D DFT detaper for separable kernels") {
    val taps = graft.queries.GriddingQ.Taps
    for (x <- Seq(-0.004, 0.0, 0.0013, 0.02); y <- Seq(-0.01, 0.0, 0.003)) {
      val sep = Kernels.detaperDftSeparable(taps, x) *
        Kernels.detaperDftSeparable(taps, y)
      val full = Kernels.detaperDft2d(taps, x, y)
      assert(math.abs(sep - full) < 1e-12, s"($x, $y): $sep vs $full")
    }
    // at the image centre the detaper is the kernel's DC gain squared
    val dc = taps.map(_._2).sum
    assert(math.abs(Kernels.detaperDft2d(taps, 0.0, 0.0) - dc * dc) < 1e-12)
    // and it matches the inline taper WStack.dirtyImageDft divides by:
    // same cos-sum, evaluated on a Column — checked via a 1-row frame
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val c = spark.range(1).select(lit(0.0013).as("lx"))
    val inline = taps.map { case (off, tap) =>
      lit(tap) * cos(lit(2.0 * math.Pi) * lit(off.toDouble) * col("lx"))
    }.reduce(_ + _)
    val got = c.select(inline.as("t")).head.getDouble(0)
    assert(math.abs(got - Kernels.detaperDftSeparable(taps, 0.0013)) < 1e-15)
  }

  test("f15 kernel values stay far from their r4 flip boundaries") {
    // f15 r4-hashes the sinc and hanning-sinc arrays against a DuckDB
    // libm recompute of the same bit-identical arguments; the class-(d)
    // precondition is a measured margin around every round(v*1e4)
    // boundary, far above the ~1-ulp cross-libm noise.
    val sv = Kernels.sinc(7, 5); val hv = Kernels.hanningSinc(7, 5)
    var minM = Double.MaxValue
    for (v <- sv ++ hv) {
      val t = math.abs(v) * 1e4
      minM = math.min(minM, math.abs(t - math.floor(t) - 0.5))
    }
    info(s"f15 kernel min |frac(|v|*1e4)-.5| = $minM over ${sv.length * 2} values")
    assert(minM > 1e-9, s"a kernel value sits within 1e-9 of an r4 boundary")
  }
}
