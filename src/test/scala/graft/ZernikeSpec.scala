package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Zernike

class ZernikeSpec extends AnyFunSuite {

  test("Noll de-indexing matches the canonical table") {
    val expect = Seq(
      1 -> (0, 0), 2 -> (1, 1), 3 -> (1, -1), 4 -> (2, 0), 5 -> (2, -2),
      6 -> (2, 2), 7 -> (3, -1), 8 -> (3, 1), 9 -> (3, -3), 10 -> (3, 3),
      11 -> (4, 0), 12 -> (4, 2), 13 -> (4, -2), 14 -> (4, 4), 15 -> (4, -4))
    for ((j, nm) <- expect) assert(Zernike.nollToNM(j) === nm, s"j=$j")
  }

  test("radial polynomial: R_n^n = rho^n, R_2^0 = 2rho^2 - 1") {
    for (rho <- Seq(0.0, 0.3, 0.7, 1.0)) {
      assert(math.abs(Zernike.zernikeRad(3, 3, rho) - math.pow(rho, 3)) < 1e-12)
      assert(math.abs(Zernike.zernikeRad(0, 2, rho) - (2 * rho * rho - 1)) < 1e-12)
    }
  }

  test("first six modes equal the analytic forms used by the r08 query") {
    val pts = Seq((0.1, 0.2), (-0.3, 0.15), (0.0, 0.0), (0.5, -0.4))
    for ((x, y) <- pts) {
      val r2 = x * x + y * y
      assert(math.abs(Zernike.zernike(1, x, y) - 1.0) < 1e-12)
      assert(math.abs(Zernike.zernike(2, x, y) - 2 * x) < 1e-12)
      assert(math.abs(Zernike.zernike(3, x, y) - 2 * y) < 1e-12)
      assert(math.abs(Zernike.zernike(4, x, y) -
        math.sqrt(3.0) * (2 * r2 - 1)) < 1e-12)
      assert(math.abs(Zernike.zernike(5, x, y) -
        math.sqrt(6.0) * 2 * x * y) < 1e-12)
      assert(math.abs(Zernike.zernike(6, x, y) -
        math.sqrt(6.0) * (x * x - y * y)) < 1e-12)
    }
  }
}
