package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Deconv

/** Kronecker tools vs explicitly materialized dense operators
  * (linalg/kronecker_tools.py) — the reference's own test strategy. */
class KronSpec extends AnyFunSuite {

  // dense kron of row-major (r1×c1) ⊗ (r2×c2)
  private def kron2(a: Array[Double], r1: Int, c1: Int,
                    b: Array[Double], r2: Int, c2: Int): (Array[Double], Int, Int) = {
    val (rr, cc) = (r1 * r2, c1 * c2)
    val out = new Array[Double](rr * cc)
    for (i <- 0 until r1; j <- 0 until c1; k <- 0 until r2; l <- 0 until c2)
      out((i * r2 + k) * cc + (j * c2 + l)) = a(i * c1 + j) * b(k * c2 + l)
    (out, rr, cc)
  }

  private def matvec(a: Array[Double], r: Int, c: Int, x: Array[Double]) =
    Array.tabulate(r)(i => (0 until c).map(j => a(i * c + j) * x(j)).sum)

  private val a2 = Array(1.0, 0.5, -0.25, 2.0) // 2×2
  private val b3 = Array(0.5, 0.0, 1.0, -1.0, 0.25, 0.0, 0.75, 0.5, 2.0) // 3×3
  private val r23 = Array(1.0, -0.5, 0.25, 0.0, 2.0, 1.0) // 2×3 rectangular

  test("kronMatvec equals the dense Kronecker matvec") {
    val (dense, n, _) = kron2(a2, 2, 2, b3, 3, 3)
    val x = Array.tabulate(6)(i => (i % 4 - 1.5) / 2.0)
    val got = Deconv.kronMatvec(Seq((a2, 2), (b3, 3)), x)
    val want = matvec(dense, n, n, x)
    assert(got.zip(want).forall { case (g, w) => math.abs(g - w) < 1e-12 })
  }

  test("kronTensorvec handles rectangular factors") {
    // (2×3) ⊗ (3×3): maps length-9 vectors to length-6
    val (dense, r, c) = kron2(r23, 2, 3, b3, 3, 3)
    val x = Array.tabulate(c)(i => ((i * 5) % 7 - 3) / 4.0)
    val got = Deconv.kronTensorvec(Seq((r23, 2, 3), (b3, 3, 3)), x)
    val want = matvec(dense, r, c, x)
    assert(got.length === r)
    assert(got.zip(want).forall { case (g, w) => math.abs(g - w) < 1e-12 })
  }

  test("kronMatmat and kronTensormat equal dense products column-wise") {
    val (dense, n, _) = kron2(a2, 2, 2, b3, 3, 3)
    val m = 2
    val bMat = Array.tabulate(6 * m)(i => ((i * 3) % 5 - 2) / 4.0)
    val got = Deconv.kronMatmat(Seq((a2, 2), (b3, 3)), bMat, m)
    for (j <- 0 until m) {
      val colX = Array.tabulate(6)(i => bMat(i * m + j))
      val want = matvec(dense, n, n, colX)
      for (i <- 0 until n) assert(math.abs(got(i * m + j) - want(i)) < 1e-12)
    }
    val (denseR, rr, cc) = kron2(r23, 2, 3, b3, 3, 3)
    val bR = Array.tabulate(cc * m)(i => ((i * 7) % 9 - 4) / 8.0)
    val gotR = Deconv.kronTensormat(Seq((r23, 2, 3), (b3, 3, 3)), bR, m)
    for (j <- 0 until m) {
      val colX = Array.tabulate(cc)(i => bR(i * m + j))
      val want = matvec(denseR, rr, cc, colX)
      for (i <- 0 until rr) assert(math.abs(gotR(i * m + j) - want(i)) < 1e-12)
    }
  }

  test("kronCholesky: per-factor L·Lᵀ reproduces each SPD factor") {
    val spd1 = Array(4.0, 1.0, 1.0, 3.0) // 2×2 SPD
    val spd2 = Array(2.0, 0.5, 0.0, 0.5, 2.0, 0.25, 0.0, 0.25, 1.0) // 3×3 SPD
    val ls = Deconv.kronCholesky(Seq((spd1, 2), (spd2, 3)))
    for (((l, n), a) <- ls.zip(Seq(spd1, spd2))) {
      for (i <- 0 until n; j <- 0 until n) {
        val llT = (0 until n).map(k => l(i * n + k) * l(j * n + k)).sum
        assert(math.abs(llT - a(i * n + j)) < 1e-12, s"LLt($i,$j)")
        if (j > i) assert(l(i * n + j) === 0.0, "not lower-triangular")
      }
    }
    // the jitter path: a positive-semidefinite factor (rank-1) succeeds
    val psd = Array(1.0, 1.0, 1.0, 1.0)
    val lj = Deconv.kronCholesky(Seq((psd, 2))).head._1
    assert(!lj.exists(_.isNaN))
  }
}
