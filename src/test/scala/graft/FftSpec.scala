package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Fft

/** The plane-parallel FFT kernel vs first principles: naive-DFT equality,
  * Parseval, round trip, and the distributed planeImages path vs a direct
  * per-plane DFT of the same sparse cells — tying the fast imaging path to
  * the algebra the f11 oracle hash-verifies. */
class FftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // deterministic dyadic pseudo-data
  private def fill(n: Int, salt: Int): (Array[Double], Array[Double]) = {
    val re = Array.tabulate(n)(i => ((i * 7 + salt * 3) % 17 - 8) / 16.0)
    val im = Array.tabulate(n)(i => ((i * 11 + salt * 5) % 13 - 6) / 16.0)
    (re, im)
  }

  private def naiveDft1d(re: Array[Double], im: Array[Double], sign: Int) = {
    val n = re.length
    val or = new Array[Double](n); val oi = new Array[Double](n)
    for (k <- 0 until n; j <- 0 until n) {
      val a = sign * 2.0 * math.Pi * j * k / n
      or(k) += re(j) * math.cos(a) - im(j) * math.sin(a)
      oi(k) += re(j) * math.sin(a) + im(j) * math.cos(a)
    }
    (or, oi)
  }

  test("fft1d equals the naive DFT (both signs)") {
    for (sign <- Seq(1, -1); n <- Seq(8, 16, 64)) {
      val (re, im) = fill(n, sign + 2)
      val (er, ei) = naiveDft1d(re, im, sign)
      fft1d_check(re, im, er, ei, sign)
    }
  }

  private def fft1d_check(re0: Array[Double], im0: Array[Double],
                          er: Array[Double], ei: Array[Double], sign: Int): Unit = {
    val re = re0.clone(); val im = im0.clone()
    Fft.fft1d(re, im, sign)
    val err = (0 until re.length)
      .map(i => math.hypot(re(i) - er(i), im(i) - ei(i))).max
    assert(err < 1e-10, s"fft1d vs DFT err=$err sign=$sign n=${re.length}")
  }

  test("Parseval: sum|X|^2 == N^2 * sum|x|^2 for the 2-D transform") {
    val n = 16
    val (re, im) = fill(n * n, 9)
    val inRe = re.clone(); val inIm = im.clone()
    Fft.fft2d(re, im, n, 1)
    val eIn = (0 until n * n).map(i => inRe(i) * inRe(i) + inIm(i) * inIm(i)).sum
    val eOut = (0 until n * n).map(i => re(i) * re(i) + im(i) * im(i)).sum
    assert(math.abs(eOut - n * n * eIn) / (n * n * eIn) < 1e-12)
  }

  test("round trip: inverse(forward(x)) / N^2 == x") {
    val n = 16
    val (re, im) = fill(n * n, 4)
    val inRe = re.clone(); val inIm = im.clone()
    Fft.fft2d(re, im, n, 1)
    Fft.fft2d(re, im, n, -1)
    val err = (0 until n * n)
      .map(i => math.hypot(re(i) / (n * n) - inRe(i), im(i) / (n * n) - inIm(i))).max
    assert(err < 1e-12)
  }

  test("planeImages equals a direct sparse DFT per plane (mod-n folding exact)") {
    import spark.implicits._
    val n = 8
    // sparse cells on 2 planes, coordinates deliberately OUTSIDE [0, n)
    val cells = Seq(
      (0L, -3L, 2L, 0.5, -0.25), (0L, 9L, -1L, 1.0, 0.125),
      (0L, 4L, 4L, -0.75, 0.5), (1L, 0L, 0L, 2.0, -1.0),
      (1L, -9L, 13L, 0.25, 0.25), (1L, 3L, -5L, -0.5, 0.0625))
    val grids = cells.toDF("wplane", "gu", "gv", "g_re", "g_im")
    val got = Fft.planeImages(grids, n).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    assert(got.size === 2 * n * n)
    for (p <- 0L to 1L; x <- 0 until n; y <- 0 until n) {
      var er = 0.0; var ei = 0.0
      cells.filter(_._1 == p).foreach { case (_, gu, gv, gre, gim) =>
        val a = 2.0 * math.Pi * (gu * x + gv * y).toDouble / n
        er += gre * math.cos(a) - gim * math.sin(a)
        ei += gre * math.sin(a) + gim * math.cos(a)
      }
      val (gr, gi) = got((p, x.toLong, y.toLong))
      assert(math.hypot(gr - er, gi - ei) < 1e-9,
        s"plane $p pixel ($x,$y): fft=($gr,$gi) dft=($er,$ei)")
    }
  }

  test("f11 algebra: the oracle DFT image matches the reference adjoint at pixel scale") {
    // adjointness of grid→image against image→vis sampling: for the DFT
    // image I(px) = Σ_c g_c e^{iθ}, <I, δ_px> must equal the θ-weighted
    // gather of g — i.e. the dirty image IS the adjoint applied to the
    // gridded data. Checked through the operator on a small fixture.
    import spark.implicits._
    val grids = Seq((0L, 1L, 0L, 1.0, 0.0), (0L, 0L, 2L, 0.5, 0.5))
      .toDF("wplane", "gu", "gv", "g_re", "g_im")
    val px = Seq((0L, 0L), (1L, 1L), (2L, 3L)).toDF("x", "y")
      .withColumn("lx", (col("x").cast("double") - lit(4e0)) / 1024e0)
      .withColumn("my", (col("y").cast("double") - lit(4e0)) / 1024e0)
    val out = graft.operators.WStack.dirtyImageDft(grids, px,
        graft.queries.GriddingQ.Taps, nPlanes = 4, wMax = 5.0,
        fsum = c => graft.core.Det.fsum(c, 1e9), r6 = graft.core.Det.r9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (((x, y), got) <- out) {
      val lx = (x - 4.0) / 1024.0; val my = (y - 4.0) / 1024.0
      // wplane 0 → wp = -5; η = -(lx²+my²)/2
      val ph = 2.0 * math.Pi * -5.0 * (-(lx * lx + my * my) / 2.0)
      var ir = 0.0; var ii = 0.0
      Seq((1L, 0L, 1.0, 0.0), (0L, 2L, 0.5, 0.5)).foreach { case (gu, gv, gre, gim) =>
        val a = 2.0 * math.Pi * (gu * lx + gv * my)
        ir += gre * math.cos(a) - gim * math.sin(a)
        ii += gre * math.sin(a) + gim * math.cos(a)
      }
      val want = ir * math.cos(ph) - ii * math.sin(ph)
      assert(math.abs(got - want) < 1e-6, s"pixel ($x,$y): $got vs $want")
    }
  }
}
