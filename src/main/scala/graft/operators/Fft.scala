package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plane-parallel dense FFT — the production imaging back half of the
  * w-stack (SURVEY §2.7 F1-F5). The reference delegates grid→image to
  * ducc0's C++ FFT inside each dask chunk
  * (africanus/gridding/wgridder/vis2im.py:15-196); the Spark-native
  * equivalent is the same locality: each w-plane's dense grid transforms
  * INDEPENDENTLY inside one `flatMapGroups` task, so an image with P
  * planes uses P-way parallelism with zero cross-plane traffic, and only
  * the final image-domain plane sum (a (x, y)-keyed aggregation whose
  * volume is the image size, not the data size) shuffles.
  *
  * The JVM kernel is an iterative in-place radix-2 Cooley-Tukey transform
  * — O(n² log n) per plane, adequate for the dense-image sizes a single
  * executor core handles (a 4k² plane ≈ 0.27 GiB complex double); larger
  * images tile by plane AND sub-band before this step.
  *
  * Correctness story: [[WStack.dirtyImageDft]] is the oracle-checked
  * sparse-DFT variant of the same algebra (hash-matched against DuckDB in
  * f11); FftSpec proves this kernel equals the naive DFT and preserves
  * Parseval/round-trip identities, tying the fast path to the verified
  * one.
  */
object Fft {

  /** In-place complex FFT, length a power of two. `sign` +1 gives the
    * e^{+2πi jk/n} (synthesis/imaging) convention, −1 the analysis one;
    * no normalization on either direction. */
  def fft1d(re: Array[Double], im: Array[Double], sign: Int): Unit = {
    val n = re.length
    require(n > 0 && (n & (n - 1)) == 0, s"fft length $n not a power of 2")
    // bit-reversal permutation
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = sign * 2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cwr = 1.0; var cwi = 0.0
        var k = 0
        val half = len >> 1
        while (k < half) {
          val a = base + k; val b = a + half
          val vr = re(b) * cwr - im(b) * cwi
          val vi = re(b) * cwi + im(b) * cwr
          re(b) = re(a) - vr; im(b) = im(a) - vi
          re(a) += vr; im(a) += vi
          val t = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr; cwr = t
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** In-place 2-D FFT of a flat row-major n×n complex grid. */
  def fft2d(re: Array[Double], im: Array[Double], n: Int, sign: Int): Unit = {
    require(re.length == n * n && im.length == n * n)
    val tr = new Array[Double](n); val ti = new Array[Double](n)
    // rows
    var r = 0
    while (r < n) {
      System.arraycopy(re, r * n, tr, 0, n)
      System.arraycopy(im, r * n, ti, 0, n)
      fft1d(tr, ti, sign)
      System.arraycopy(tr, 0, re, r * n, n)
      System.arraycopy(ti, 0, im, r * n, n)
      r += 1
    }
    // columns
    var c = 0
    while (c < n) {
      var k = 0
      while (k < n) { tr(k) = re(k * n + c); ti(k) = im(k * n + c); k += 1 }
      fft1d(tr, ti, sign)
      k = 0
      while (k < n) { re(k * n + c) = tr(k); im(k * n + c) = ti(k); k += 1 }
      c += 1
    }
  }

  /** Sparse plane grids (wplane, gu, gv, g_re, g_im) → per-plane dense
    * transform on the n×n FFT lattice. Cell coordinates fold mod n (the
    * DFT is periodic, so folding is exact, not an approximation). Output:
    * one row per (wplane, x, y) with the transformed value — image pixels
    * on the lattice l = x/n cycles. */
  def planeImages(grids: DataFrame, n: Int, sign: Int = 1): DataFrame = {
    val s = grids.sparkSession
    import s.implicits._
    grids.select(col("wplane").cast("long"), col("gu").cast("long"),
        col("gv").cast("long"), col("g_re").cast("double"),
        col("g_im").cast("double"))
      .as[(Long, Long, Long, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (p: Long, it: Iterator[(Long, Long, Long, Double, Double)]) =>
        val re = new Array[Double](n * n)
        val im = new Array[Double](n * n)
        it.foreach { case (_, gu, gv, gre, gim) =>
          val iu = (((gu % n) + n) % n).toInt
          val iv = (((gv % n) + n) % n).toInt
          re(iu * n + iv) += gre
          im(iu * n + iv) += gim
        }
        fft2d(re, im, n, sign)
        // emit lazily: a strict n²-element collection of boxed tuples on
        // top of the two double arrays would dominate task memory at
        // production plane sizes (4k² ⇒ >16M tuples); the iterator
        // streams rows out while only the primitive arrays stay live
        Iterator.range(0, n * n).map { idx =>
          (p, (idx / n).toLong, (idx % n).toLong, re(idx), im(idx))
        }
      }
      .toDF("wplane", "x", "y", "ire", "iim")
  }
}
