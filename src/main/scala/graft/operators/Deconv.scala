package graft.operators

/** Image-domain deconvolution + numeric support utilities — SURVEY §2.8 I1
  * (hogbom CLEAN), §2.5 A10 (natural cubic splines), §2.9 L1 (Kronecker
  * products). All driver-side: a single image/spline/factor set fits in
  * memory (the reference's position too — these are support code around
  * the distributed operators, e.g. per-facet CLEAN via mapGroups).
  */
object Deconv {

  final case class CleanResult(
      components: Seq[(Int, Int, Double)], // (x, y, flux)
      residual: Array[Double], iterations: Int)

  /** Hogbom CLEAN (africanus/deconv/hogbom/clean.py:122-198): find the
    * absolute peak, subtract gamma·peak·shifted-PSF, accumulate the clean
    * component, until |peak| < threshold or niter. `psf` is (2n+1)²,
    * centre at (n, n). */
  def hogbomClean(image: Array[Double], nx: Int, ny: Int,
                  psf: Array[Double], psfHalf: Int,
                  gamma: Double = 0.1, threshold: Double = 1e-3,
                  maxIter: Int = 200): CleanResult = {
    val res = image.clone()
    val comps = Seq.newBuilder[(Int, Int, Double)]
    var it = 0
    var run = true
    while (run && it < maxIter) {
      var peak = 0.0; var px = 0; var py = 0
      var i = 0
      while (i < res.length) {
        val a = math.abs(res(i))
        if (a > peak) { peak = a; px = i / ny; py = i % ny }
        i += 1
      }
      if (peak < threshold) run = false
      else {
        val flux = gamma * res(px * ny + py)
        comps += ((px, py, flux))
        var dx = -psfHalf
        while (dx <= psfHalf) {
          var dy = -psfHalf
          while (dy <= psfHalf) {
            val x = px + dx; val y = py + dy
            if (x >= 0 && x < nx && y >= 0 && y < ny)
              res(x * ny + y) -=
                flux * psf((dx + psfHalf) * (2 * psfHalf + 1) + (dy + psfHalf))
            dy += 1
          }
          dx += 1
        }
        it += 1
      }
    }
    CleanResult(comps.result(), res, it)
  }

  /** Natural cubic spline fit (africanus/averaging/splines.py:14-130):
    * returns second derivatives via the tridiagonal solve. */
  def fitCubicSpline(x: Array[Double], y: Array[Double]): Array[Double] = {
    val n = x.length
    val m = new Array[Double](n) // second derivatives, natural: m(0)=m(n-1)=0
    if (n < 3) return m
    val a = new Array[Double](n); val b = new Array[Double](n)
    val c = new Array[Double](n); val d = new Array[Double](n)
    for (i <- 1 until n - 1) {
      a(i) = (x(i) - x(i - 1)) / 6.0
      b(i) = (x(i + 1) - x(i - 1)) / 3.0
      c(i) = (x(i + 1) - x(i)) / 6.0
      d(i) = (y(i + 1) - y(i)) / (x(i + 1) - x(i)) -
        (y(i) - y(i - 1)) / (x(i) - x(i - 1))
    }
    // Thomas algorithm on rows 1..n-2
    for (i <- 2 until n - 1) {
      val w = a(i) / b(i - 1)
      b(i) -= w * c(i - 1)
      d(i) -= w * d(i - 1)
    }
    m(n - 2) = d(n - 2) / b(n - 2)
    for (i <- n - 3 to 1 by -1) m(i) = (d(i) - c(i) * m(i + 1)) / b(i)
    m
  }

  /** Evaluate the fitted spline at `xs`. */
  def evalSpline(x: Array[Double], y: Array[Double], m: Array[Double],
                 xs: Array[Double]): Array[Double] =
    xs.map { xv =>
      var i = java.util.Arrays.binarySearch(x, xv)
      if (i < 0) i = -i - 2
      val j = math.max(0, math.min(i, x.length - 2))
      val h = x(j + 1) - x(j)
      val t = (x(j + 1) - xv) / h
      val u = (xv - x(j)) / h
      t * y(j) + u * y(j + 1) +
        ((t * t * t - t) * m(j) + (u * u * u - u) * m(j + 1)) * h * h / 6.0
    }

  /** Kronecker matrix-vector product (⊗_d A_d)·b without materializing
    * the full operator (africanus/linalg/kronecker_tools.py:58-96).
    * Each A_d is square (n_d x n_d), row-major. */
  def kronMatvec(factors: Seq[(Array[Double], Int)], b: Array[Double]): Array[Double] = {
    var x = b.clone()
    val total = x.length
    for ((a, n) <- factors) {
      val cols = total / n
      val out = new Array[Double](total)
      // reshape x as (n, cols): out = A · X, then transpose-roll
      var r = 0
      while (r < n) {
        var k = 0
        while (k < n) {
          val av = a(r * n + k)
          if (av != 0.0) {
            var c = 0
            while (c < cols) {
              out(c * n + r) += av * x(k * cols + c)
              c += 1
            }
          }
          k += 1
        }
        r += 1
      }
      x = out
    }
    x
  }

  /** Rectangular Kronecker tensor-vector product (⊗_d A_d)·b where each
    * A_d is (m_d × g_d) row-major (kron_tensorvec,
    * africanus/linalg/kronecker_tools.py:62-99): per-factor reshape →
    * multiply → transpose-roll, with the dimension table updated as each
    * rectangular factor changes the length. */
  def kronTensorvec(factors: Seq[(Array[Double], Int, Int)],
                    b: Array[Double]): Array[Double] = {
    var x = b.clone()
    val gs = factors.map(_._3).toArray
    for (d <- factors.indices) {
      val (a, m, g) = factors(d)
      val rem = gs.indices.filterNot(_ == d).map(gs(_).toLong).product.toInt max 1
      val out = new Array[Double](m * rem)
      var r = 0
      while (r < m) {
        var k = 0
        while (k < g) {
          val av = a(r * g + k)
          if (av != 0.0) {
            var c = 0
            while (c < rem) { out(c * m + r) += av * x(k * rem + c); c += 1 }
          }
          k += 1
        }
        r += 1
      }
      gs(d) = m
      x = out
    }
    x
  }

  /** Kronecker matrix × dense matrix: each RHS column through
    * [[kronMatvec]] (kron_matmat, kronecker_tools.py:102-126). B is
    * row-major (n × m). */
  def kronMatmat(factors: Seq[(Array[Double], Int)], b: Array[Double],
                 m: Int): Array[Double] = {
    val n = b.length / m
    val out = new Array[Double](n * m)
    val colBuf = new Array[Double](n)
    for (j <- 0 until m) {
      var i = 0
      while (i < n) { colBuf(i) = b(i * m + j); i += 1 }
      val r = kronMatvec(factors, colBuf)
      i = 0
      while (i < n) { out(i * m + j) = r(i); i += 1 }
    }
    out
  }

  /** Rectangular variant of [[kronMatmat]] (kron_tensormat,
    * kronecker_tools.py:129-155). */
  def kronTensormat(factors: Seq[(Array[Double], Int, Int)],
                    b: Array[Double], m: Int): Array[Double] = {
    val g = b.length / m
    val n = factors.map(_._2.toLong).product.toInt
    val out = new Array[Double](n * m)
    val colBuf = new Array[Double](g)
    for (j <- 0 until m) {
      var i = 0
      while (i < g) { colBuf(i) = b(i * m + j); i += 1 }
      val r = kronTensorvec(factors, colBuf)
      i = 0
      while (i < n) { out(i * m + j) = r(i); i += 1 }
    }
    out
  }

  /** Dense lower-triangular Cholesky factor of a row-major SPD matrix;
    * throws on a non-positive pivot. */
  def cholesky(a: Array[Double], n: Int): Array[Double] = {
    val l = new Array[Double](n * n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j <= i) {
        var s = 0.0
        var k = 0
        while (k < j) { s += l(i * n + k) * l(j * n + k); k += 1 }
        if (i == j) {
          val d = a(i * n + i) - s
          require(d > 0.0, s"non-positive pivot $d at $i")
          l(i * n + i) = math.sqrt(d)
        } else l(i * n + j) = (a(i * n + j) - s) / l(j * n + j)
        j += 1
      }
      i += 1
    }
    l
  }

  /** Cholesky of a Kronecker matrix = Kronecker of per-factor Choleskys,
    * with the reference's 1e-13 diagonal jitter retry (kron_cholesky,
    * kronecker_tools.py:158-185). */
  def kronCholesky(factors: Seq[(Array[Double], Int)]): Seq[(Array[Double], Int)] =
    factors.map { case (a, n) =>
      val l = try cholesky(a, n) catch {
        case _: IllegalArgumentException =>
          val jit = a.clone()
          var i = 0
          while (i < n) { jit(i * n + i) += 1e-13; i += 1 }
          cholesky(jit, n)
      }
      (l, n)
    }

  // ---- I2: PSF beam fit + restore (africanus/deconv/hogbom/clean.py) ----

  /** Elliptical clean beam: g(x,y) = exp(-(a·dx² + 2b·dx·dy + c·dy²)),
    * peak-normalized like the reference (clean.py:67-70). */
  final case class Beam2D(x0: Double, y0: Double, a: Double, b: Double,
                          c: Double) {
    def apply(dx: Double, dy: Double): Double =
      math.exp(-(a * dx * dx + 2.0 * b * dx * dy + c * dy * dy))
  }

  /** Fit the elliptical Gaussian to the PSF's primary lobe
    * (clean.py:40-70). The reference runs scipy's curve_fit over the
    * 7-parameter model on pixels ≥ half max; here the same model family is
    * fit in closed form from the half-max lobe's weighted second moments,
    * corrected for the truncation (a Gaussian observed only inside its
    * half-max contour has per-axis weighted variance (1 − ln 2)·σ², so the
    * measured covariance is divided by (1 − ln 2) before inversion). */
  def fit2dGaussian(psf: Array[Double], nx: Int, ny: Int): Beam2D = {
    val mx = psf.max
    val thr = 0.5 * mx
    var sw = 0.0; var swx = 0.0; var swy = 0.0
    var i = 0
    while (i < psf.length) {
      val w = psf(i)
      if (w >= thr) { sw += w; swx += w * (i / ny); swy += w * (i % ny) }
      i += 1
    }
    val x0 = swx / sw; val y0 = swy / sw
    var cxx = 0.0; var cxy = 0.0; var cyy = 0.0
    i = 0
    while (i < psf.length) {
      val w = psf(i)
      if (w >= thr) {
        val dx = i / ny - x0; val dy = i % ny - y0
        cxx += w * dx * dx; cxy += w * dx * dy; cyy += w * dy * dy
      }
      i += 1
    }
    val corr = 1.0 - math.log(2.0)
    cxx /= sw * corr; cxy /= sw * corr; cyy /= sw * corr
    // quadratic form = covariance⁻¹ / 2
    val det = cxx * cyy - cxy * cxy
    Beam2D(x0, y0, cyy / (2.0 * det), -cxy / (2.0 * det), cxx / (2.0 * det))
  }

  /** Restore (clean.py:202-236): convolve the clean model with the fitted
    * beam and add the residuals. Direct convolution over the clean image's
    * NONZERO components only (clean models are sparse by construction);
    * `support` bounds the beam footprint. Returns (restored, convModel). */
  def restore(clean: Array[Double], nx: Int, ny: Int,
              psf: Array[Double], psfNx: Int, psfNy: Int,
              residual: Array[Double],
              support: Int = 10): (Array[Double], Array[Double]) = {
    val beam = fit2dGaussian(psf, psfNx, psfNy)
    val conv = new Array[Double](nx * ny)
    var i = 0
    while (i < clean.length) {
      val flux = clean(i)
      if (flux != 0.0) {
        val cx = i / ny; val cy = i % ny
        var dx = -support
        while (dx <= support) {
          var dy = -support
          while (dy <= support) {
            val x = cx + dx; val y = cy + dy
            if (x >= 0 && x < nx && y >= 0 && y < ny)
              conv(x * ny + y) += flux * beam(dx, dy)
            dy += 1
          }
          dx += 1
        }
      }
      i += 1
    }
    val restored = new Array[Double](nx * ny)
    i = 0
    while (i < restored.length) {
      restored(i) = conv(i) + residual(i); i += 1
    }
    (restored, conv)
  }
}
