package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Deconv

/** I2: PSF main-lobe Gaussian fit + restore
  * (africanus/deconv/hogbom/clean.py:40-70, 202-236). */
class RestoreSpec extends AnyFunSuite {

  private val n = 41
  private val half = n / 2

  /** Synthetic PSF: known elliptical Gaussian (σx=3, σy=2, θ=0.4) plus
    * low-level sidelobe ripple OUTSIDE the half-max contour. */
  private def psf: Array[Double] = {
    val th = 0.4
    val (sx2, sy2) = (9.0, 4.0)
    val a = math.cos(th) * math.cos(th) / (2 * sx2) +
      math.sin(th) * math.sin(th) / (2 * sy2)
    val b = -math.sin(2 * th) / (4 * sx2) + math.sin(2 * th) / (4 * sy2)
    val c = math.sin(th) * math.sin(th) / (2 * sx2) +
      math.cos(th) * math.cos(th) / (2 * sy2)
    Array.tabulate(n * n) { i =>
      val dx = i / n - half; val dy = i % n - half
      val g = math.exp(-(a * dx * dx + 2 * b * dx * dy + c * dy * dy))
      g + (if (g < 0.05) 0.02 * math.cos(0.9 * dx) * math.cos(0.7 * dy) else 0.0)
    }
  }

  test("fitted beam recovers the generating quadratic form") {
    val beam = Deconv.fit2dGaussian(psf, n, n)
    // centre lands on the grid centre
    assert(math.abs(beam.x0 - half) < 0.15)
    assert(math.abs(beam.y0 - half) < 0.15)
    // the fitted gaussian matches the generator pointwise on the main lobe
    val th = 0.4
    val (sx2, sy2) = (9.0, 4.0)
    val a = math.cos(th) * math.cos(th) / (2 * sx2) +
      math.sin(th) * math.sin(th) / (2 * sy2)
    val b = -math.sin(2 * th) / (4 * sx2) + math.sin(2 * th) / (4 * sy2)
    val c = math.sin(th) * math.sin(th) / (2 * sx2) +
      math.cos(th) * math.cos(th) / (2 * sy2)
    for (p <- Seq(a -> beam.a, b -> beam.b, c -> beam.c)) {
      assert(math.abs(p._1 - p._2) < 0.15 * math.max(math.abs(p._1), 0.05),
        s"expected ${p._1}, fitted ${p._2}")
    }
  }

  test("restore = beam-convolved model + residuals, against an explicit fixture") {
    val nx = 16; val ny = 16
    val clean = new Array[Double](nx * ny)
    clean(5 * ny + 6) = 2.0
    clean(10 * ny + 12) = -0.5
    val residual = Array.tabulate(nx * ny)(i => 0.01 * (i % 7))
    val (restored, conv) =
      Deconv.restore(clean, nx, ny, psf, n, n, residual, support = 8)
    val beam = Deconv.fit2dGaussian(psf, n, n)
    // explicit direct convolution of the two components
    for (x <- 0 until nx; y <- 0 until ny) {
      val d1x = x - 5; val d1y = y - 6
      val d2x = x - 10; val d2y = y - 12
      val expectConv =
        (if (math.abs(d1x) <= 8 && math.abs(d1y) <= 8) 2.0 * beam(d1x, d1y) else 0.0) +
          (if (math.abs(d2x) <= 8 && math.abs(d2y) <= 8) -0.5 * beam(d2x, d2y) else 0.0)
      assert(math.abs(conv(x * ny + y) - expectConv) < 1e-12)
      assert(math.abs(restored(x * ny + y) - (expectConv + residual(x * ny + y))) < 1e-12)
    }
    // peak of the convolved model sits at the positive component
    val peak = conv.zipWithIndex.maxBy(_._1)._2
    assert(peak === 5 * ny + 6)
  }
}
