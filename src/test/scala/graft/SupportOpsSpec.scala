package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.WSCleanReader
import graft.operators.Deconv

class SupportOpsSpec extends AnyFunSuite {

  test("WSClean component list parses sexagesimal coords, SPI lists, defaults") {
    val text =
      """Format = Name, Type, Ra, Dec, I, SpectralIndex, LogarithmicSI, ReferenceFrequency='125584411.621094', MajorAxis, MinorAxis, Orientation
        |s0c0,POINT,08:00:00,-30.00.00,1.5,[0.5,-0.1],false,,,,
        |s0c1,GAUSSIAN,-04:30:00,52.30.15.5,2.0,[],true,130000000.0,20,10,45
        |""".stripMargin
    val comps = WSCleanReader.parse(text.linesIterator)
    assert(comps.length === 2)
    val p = comps(0)
    assert(p.compType === "POINT")
    assert(math.abs(p.ra - 8.0 * math.Pi / 12.0) < 1e-12)
    assert(math.abs(p.dec - math.toRadians(-30.0)) < 1e-12)
    assert(p.spi === Seq(0.5, -0.1))
    assert(!p.logSI)
    assert(p.refFreq === 125584411.621094) // header default
    val g = comps(1)
    assert(g.compType === "GAUSSIAN")
    assert(math.abs(g.ra - (-4.5 * math.Pi / 12.0)) < 1e-12)
    assert(math.abs(g.dec - math.toRadians(52.0 + 30.0 / 60 + 15.5 / 3600)) < 1e-12)
    assert(g.logSI && g.refFreq === 1.3e8)
    assert(math.abs(g.majorAxis - 20 * math.Pi / 648000.0) < 1e-15)
  }

  test("hogbom CLEAN with delta PSF recovers point fluxes") {
    val nx = 8; val ny = 8
    val img = new Array[Double](nx * ny)
    img(2 * ny + 3) = 1.0
    img(5 * ny + 6) = 0.5
    val psf = Array(0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0) // delta
    val r = Deconv.hogbomClean(img, nx, ny, psf, 1, gamma = 0.5,
      threshold = 1e-6, maxIter = 500)
    assert(r.residual.map(math.abs).max < 1e-6)
    val flux = r.components.groupBy(c => (c._1, c._2))
      .view.mapValues(_.map(_._3).sum).toMap
    assert(math.abs(flux((2, 3)) - 1.0) < 1e-5)
    assert(math.abs(flux((5, 6)) - 0.5) < 1e-5)
  }

  test("natural cubic spline passes through knots and is exact on lines") {
    val x = Array(0.0, 1.0, 2.5, 4.0, 5.0)
    val yLin = x.map(v => 2.0 * v + 1.0)
    val m = Deconv.fitCubicSpline(x, yLin)
    assert(m.forall(v => math.abs(v) < 1e-12)) // straight line: no curvature
    val mids = Array(0.5, 1.7, 3.3, 4.9)
    val got = Deconv.evalSpline(x, yLin, m, mids)
    mids.zip(got).foreach { case (xv, yv) =>
      assert(math.abs(yv - (2.0 * xv + 1.0)) < 1e-12)
    }
    // curved data: still interpolates the knots
    val yC = x.map(v => v * v)
    val mc = Deconv.fitCubicSpline(x, yC)
    val atKnots = Deconv.evalSpline(x, yC, mc, x)
    x.indices.foreach(i => assert(math.abs(atKnots(i) - yC(i)) < 1e-12))
  }

  test("kron matvec equals the explicit Kronecker product") {
    val a = Array(1.0, 2.0, 0.0, 3.0) // 2x2
    val b = Array(1.0, 0.0, 1.0, -1.0, 2.0, 0.5, 0.0, 1.0, 1.0) // 3x3
    val v = Array.tabulate(6)(i => i + 1.0)
    val got = Deconv.kronMatvec(Seq((a, 2), (b, 3)), v)
    // explicit kron(A, B) (6x6) times v
    val exp = new Array[Double](6)
    for (i <- 0 until 2; j <- 0 until 3; k <- 0 until 2; l <- 0 until 3)
      exp(i * 3 + j) += a(i * 2 + k) * b(j * 3 + l) * v(k * 3 + l)
    got.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
  }
}
