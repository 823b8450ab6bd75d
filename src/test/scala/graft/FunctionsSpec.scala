package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.CxCol
import graft.functions._

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(cols: org.apache.spark.sql.Column*): Seq[Double] = {
    val row = Seq(1).toDF("x").select(cols: _*).head()
    (0 until row.length).map(i => row.getDouble(i))
  }

  test("radec_to_lmn / lmn_to_radec roundtrip is identity") {
    val (ra, dec, ra0, dec0) = (0.21, -0.39, 0.25, -0.38)
    val lmn = Coordinates.radecToLmn(lit(ra), lit(dec), lit(ra0), lit(dec0))
    val (ra2, dec2) = Coordinates.lmnToRadec(lmn.l, lmn.m, lmn.n, lit(ra0), lit(dec0))
    val Seq(raGot, decGot) = one(ra2, dec2)
    assert(math.abs(raGot - ra) < 1e-12 && math.abs(decGot - dec) < 1e-12)
  }

  test("lmn at phase centre is (0, 0, 1)") {
    val lmn = Coordinates.radecToLmn(lit(0.25), lit(-0.38), lit(0.25), lit(-0.38))
    val Seq(l, m, n) = one(lmn.l, lmn.m, lmn.n)
    assert(math.abs(l) < 1e-15 && math.abs(m) < 1e-15 && math.abs(n - 1.0) < 1e-15)
  }

  test("phase delay at l=m=0 is 1+0i; |K|=1 elsewhere") {
    val k0 = Phase.phaseDelay(lit(0.0), lit(0.0), lit(500.0), lit(300.0), lit(20.0), lit(1.4e9))
    val k1 = Phase.phaseDelay(lit(0.01), lit(-0.02), lit(500.0), lit(300.0), lit(20.0), lit(1.4e9))
    val Seq(re0, im0, a1) = one(k0.re, k0.im, k1.abs2)
    assert(re0 == 1.0 && im0 == 0.0)
    assert(math.abs(a1 - 1.0) < 1e-12)
  }

  test("casa convention is the conjugate of fourier") {
    val f = Phase.phaseDelay(lit(0.01), lit(0.02), lit(100.0), lit(50.0), lit(5.0), lit(1e9), "fourier")
    val c = Phase.phaseDelay(lit(0.01), lit(0.02), lit(100.0), lit(50.0), lit(5.0), lit(1e9), "casa")
    val Seq(fr, fi, cr, ci) = one(f.re, f.im, c.re, c.im)
    assert(fr == cr && fi == -ci)
  }

  test("spectral models equal flux at reference frequency") {
    val spi = Seq(lit(-0.7), lit(0.05))
    val std = Spectral.spectralModelStd(lit(2.5), spi, lit(1.4e9), lit(1.4e9))
    val lg = Spectral.spectralModelLog(lit(2.5), spi, lit(1.4e9), lit(1.4e9))
    val l10 = Spectral.spectralModelLog10(lit(2.5), spi, lit(1.4e9), lit(1.4e9))
    val ord = Spectral.wscleanOrdinary(lit(2.5), spi, lit(1.4e9), lit(1.4e9))
    assert(one(std, lg, l10, ord).forall(v => math.abs(v - 2.5) < 1e-12))
  }

  test("std power law matches closed form") {
    val got = one(Spectral.spectralModelStd(lit(2.0), Seq(lit(-0.7)), lit(1e9), lit(2e9))).head
    assert(math.abs(got - 2.0 * math.pow(2.0, -0.7)) < 1e-14)
  }

  test("stokes->corr->stokes roundtrip (linear feeds)") {
    val stokes = Map(
      "I" -> CxCol(lit(5.0), lit(0.5)), "Q" -> CxCol(lit(1.0), lit(-0.25)),
      "U" -> CxCol(lit(2.0), lit(0.125)), "V" -> CxCol(lit(-3.0), lit(1.5)))
    val corr = StokesConvert.convert(stokes, Seq("XX", "XY", "YX", "YY")).toMap
    val back = StokesConvert.convert(corr, Seq("I", "Q", "U", "V"))
    val vals = one(back.flatMap { case (_, z) => Seq(z.re, z.im) }: _*)
    val expect = Seq(5.0, 0.5, 1.0, -0.25, 2.0, 0.125, -3.0, 1.5)
    vals.zip(expect).foreach { case (g, e) => assert(g == e) }
  }

  test("corr->stokes->corr roundtrip (circular feeds)") {
    val corr = Map(
      "RR" -> CxCol(lit(4.0), lit(1.0)), "RL" -> CxCol(lit(0.5), lit(-2.0)),
      "LR" -> CxCol(lit(-1.5), lit(0.25)), "LL" -> CxCol(lit(2.0), lit(-0.5)))
    val stokes = StokesConvert.convert(corr, Seq("I", "Q", "U", "V")).toMap
    val back = StokesConvert.convert(stokes, Seq("RR", "RL", "LR", "LL"))
    val vals = one(back.flatMap { case (_, z) => Seq(z.re, z.im) }: _*)
    val expect = Seq(4.0, 1.0, 0.5, -2.0, -1.5, 0.25, 2.0, -0.5)
    vals.zip(expect).foreach { case (g, e) => assert(g == e) }
  }

  test("stokes convert fails at plan time on underivable target") {
    intercept[IllegalArgumentException] {
      StokesConvert.convert(Map("I" -> CxCol(lit(1.0), lit(0.0))), Seq("XX"))
    }
  }

  test("feed rotation: linear is a rotation matrix, circular is unitary diag") {
    val lin = Feeds.feedRotation(lit(0.3), "linear")
    val det = lin.m00 * lin.m11 - lin.m01 * lin.m10
    val cir = Feeds.feedRotation(lit(0.3), "circular")
    val Seq(dr, di, c2, z) = one(det.re, det.im, cir.m00.abs2, cir.m01.abs2)
    assert(math.abs(dr - 1.0) < 1e-15 && math.abs(di) < 1e-15)
    assert(math.abs(c2 - 1.0) < 1e-15 && z == 0.0)
  }

  test("jones 2x2 inverse: A * inv(A) = I") {
    val a = Feeds.Jones2x2(
      CxCol(lit(2.0), lit(1.0)), CxCol(lit(0.5), lit(-0.5)),
      CxCol(lit(-1.0), lit(0.25)), CxCol(lit(3.0), lit(-2.0)))
    val prod = Feeds.Jones2x2.mul(a, Feeds.Jones2x2.inv(a))
    val vals = one(prod.m00.re, prod.m00.im, prod.m01.re, prod.m01.im,
      prod.m10.re, prod.m10.im, prod.m11.re, prod.m11.im)
    val expect = Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0)
    vals.zip(expect).foreach { case (g, e) => assert(math.abs(g - e) < 1e-14) }
  }
}
