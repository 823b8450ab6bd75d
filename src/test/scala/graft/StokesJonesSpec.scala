package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.CxCol
import graft.functions.{Feeds, StokesConvert}

/** Schema-driven stokes planner fallback chains + Jones 2x2 algebra. */
class StokesJonesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def eval(cols: Seq[(String, CxCol)]): Map[String, (Double, Double)] = {
    val df = spark.range(1).select(
      cols.flatMap { case (n, z) =>
        Seq(z.re.as(s"${n}_re"), z.im.as(s"${n}_im"))
      }: _*)
    val r = df.collect()(0)
    cols.zipWithIndex.map { case ((n, _), i) =>
      n -> (r.getDouble(2 * i), r.getDouble(2 * i + 1))
    }.toMap
  }

  test("circular correlations derive stokes via the RR/LL/RL/LR chain") {
    // I=2, Q=0.5, U=-1, V=0.25 -> RR=I+V, LL=I-V, RL=Q+iU, LR=Q-iU
    val in = Map(
      "RR" -> CxCol(lit(2.25), lit(0.0)), "LL" -> CxCol(lit(1.75), lit(0.0)),
      "RL" -> CxCol(lit(0.5), lit(-1.0)), "LR" -> CxCol(lit(0.5), lit(1.0)))
    val got = eval(StokesConvert.convert(in, Seq("I", "Q", "U", "V")))
    assert(got("I") === ((2.0, 0.0)))
    assert(got("Q") === ((0.5, 0.0)))
    assert(got("U") === ((-1.0, 0.0)))
    assert(got("V") === ((0.25, 0.0)))
  }

  test("underivable targets fail at plan time") {
    val in = Map("XX" -> CxCol(lit(1.0), lit(0.0)))
    assertThrows[IllegalArgumentException](
      StokesConvert.convert(in, Seq("I"))) // needs YY too
  }

  test("CASA integer ids resolve through the casacore enumeration") {
    assert(StokesConvert.elementNames(Seq(9, 10, 11, 12)) ===
      Seq("XX", "XY", "YX", "YY"))
    assert(StokesConvert.elementNames(Seq(1, 2, 3, 4)) ===
      Seq("I", "Q", "U", "V"))
    assertThrows[IllegalArgumentException](StokesConvert.elementNames(Seq(99)))
  }

  test("nested schemas must be rectangular; duplicates rejected") {
    assert(StokesConvert.elementNames(
      Seq(Seq("XX", "XY"), Seq("YX", "YY"))) === Seq("XX", "XY", "YX", "YY"))
    assertThrows[IllegalArgumentException](
      StokesConvert.elementNames(Seq(Seq("XX", "XY"), Seq("YX"))))
    assertThrows[IllegalArgumentException](
      StokesConvert.elementNames(Seq("XX", "XX")))
  }

  test("implicit zeros legalize ['I'] -> linear corrs, but never corr->stokes") {
    val i = CxCol(lit(2.0), lit(0.0))
    val out = eval(StokesConvert.convertSchema(
      Seq(i), Seq("I"), Seq("XX", "XY", "YX", "YY"), implicitStokes = true))
    assert(out("XX") === ((2.0, 0.0)))
    assert(out("XY") === ((0.0, 0.0)))
    assert(out("YY") === ((2.0, 0.0)))
    // without the flag the same plan must fail
    assertThrows[IllegalArgumentException](StokesConvert.convertSchema(
      Seq(i), Seq("I"), Seq("XX", "XY", "YX", "YY")))
    // defaults never apply to corr->stokes outputs
    assertThrows[IllegalArgumentException](StokesConvert.convertSchema(
      Seq(CxCol(lit(1.0), lit(0.0))), Seq("XX"), Seq("Q"),
      implicitStokes = true))
  }

  test("planner prefers derivations with more real inputs") {
    // both (XX,YY) and (RR,LL) could make I; with only RR/LL real the
    // implicit-zero (XX,YY) pair must NOT win even when defaults are legal
    val in = Seq(CxCol(lit(3.0), lit(0.0)), CxCol(lit(1.0), lit(0.0)))
    val out = eval(StokesConvert.convertSchema(
      Seq(in(0), in(1)), Seq("RR", "LL"), Seq("I")))
    assert(out("I") === ((2.0, 0.0)))
  }

  test("Jones 2x2: J * inv(J) is the identity") {
    val j = Feeds.Jones2x2(
      CxCol(lit(1.5), lit(0.25)), CxCol(lit(-0.5), lit(1.0)),
      CxCol(lit(0.75), lit(-0.25)), CxCol(lit(2.0), lit(0.5)))
    val prod = Feeds.Jones2x2.mul(j, Feeds.Jones2x2.inv(j))
    val got = eval(Seq("m00" -> prod.m00, "m01" -> prod.m01,
      "m10" -> prod.m10, "m11" -> prod.m11))
    def close(a: (Double, Double), b: (Double, Double)) =
      math.abs(a._1 - b._1) < 1e-12 && math.abs(a._2 - b._2) < 1e-12
    assert(close(got("m00"), (1.0, 0.0)) && close(got("m11"), (1.0, 0.0)))
    assert(close(got("m01"), (0.0, 0.0)) && close(got("m10"), (0.0, 0.0)))
  }

  test("linear feed rotation times its hermitian transpose is identity") {
    val r = Feeds.feedRotation(lit(0.7), "linear")
    val prod = Feeds.Jones2x2.mul(r, Feeds.Jones2x2.herm(r))
    val got = eval(Seq("m00" -> prod.m00, "m01" -> prod.m01,
      "m10" -> prod.m10, "m11" -> prod.m11))
    assert(math.abs(got("m00")._1 - 1.0) < 1e-12)
    assert(math.abs(got("m01")._1) < 1e-12)
    assert(math.abs(got("m11")._1 - 1.0) < 1e-12)
  }
}
