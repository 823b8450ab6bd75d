package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.FusedRime.SrcLit
import graft.queries.SyntheticMs._

/** Pins the codegen'd `rime_source_sum` expression BIT-FOR-BIT against the
  * interpreted aggregate()-lambda formulation it replaced in x04: both
  * evaluate Σ_s round(spec·trig(phase)·1e6) as longs over the same model
  * constant, so any divergence in the transcribed operation tree or in
  * the Round-semantics replication (BigDecimal.valueOf + HALF_UP) fails
  * here before it can flip the x04 oracle hash. */
class FusedProjectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("rime_source_sum equals the aggregate() lambda bit-for-bit (incl. .5-boundary probes)") {
    val dir = TestSpark.sf
    graft.expr.GraftFunctions.register(spark)
    val srcRows = sources(spark, dir, 5).collect()
    val srcLits = srcRows.map { r =>
      SrcLit(r.getAs[Double]("l"), r.getAs[Double]("m"),
        r.getAs[Double]("flux"), r.getAs[Double]("spi0"),
        r.getAs[Double]("spi1"), r.getAs[Double]("ref_freq"),
        r.getAs[Boolean]("log_poly"))
    }.toSeq
    val flat = srcLits.flatMap(s => Seq(s.l, s.m, s.flux, s.spi0, s.spi1,
      s.rf, if (s.lp) 1.0 else 0.0)).toIndexedSeq

    val ph = "(-2 * pi() / 299792458D) * (u*s.l + v*s.m + " +
      "w*(sqrt(greatest(0D, 1D - s.l*s.l - s.m*s.m)) - 1D)) * freq"
    val spec = "(CASE WHEN s.lp THEN s.flux * exp(s.spi0 * ln(freq/s.rf) " +
      "+ s.spi1 * (ln(freq/s.rf)*ln(freq/s.rf))) " +
      "ELSE s.flux + s.spi0 * (freq/s.rf - 1D) " +
      "+ s.spi1 * ((freq/s.rf - 1D)*(freq/s.rf - 1D)) END)"
    def lambdaSum(trig: String) = expr(
      s"""aggregate(srcarr, 0L, (acc, s) ->
         |  acc + CAST(ROUND(($spec * $trig($ph)) * 1e6) AS BIGINT))""".stripMargin)
    def exprSum(sine: Boolean) = call_function("rime_source_sum",
      col("u"), col("v"), col("w"), col("freq"),
      typedLit(flat), lit(sine))

    val both = uvwRows(spark, dir, 16)
      .crossJoin(broadcast(channels(spark, dir, 8)))
      .withColumn("srcarr", typedLit(srcLits))
      .select(col("row_id"), col("chan"),
        lambdaSum("cos").as("lc"), exprSum(sine = false).as("ec"),
        lambdaSum("sin").as("ls"), exprSum(sine = true).as("es"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getLong(2) === r.getLong(3),
        s"cos diverges at (${r.getLong(0)}, ${r.getLong(1)})")
      assert(r.getLong(4) === r.getLong(5),
        s"sin diverges at (${r.getLong(0)}, ${r.getLong(1)})")
    }

    // synthetic .5-exact boundary probes: terms engineered so spec·cos·1e6
    // lands EXACTLY on k+0.5 — the HALF_UP away-from-zero branch both
    // rounding paths must take identically (positive AND negative)
    import spark.implicits._
    val probeModel = IndexedSeq(
      // l=m=0 ⇒ phase=0 ⇒ cos=1; ord spec with spi=0 ⇒ spec=flux
      0.0, 0.0, 2.5e-6, 0.0, 0.0, 1.0, 0.0, // term*1e6 = +2.5
      0.0, 0.0, -7.5e-6, 0.0, 0.0, 1.0, 0.0) // term*1e6 = −7.5
    val probe = Seq((0.0, 0.0, 0.0, 1.0)).toDF("u", "v", "w", "freq")
      .select(call_function("rime_source_sum",
        col("u"), col("v"), col("w"), col("freq"),
        typedLit(probeModel), lit(false)).as("acc"))
      .head().getLong(0)
    // HALF_UP: +2.5 → 3, −7.5 → −8 ⇒ sum −5
    assert(probe === -5L, s".5-boundary rounding diverges: $probe")
  }
}
