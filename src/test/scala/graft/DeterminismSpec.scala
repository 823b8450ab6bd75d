package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.SyntheticMs

/** Guards the cross-engine float-determinism contract for the hash-compared
  * transcendental queries (CLAUDE.md float rules).
  *
  * r01 itself no longer hashes trig — it hashes the phase, which is pure
  * IEEE-correctly-rounded arithmetic (*, /, +, -, sqrt) and therefore
  * bit-identical cross-engine unconditionally. These guards now protect
  * the queries that DO evaluate cos/sin of this same phase grid and pass
  * through a rounding layer (r09 and the x01-x08 fsum aggregates):
  *
  * 1. Trig arguments must stay SMALL: for |phase| ≲ a few radians the JVM
  *    and DuckDB libms agree to ≤1 ulp (~2.2e-16); large arguments go
  *    through env-sensitive range reduction with errors up to ~1e-11 —
  *    which is what flipped r01's round(x·1e6) hash in rounds 1-2 before
  *    the phase-only rewrite.
  * 2. No rounded value may sit NEAR a .5 boundary of its scale: a 1-ulp
  *    disagreement then cannot flip the rounded digit. With small args the
  *    flip window is |frac(x·1e6) − .5| < 2.2e-10; we assert a 100× margin.
  */
class DeterminismSpec extends AnyFunSuite {
  import TestSpark.spark

  private def grid(dir: String) = {
    val src = SyntheticMs.sources(spark, dir, 5)
    val rws = SyntheticMs.uvwRows(spark, dir, 16)
    val ch = SyntheticMs.channels(spark, dir, 8)
    rws.crossJoin(broadcast(src)).crossJoin(broadcast(ch))
      .select(graft.functions.Phase.realPhase(col("l"), col("m"),
        col("u"), col("v"), col("w")).multiply(col("freq")).as("phase"))
  }

  private def dirs = Seq(TestSpark.sf, "/root/testdata/sf0.01") ++
    (if (new java.io.File("/root/testdata/sf0.1").isDirectory)
      Seq("/root/testdata/sf0.1") else Nil)

  test("r01 phase arguments are small (libm-safe regime)") {
    for (d <- dirs) {
      val m = grid(d).agg(max(abs(col("phase")))).head.getDouble(0)
      assert(m < 4.0, s"max |phase| = $m at $d — must stay ≲ π for " +
        "cross-engine trig agreement")
    }
  }

  test("r4-rounded trig surfaces (r15/x09/r16) stay far from flip boundaries") {
    // the three queries that keep compound transcendental values on the
    // hashed surface round at 1e4; a cross-engine flip needs a value
    // within ~1e-12 of a .5 boundary of x*1e4. PRINT the measured minimum
    // so the margin is a fact, not a hope.
    import org.apache.spark.sql.DataFrame
    def minBoundaryDist(df: DataFrame, cols: Seq[String]): Double =
      df.select(least(cols.map { c =>
          abs(abs(col(c) * 1e4 - floor(col(c) * 1e4)) - 0.5)
        }: _*).as("d"))
        .agg(min(col("d"))).head.getDouble(0)
    for (d <- dirs) {
      // recompute the UNROUNDED values by stripping r4 is impractical —
      // instead rebuild each query's hashed expression pre-rounding
      val r15 = {
        val basis = expr(graft.queries.RimeMore.shapelet2dSql)
        val ph = graft.functions.Phase.realPhase(col("l"), col("m"),
          col("u"), col("v"), col("w")).multiply(col("freq"))
        SyntheticMs.sources(spark, d, 5)
          .crossJoin(SyntheticMs.uvwRows(spark, d, 64).select("row_id", "u", "v", "w"))
          .crossJoin(broadcast(SyntheticMs.channels(spark, d, 4)))
          .select((basis * cos(ph)).as("a"), (basis * sin(ph)).as("b"))
      }
      val m15 = minBoundaryDist(r15, Seq("a", "b"))
      val r16 = {
        import graft.io.BeamFixture
        (for (f <- 0 until BeamFixture.NFreq; y <- 0 until BeamFixture.NPix;
              x <- 0 until BeamFixture.NPix)
          yield BeamFixture.beamValue(x, y, f))
          .map(v => math.abs(math.abs(v * 1e4 - math.floor(v * 1e4)) - 0.5)).min
      }
      info(s"$d: r15 min |frac(x·1e4)−.5| = $m15, r16 = $r16 (flip window ~1e-12)")
      assert(m15 > 1e-7, s"r15 value within 1e-7 of an r4 boundary at $d")
      assert(r16 > 1e-7, "r16 beam value within 1e-7 of an r4 boundary")
    }
  }

  test("r01 rounded cos/sin stay far from .5 rounding boundaries") {
    for (d <- dirs) {
      // distance of x*1e6 from the nearest .5 flip boundary, minimized
      // over both trig outputs of every grid row
      val dist = grid(d).select(
        least(
          abs(abs(cos(col("phase")) * 1e6 - floor(cos(col("phase")) * 1e6)) - 0.5),
          abs(abs(sin(col("phase")) * 1e6 - floor(sin(col("phase")) * 1e6)) - 0.5))
          .as("dst"))
        .agg(min(col("dst"))).head.getDouble(0)
      assert(dist > 1e-8, s"min boundary distance $dist at $d — a value " +
        "sits within 1e-8 of a round(x*1e6) flip; adjust the fixture")
    }
  }
}
