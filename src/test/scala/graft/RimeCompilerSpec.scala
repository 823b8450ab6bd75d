package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.rime.RimeSpec

class RimeCompilerSpec extends AnyFunSuite {

  test("parses sided terms, stokes and corrs") {
    val s = RimeSpec.parse("(Gp,Kpq,Bpq,Gq): [I,Q,U,V] -> [XX,XY,YX,YY]")
    assert(s.terms.map(_.letter) === Seq('G', 'K', 'B', 'G'))
    assert(s.terms.map(_.side) === Seq("p", "pq", "pq", "q"))
    assert(s.stokes === Seq("I", "Q", "U", "V"))
    assert(s.corrs === Seq("XX", "XY", "YX", "YY"))
    assert(s.feed === "linear")
    assert(s.leftDie === Seq('G') && s.rightDie === Seq('G'))
  }

  test("tolerates whitespace and subscript variants") {
    val s = RimeSpec.parse(" ( Kpq , Bpq ) : [ I ] -> [ XX , YY ] ")
    assert(s.terms.map(_.letter) === Seq('K', 'B'))
    assert(s.stokes === Seq("I"))
    assert(s.corrs === Seq("XX", "YY"))
  }

  test("feed type is inferred from the correlation basis") {
    assert(RimeSpec.parse("(Kpq,Bpq): [I,V] -> [RR,LL]").feed === "circular")
    assertThrows[IllegalArgumentException](
      RimeSpec.parse("(Kpq,Bpq): [I] -> [XX,RR]")) // mixed bases
  }

  test("G and L combine in spec order; DDE terms are sided") {
    val s = RimeSpec.parse("(Gp,Lp,Kpq,Bpq,Lq,Gq): [I,Q] -> [XX,XY,YX,YY]")
    assert(s.leftDie === Seq('G', 'L') && s.rightDie === Seq('L', 'G'))
    val e = RimeSpec.parse("(Ep,Kpq,Bpq,Eq): [I,Q] -> [XX,XY,YX,YY]")
    assert(e.leftDde === Seq('E') && e.rightDde === Seq('E'))
  }

  test("rejects malformed specs") {
    assertThrows[IllegalArgumentException](RimeSpec.parse("Kpq,Bpq"))
    assertThrows[IllegalArgumentException](
      RimeSpec.parse("(Kp): [I] -> [XX]")) // K is a pair term
    assertThrows[IllegalArgumentException](
      RimeSpec.parse("(Kpq): [W] -> [XX]"))
    assertThrows[IllegalArgumentException](
      RimeSpec.parse("(Kpq): [I] -> [AA]"))
  }

  test("pq non-K/B letters classify as scalar pair envelopes (gaussian slot)") {
    val s = RimeSpec.parse("(Kpq,Spq,Bpq): [I,Q] -> [XX,YY]")
    assert(s.pairDde === Seq('S'))
    assert(s.leftDde.isEmpty && s.rightDde.isEmpty)
    // an unregistered pair letter is rejected at plan time, not parse time
    val spark = TestSpark.spark
    val err = intercept[IllegalArgumentException] {
      graft.rime.RimeCompiler.plan("(Kpq,Wpq,Bpq): [I] -> [XX]",
        graft.queries.SyntheticMs.sources(spark, TestSpark.sf),
        graft.queries.SyntheticMs.uvwRows(spark, TestSpark.sf),
        graft.queries.SyntheticMs.channels(spark, TestSpark.sf))
    }
    assert(err.getMessage.contains("no pair term registered"))
  }

  test("one-sided gain spec applies only that side's factor") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val sf = TestSpark.sf
    val src = graft.queries.SyntheticMs.sources(spark, sf, 3)
      .withColumn("i", col("flux"))
    val rows = graft.queries.SyntheticMs.uvwRows(spark, sf, 64)
    val chans = graft.queries.SyntheticMs.channels(spark, sf, 2)
    val gains = graft.queries.SyntheticMs.gains(spark, sf)
    def run(s: String) = graft.rime.RimeCompiler
      .plan(s, src, rows, chans, gainsDf = Some(gains))
      .select("row_id", "chan", "xx_re", "xx_im")
    val both = run("(Gp,Kpq,Bpq,Gq): [I] -> [XX]")
      .withColumnsRenamed(Map("xx_re" -> "b_re", "xx_im" -> "b_im"))
    val pOnly = run("(Gp,Kpq,Bpq): [I] -> [XX]")
    // a p-side-only spec must differ from the two-sided product wherever
    // the q gain is not identity — if the q factor leaked in (the old
    // scalar-branch bug), these would be equal everywhere
    val differing = pOnly.join(both, Seq("row_id", "chan"))
      .filter(abs(col("xx_re") - col("b_re")) +
        abs(col("xx_im") - col("b_im")) > 1e-12).count()
    assert(differing > 0, "p-only spec matched the two-sided product — " +
      "q-side gain was applied despite Gq being absent")
    // and against the direct construction: undoing the q gain from the
    // two-sided result must reproduce the p-only result exactly
    val gq = gains.select(col("time_index").as("qt"), col("ant").as("qa"),
      col("g_re").as("qre"), col("g_im").as("qim"))
    val rowAnts = rows.select(col("row_id").as("rid"), col("time_index").as("rt"),
      col("ant2").as("ra2"))
    val undone = both.join(rowAnts, col("row_id") === col("rid"))
      .join(gq, col("rt") === col("qt") && col("ra2") === col("qa"))
      // b / conj(gq) = b * gq / |gq|^2
      .select(col("row_id"), col("chan"),
        ((col("b_re") * col("qre") - col("b_im") * col("qim"))
          / (col("qre") * col("qre") + col("qim") * col("qim"))).as("u_re"),
        ((col("b_im") * col("qre") + col("b_re") * col("qim"))
          / (col("qre") * col("qre") + col("qim") * col("qim"))).as("u_im"))
    val mism = pOnly.join(undone, Seq("row_id", "chan"))
      .filter(abs(col("xx_re") - col("u_re")) +
        abs(col("xx_im") - col("u_im")) > 1e-9).count()
    assert(mism === 0)
  }

  test("X3 transformer: no-PA plan equals explicit r6-rounded GMST PA table") {
    // the derived-PA path (paDf = None) must be exactly the GMST backend
    // over the rows' (time × antenna) domain, r6-rounded BEFORE trig —
    // the determinism contract x09's oracle relies on
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val sf = TestSpark.sf
    val src = graft.queries.SyntheticMs.sources(spark, sf, 3)
      .withColumn("i", col("flux"))
    val rows = graft.queries.SyntheticMs.uvwRows(spark, sf, 16)
    val chans = graft.queries.SyntheticMs.channels(spark, sf, 2)
    val gains = graft.queries.SyntheticMs.gains(spark, sf)
    val explicitPa = rows.select(col("time_index")).distinct()
      .crossJoin(rows.select(col("ant1").as("ant"))
        .union(rows.select(col("ant2").as("ant"))).distinct())
      .withColumn("pa",
        graft.core.Det.r6(expr(graft.queries.RimeMore.paGmstSql)))
    val spec = "(Lp,Kpq,Bpq,Lq): [I] -> [XX,XY,YX,YY]"
    def collectMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val derived = collectMap(graft.rime.RimeCompiler
      .plan(spec, src, rows, chans, paDf = None)
      .select("row_id", "chan", "xy_re", "xy_im"))
    val explicit = collectMap(graft.rime.RimeCompiler
      .plan(spec, src, rows, chans, paDf = Some(explicitPa))
      .select("row_id", "chan", "xy_re", "xy_im"))
    assert(derived === explicit, "transformer-derived PA diverges from " +
      "the explicit r6-rounded GMST table")
    assert(derived.nonEmpty)
  }

  test("LM transformer contract: derived lm equals the explicit r9 table; missing phaseDir rejects") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val M = graft.queries.SyntheticMs
    val srcNoLm = M.sources(spark, TestSpark.sf, 5).drop("l", "m")
      .withColumn("i", col("flux"))
    val rows = M.uvwRows(spark, TestSpark.sf, 64)
    val chans = M.channels(spark, TestSpark.sf, 2)
    // no lm and no phase centre: the K term cannot be built
    val e = intercept[IllegalArgumentException] {
      graft.rime.RimeCompiler.plan("(Kpq,Bpq): [I] -> [XX,YY]",
        srcNoLm, rows, chans)
    }
    assert(e.getMessage.contains("phaseDir"))
    // derived lm must equal the explicitly-derived r9 table bit for bit
    val derived = graft.rime.RimeCompiler.plan("(Kpq,Bpq): [I] -> [XX,YY]",
      srcNoLm, rows, chans, phaseDir = Some((M.Ra0, M.Dec0)))
      .orderBy("row_id", "chan").collect().toSeq
    val da = col("ra") - lit(M.Ra0)
    val explicitSrc = srcNoLm
      .withColumn("l", graft.core.Det.r9(cos(col("dec")) * sin(da)))
      .withColumn("m", graft.core.Det.r9(sin(col("dec")) * cos(lit(M.Dec0)) -
        cos(col("dec")) * sin(lit(M.Dec0)) * cos(da)))
    val explicit = graft.rime.RimeCompiler.plan("(Kpq,Bpq): [I] -> [XX,YY]",
      explicitSrc, rows, chans)
      .orderBy("row_id", "chan").collect().toSeq
    assert(derived === explicit)
    assert(derived.nonEmpty)
  }

  test("implicit-zero stokes: [I] alone gives XX == YY") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val src = graft.queries.SyntheticMs.sources(spark, TestSpark.sf, 3)
      .withColumn("i", col("flux"))
    val out = graft.rime.RimeCompiler.plan("(Kpq,Bpq): [I] -> [XX,YY]",
      src, graft.queries.SyntheticMs.uvwRows(spark, TestSpark.sf, 64),
      graft.queries.SyntheticMs.channels(spark, TestSpark.sf, 2))
    val bad = out.filter(col("xx_re") =!= col("yy_re") ||
      col("xx_im") =!= col("yy_im")).count()
    assert(bad === 0)
  }
}
