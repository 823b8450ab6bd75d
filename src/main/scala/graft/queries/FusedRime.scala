package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Det.fsumSql
import graft.rime.RimeCompiler
import SyntheticMs._

/** Fused-RIME compiler queries — SURVEY §2.11. The oracle SQL states the
  * fully-expanded equation the compiler must assemble from the spec
  * string, so these verify parse → plan → execute end to end.
  */
object FusedRime {

  import SqlCx.{CS, MS, mulS, hermS}
  import graft.core.Det.r6Sql

  private val qSql = "((src_id % 3) - 1)/4e0"

  private def tri(re: String, im: String): (String, String) = (
    s"(gp.g_re*$re - gp.g_im*$im)*gq.g_re + (gp.g_re*$im + gp.g_im*$re)*gq.g_im",
    s"(gp.g_re*$im + gp.g_im*$re)*gq.g_re - (gp.g_re*$re - gp.g_im*$im)*gq.g_im")

  private def srcWithStokes(s: org.apache.spark.sql.SparkSession, dir: String) =
    sources(s, dir, 5)
      .withColumn("i", col("flux"))
      .withColumn("q", (col("src_id") % 3 - 1) / 4e0)

  val qs: Seq[Q] = Seq(

    // -- X1-X5: "(Kpq,Bpq): [I,Q] -> [XX,YY]" — parse, plan, execute.
    Q("x01_fused_rime",
      s"""WITH src AS (${sourcesSql(5)}), rws AS (${uvwRowsSql(16)}),
         |ch AS (${channelsSql(8)})
         |SELECT row_id, chan,
         |  ${fsumSql(s"(flux + $qSql) * cos($phaseSql)")} AS xx_re,
         |  ${fsumSql(s"(flux + $qSql) * sin($phaseSql)")} AS xx_im,
         |  ${fsumSql(s"(flux - $qSql) * cos($phaseSql)")} AS yy_re,
         |  ${fsumSql(s"(flux - $qSql) * sin($phaseSql)")} AS yy_im
         |FROM rws, src, ch GROUP BY row_id, chan""".stripMargin) { (s, dir) =>
      RimeCompiler.plan("(Kpq,Bpq): [I,Q] -> [XX,YY]",
        srcWithStokes(s, dir), uvwRows(s, dir, 16), channels(s, dir, 8))
    },

    // -- with direction-independent gains applied outside the source sum:
    //    "(Gp,Kpq,Bpq,Gq): [I,Q] -> [XX,YY]".
    Q("x02_fused_rime_gains", {
      val (xxRe, xxIm) = tri("xs.xx_re", "xs.xx_im")
      val (yyRe, yyIm) = tri("xs.yy_re", "xs.yy_im")
      s"""WITH src AS (${sourcesSql(5)}), rws AS (${uvwRowsSql(16)}),
         |ch AS (${channelsSql(8)}), g AS (${gainsSql()}),
         |xs AS (
         |  SELECT row_id, time_index, ant1, ant2, chan,
         |    ${fsumSql(s"(flux + $qSql) * cos($phaseSql)")} AS xx_re,
         |    ${fsumSql(s"(flux + $qSql) * sin($phaseSql)")} AS xx_im,
         |    ${fsumSql(s"(flux - $qSql) * cos($phaseSql)")} AS yy_re,
         |    ${fsumSql(s"(flux - $qSql) * sin($phaseSql)")} AS yy_im
         |  FROM rws, src, ch GROUP BY row_id, time_index, ant1, ant2, chan)
         |SELECT xs.row_id, xs.chan,
         |  $xxRe AS xx_re, $xxIm AS xx_im,
         |  $yyRe AS yy_re, $yyIm AS yy_im
         |FROM xs
         |JOIN g gp ON gp.time_index = xs.time_index AND gp.ant = xs.ant1
         |JOIN g gq ON gq.time_index = xs.time_index AND gq.ant = xs.ant2""".stripMargin
    }) { (s, dir) =>
      RimeCompiler.plan("(Gp,Kpq,Bpq,Gq): [I,Q] -> [XX,YY]",
        srcWithStokes(s, dir), uvwRows(s, dir, 16), channels(s, dir, 8),
        Some(gains(s, dir)))
    },

    // -- feed-rotation (L) term: the rotation mixes correlations, so the
    //    compiler carries the full 2x2 matrix through the source sum and
    //    applies R_p · M · R_q^T outside it:
    //    "(Lp,Kpq,Bpq,Lq): [I,Q] -> [XX,XY,YX,YY]".
    Q("x03_fused_rime_feed", {
      val k = CS(s"cos($phaseSql)", s"sin($phaseSql)")
      // mirrors sampler(): k.scale(b) for the real diag, CxCol(0,±0)*k off-diag
      def scaleS(b: String) = CS(s"(${k.re} * ($b))", s"(${k.im} * ($b))")
      val samplers = Seq(
        "xx" -> scaleS(s"flux + $qSql"),
        "xy" -> (CS("0e0", "0e0") * k),
        "yx" -> (CS("0e0", "(-0e0)") * k),
        "yy" -> scaleS(s"flux - $qSql"))
      val sumCols = samplers.map { case (n, z) =>
        s"    ${fsumSql(z.re)} AS ${n}_re,\n    ${fsumSql(z.im)} AS ${n}_im"
      }.mkString(",\n")
      val xsM = MS(CS("xs.xx_re", "xs.xx_im"), CS("xs.xy_re", "xs.xy_im"),
        CS("xs.yx_re", "xs.yx_im"), CS("xs.yy_re", "xs.yy_im"))
      def rot(p: String) = MS(
        CS(s"cos($p.pa)", "0e0"), CS(s"sin($p.pa)", "0e0"),
        CS(s"(-sin($p.pa))", "0e0"), CS(s"cos($p.pa)", "0e0"))
      val v = mulS(mulS(rot("pp"), xsM), hermS(rot("pq")))
      val out = Seq("xx" -> v.m00, "xy" -> v.m01, "yx" -> v.m10, "yy" -> v.m11)
        .map { case (n, z) =>
          s"  ${r6Sql(z.re)} AS ${n}_re,\n  ${r6Sql(z.im)} AS ${n}_im"
        }.mkString(",\n")
      s"""WITH src AS (${sourcesSql(5)}), rws AS (${uvwRowsSql(16)}),
         |ch AS (${channelsSql(8)}), pat AS (${paTableSql()}),
         |xs AS (
         |  SELECT row_id, time_index, ant1, ant2, chan,
         |$sumCols
         |  FROM rws, src, ch GROUP BY row_id, time_index, ant1, ant2, chan)
         |SELECT xs.row_id, xs.chan,
         |$out
         |FROM xs
         |JOIN pat pp ON pp.time_index = xs.time_index AND pp.ant = xs.ant1
         |JOIN pat pq ON pq.time_index = xs.time_index AND pq.ant = xs.ant2""".stripMargin
    }) { (s, dir) =>
      val out = RimeCompiler.plan("(Lp,Kpq,Bpq,Lq): [I,Q] -> [XX,XY,YX,YY]",
        srcWithStokes(s, dir), uvwRows(s, dir, 16), channels(s, dir, 8),
        None, Some(paTable(s, dir)))
      val rounded = Seq("xx", "xy", "yx", "yy").flatMap { n =>
        Seq(graft.core.Det.r6(col(s"${n}_re")).as(s"${n}_re"),
          graft.core.Det.r6(col(s"${n}_im")).as(s"${n}_im"))
      }
      out.select((col("row_id") +: col("chan") +: rounded): _*)
    })
}
