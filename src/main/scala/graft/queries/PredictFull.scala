package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.core.CxCol
import graft.functions.Feeds.Jones2x2
import SyntheticMs._

/** Full-polarization predict — SURVEY §2.1 R2 in JONES_2X2 mode
  * (africanus/rime/predict.py:199-224: V = G_p · (Σ_s X_s) · G_q^H with
  * full 2x2 complex matmuls per row/channel).
  *
  * The oracle SQL is GENERATED with a string-level complex/matrix algebra
  * (`CS`/`MS`) whose operations mirror `CxCol`/`Jones2x2` term for term,
  * so the Spark and DuckDB expression trees are identical by
  * construction; with dyadic inputs every value is exact.
  */
object PredictFull {

  import SqlCx.{CS, MS, mulS, hermS, invS}

  // ---- the 2x2 gain model (dyadic; diag dominant so it stays invertible)
  private def g2(t: String, a: String): MS = {
    MS(
      CS(s"(15e-1 + (($t*7 + $a*5) % 9 - 4) / 8e0)", s"((($t*3 + $a*11) % 7 - 3) / 8e0)"),
      CS(s"((($t*5 + $a*3) % 5 - 2) / 16e0)", s"((($t*11 + $a*7) % 5 - 2) / 16e0)"),
      CS(s"((($t*13 + $a*9) % 5 - 2) / 16e0)", s"((($t*9 + $a*13) % 5 - 2) / 16e0)"),
      CS(s"(15e-1 + (($t*11 + $a*3) % 9 - 4) / 8e0)", s"((($t*5 + $a*13) % 7 - 3) / 8e0)"))
  }

  private def g2Col(t: Column, a: Column): Jones2x2 = Jones2x2(
    CxCol(lit(15e-1) + ((t * 7 + a * 5) % 9 - 4) / 8e0, ((t * 3 + a * 11) % 7 - 3) / 8e0),
    CxCol(((t * 5 + a * 3) % 5 - 2) / 16e0, ((t * 11 + a * 7) % 5 - 2) / 16e0),
    CxCol(((t * 13 + a * 9) % 5 - 2) / 16e0, ((t * 9 + a * 13) % 5 - 2) / 16e0),
    CxCol(lit(15e-1) + ((t * 11 + a * 3) % 9 - 4) / 8e0, ((t * 5 + a * 13) % 7 - 3) / 8e0))

  /** summed coherency columns xs.<c>_re/_im as a string matrix. */
  private def xsS: MS = MS(
    CS("xs.xx_re", "xs.xx_im"), CS("xs.xy_re", "xs.xy_im"),
    CS("xs.yx_re", "xs.yx_im"), CS("xs.yy_re", "xs.yy_im"))

  // ---- per-SOURCE 2x2 DDE Jones (depends on src, time, antenna) — the
  // E term of predict_vis's dde_1_jones/dde_2_jones arguments
  // (africanus/rime/predict.py:505-563). Dyadic, diag-dominant.
  def e2(s: String, t: String, a: String): MS = MS(
    CS(s"(1e0 + (($s*3 + $t*7 + $a*5) % 9 - 4) / 8e0)", s"((($s*5 + $t*3 + $a*11) % 7 - 3) / 8e0)"),
    CS(s"((($s*7 + $t*5 + $a*3) % 5 - 2) / 16e0)", s"((($s*11 + $t*7 + $a*9) % 5 - 2) / 16e0)"),
    CS(s"((($s*13 + $t*9 + $a*7) % 5 - 2) / 16e0)", s"((($s*9 + $t*13 + $a*5) % 5 - 2) / 16e0)"),
    CS(s"(1e0 + (($s*5 + $t*11 + $a*3) % 9 - 4) / 8e0)", s"((($s*7 + $t*5 + $a*13) % 7 - 3) / 8e0)"))

  def e2Col(s: Column, t: Column, a: Column): Jones2x2 = Jones2x2(
    CxCol(lit(1e0) + ((s * 3 + t * 7 + a * 5) % 9 - 4) / 8e0, ((s * 5 + t * 3 + a * 11) % 7 - 3) / 8e0),
    CxCol(((s * 7 + t * 5 + a * 3) % 5 - 2) / 16e0, ((s * 11 + t * 7 + a * 9) % 5 - 2) / 16e0),
    CxCol(((s * 13 + t * 9 + a * 7) % 5 - 2) / 16e0, ((s * 9 + t * 13 + a * 5) % 5 - 2) / 16e0),
    CxCol(lit(1e0) + ((s * 5 + t * 11 + a * 3) % 9 - 4) / 8e0, ((s * 7 + t * 5 + a * 13) % 7 - 3) / 8e0))

  val qs: Seq[Q] = Seq(
    Q("g04_predict_full", {
      val v = mulS(mulS(g2("xs.time_index", "xs.ant1"), xsS),
        hermS(g2("xs.time_index", "xs.ant2")))
      val corrs = Seq("xx" -> v.m00, "xy" -> v.m01, "yx" -> v.m10, "yy" -> v.m11)
      val sumCols = (0 until 4).flatMap { ci =>
        val n = Seq("xx", "xy", "yx", "yy")(ci)
        Seq(
          s"    SUM(((src_id * 5 + row_id * 3 + chan + ${ci * 8}) % 17 - 8) / 16e0) AS ${n}_re",
          s"    SUM(((src_id * 7 + row_id * 11 + (chan + ${ci * 8}) * 3) % 13 - 6) / 16e0) AS ${n}_im")
      }.mkString(",\n")
      s"""WITH rws AS (${uvwRowsSql(16)}), src AS (${sourcesSql(5)}),
         |ch AS (${channelsSql(8)}),
         |xs AS (
         |  SELECT row_id, time_index, ant1, ant2, chan,
         |$sumCols
         |  FROM rws, src, ch GROUP BY row_id, time_index, ant1, ant2, chan)
         |SELECT xs.row_id, xs.chan,
         |  ${corrs.map { case (n, z) => s"${z.re} AS ${n}_re,\n  ${z.im} AS ${n}_im" }
               .mkString(",\n  ")}
         |FROM xs""".stripMargin
    }) { (s, dir) =>
      val rws = uvwRows(s, dir, 16)
      val src = broadcast(sources(s, dir, 5))
      val ch = broadcast(channels(s, dir, 8))
      val sumCols = (0 until 4).flatMap { ci =>
        val n = Seq("xx", "xy", "yx", "yy")(ci)
        Seq(sum(cohRe(col("src_id"), col("row_id"), col("chan") + ci * 8)).as(s"${n}_re"),
          sum(cohIm(col("src_id"), col("row_id"), col("chan") + ci * 8)).as(s"${n}_im"))
      }
      val xs = rws.crossJoin(src).crossJoin(ch)
        .groupBy("row_id", "time_index", "ant1", "ant2", "chan")
        .agg(sumCols.head, sumCols.tail: _*)
      // the 2x2 gains are arithmetic in (time_index, ant) — generated
      // in-place, no gather join needed (the joined variant is exercised
      // by r02/g01)
      val x2 = Jones2x2(
        CxCol(col("xx_re"), col("xx_im")), CxCol(col("xy_re"), col("xy_im")),
        CxCol(col("yx_re"), col("yx_im")), CxCol(col("yy_re"), col("yy_im")))
      val gp = g2Col(col("time_index"), col("ant1"))
      val gq = g2Col(col("time_index"), col("ant2"))
      val v = Jones2x2.mul(Jones2x2.mul(gp, x2), Jones2x2.herm(gq))
      xs.select(col("row_id"), col("chan"),
        v.m00.re.as("xx_re"), v.m00.im.as("xx_im"),
        v.m01.re.as("xy_re"), v.m01.im.as("xy_im"),
        v.m10.re.as("yx_re"), v.m10.im.as("yx_im"),
        v.m11.re.as("yy_re"), v.m11.im.as("yy_im"))
    },

    // -- R2 DDE mode: V = Σ_s E_ps · X_s · E_qs^H — the per-SOURCE Jones
    //    pair sits INSIDE the source sum (africanus/rime/predict.py:505-563),
    //    unlike g04 where the DIE gain factors out. The triple product is
    //    evaluated per (src, row, chan) cell inside whole-stage codegen over
    //    the broadcast-expanded grid; the only exchange is the partial+final
    //    source contraction keyed by (row, chan) — shuffle volume = output.
    Q("r03_predict_dde", {
      val ep = e2("src_id", "time_index", "ant1")
      val eq = e2("src_id", "time_index", "ant2")
      def x2S(ci: Int): CS = CS(
        s"(((src_id * 5 + row_id * 3 + chan + ${ci * 8}) % 17 - 8) / 16e0)",
        s"(((src_id * 7 + row_id * 11 + (chan + ${ci * 8}) * 3) % 13 - 6) / 16e0)")
      val x = MS(x2S(0), x2S(1), x2S(2), x2S(3))
      val v = mulS(mulS(ep, x), hermS(eq))
      val corrs = Seq("xx" -> v.m00, "xy" -> v.m01, "yx" -> v.m10, "yy" -> v.m11)
      s"""WITH rws AS (${uvwRowsSql(16)}), src AS (${sourcesSql(5)}),
         |ch AS (${channelsSql(8)})
         |SELECT row_id, chan,
         |  ${corrs.map { case (n, z) =>
               s"SUM(${z.re}) AS ${n}_re,\n  SUM(${z.im}) AS ${n}_im" }
             .mkString(",\n  ")}
         |FROM rws, src, ch GROUP BY row_id, chan""".stripMargin
    }) { (s, dir) =>
      val rws = uvwRows(s, dir, 16)
      val src = broadcast(sources(s, dir, 5))
      val ch = broadcast(channels(s, dir, 8))
      val grid = rws.crossJoin(src).crossJoin(ch)
      def x2(ci: Int): CxCol = CxCol(
        cohRe(col("src_id"), col("row_id"), col("chan") + ci * 8),
        cohIm(col("src_id"), col("row_id"), col("chan") + ci * 8))
      val x = Jones2x2(x2(0), x2(1), x2(2), x2(3))
      val ep = e2Col(col("src_id"), col("time_index"), col("ant1"))
      val eq = e2Col(col("src_id"), col("time_index"), col("ant2"))
      val v = Jones2x2.mul(Jones2x2.mul(ep, x), Jones2x2.herm(eq))
      grid.groupBy("row_id", "chan").agg(
        sum(v.m00.re).as("xx_re"), sum(v.m00.im).as("xx_im"),
        sum(v.m01.re).as("xy_re"), sum(v.m01.im).as("xy_im"),
        sum(v.m10.re).as("yx_re"), sum(v.m10.im).as("yx_im"),
        sum(v.m11.re).as("yy_re"), sum(v.m11.im).as("yy_im"))
    },

    // -- G2 FULL mode: correct_vis with the 2x2 complex inverse,
    //    V' = G_p^{-1} V G_q^{-H} (calibration/utils/correct_vis.py FULL
    //    path). The diag-dominant gain model keeps |det| >= ~0.9 so the
    //    inverse is well-conditioned; all divisions are single IEEE ops
    //    over exact dyadics — bit-deterministic, no rounding.
    Q("g07_correct_full", {
      // the 2x2 inverse is PRECOMPUTED per (time, antenna) in a dimension
      // table and gathered per row — inlining it per row blew the
      // expression out of JIT range (measured 2x slower); this is also
      // the reference's shape (invert the gain grid once, gather many)
      val inv = invS(g2("t.n_nationkey", "a.n_nationkey"))
      val invCols = Seq("i00" -> inv.m00, "i01" -> inv.m01,
        "i10" -> inv.m10, "i11" -> inv.m11)
        .map { case (n, z) => s"    ${z.re} AS ${n}_re, ${z.im} AS ${n}_im" }
        .mkString(",\n")
      def gmat(al: String): MS = MS(
        CS(s"$al.i00_re", s"$al.i00_im"), CS(s"$al.i01_re", s"$al.i01_im"),
        CS(s"$al.i10_re", s"$al.i10_im"), CS(s"$al.i11_re", s"$al.i11_im"))
      val vIn = MS(CS("cv.xx_re", "cv.xx_im"), CS("cv.xy_re", "cv.xy_im"),
        CS("cv.yx_re", "cv.yx_im"), CS("cv.yy_re", "cv.yy_im"))
      val v = mulS(mulS(gmat("gp"), vIn), hermS(gmat("gq")))
      val out = Seq("xx" -> v.m00, "xy" -> v.m01, "yx" -> v.m10, "yy" -> v.m11)
        .map { case (n, z) => s"  ${z.re} AS ${n}_re,\n  ${z.im} AS ${n}_im" }
        .mkString(",\n")
      s"""WITH rws AS (${uvwRowsSql(16)}), cv AS (${corrVisSql(16)}),
         |gi AS (
         |  SELECT CAST(t.n_nationkey AS BIGINT) AS time_index,
         |    CAST(a.n_nationkey AS BIGINT) AS ant,
         |$invCols
         |  FROM nation t, nation a
         |  WHERE t.n_nationkey < 16 AND a.n_nationkey < 7)
         |SELECT cv.row_id,
         |$out
         |FROM cv
         |JOIN rws ON cv.row_id = rws.row_id
         |JOIN gi gp ON gp.time_index = rws.time_index AND gp.ant = rws.ant1
         |JOIN gi gq ON gq.time_index = rws.time_index AND gq.ant = rws.ant2""".stripMargin
    }) { (s, dir) =>
      val grid = graft.core.Tables.nation(s, dir)
        .filter(col("n_nationkey") < 16)
        .select(col("n_nationkey").cast("long").as("time_index"))
        .crossJoin(graft.core.Tables.nation(s, dir)
          .filter(col("n_nationkey") < 7)
          .select(col("n_nationkey").cast("long").as("ant")))
      val inv = Jones2x2.inv(g2Col(col("time_index"), col("ant")))
      val gi = grid.select(col("time_index"), col("ant"),
        inv.m00.re.as("i00_re"), inv.m00.im.as("i00_im"),
        inv.m01.re.as("i01_re"), inv.m01.im.as("i01_im"),
        inv.m10.re.as("i10_re"), inv.m10.im.as("i10_im"),
        inv.m11.re.as("i11_re"), inv.m11.im.as("i11_im"))
      def gmat(p: String): Jones2x2 = Jones2x2(
        CxCol(col(s"${p}00_re"), col(s"${p}00_im")),
        CxCol(col(s"${p}01_re"), col(s"${p}01_im")),
        CxCol(col(s"${p}10_re"), col(s"${p}10_im")),
        CxCol(col(s"${p}11_re"), col(s"${p}11_im")))
      def side(p: String, tKey: String, aKey: String) = broadcast(gi.select(
        col("time_index").as(tKey) +: col("ant").as(aKey) +:
          Seq("00", "01", "10", "11").flatMap(e => Seq(
            col(s"i${e}_re").as(s"$p${e}_re"),
            col(s"i${e}_im").as(s"$p${e}_im"))): _*))
      val gp = side("p", "tp", "ap")
      val gq = side("q", "tq", "aq")
      val j = corrVis(s, dir, 16)
        .join(uvwRows(s, dir, 16).select("row_id", "time_index", "ant1", "ant2"),
          "row_id")
        .join(gp, col("time_index") === col("tp") && col("ant1") === col("ap"))
        .join(gq, col("time_index") === col("tq") && col("ant2") === col("aq"))
      val vIn = Jones2x2(
        CxCol(col("xx_re"), col("xx_im")), CxCol(col("xy_re"), col("xy_im")),
        CxCol(col("yx_re"), col("yx_im")), CxCol(col("yy_re"), col("yy_im")))
      val v = Jones2x2.mul(Jones2x2.mul(gmat("p"), vIn), Jones2x2.herm(gmat("q")))
      j.select(col("row_id"),
        v.m00.re.as("xx_re"), v.m00.im.as("xx_im"),
        v.m01.re.as("xy_re"), v.m01.im.as("xy_im"),
        v.m10.re.as("yx_re"), v.m10.im.as("yx_im"),
        v.m11.re.as("yy_re"), v.m11.im.as("yy_im"))
    })
}
