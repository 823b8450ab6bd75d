package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.core.{CxCol, Det}
import graft.core.Det.{fsumSql, r6Sql}
import graft.functions.{Phase, Spectral}
import SyntheticMs._

/** The predict_vis family — SURVEY §2.1 R2/R9, §2.4 D1/D2, §2.6 G1-G3.
  *
  * All of these share one physical shape, which is also the reference's
  * (africanus/rime/predict.py:199-224, africanus/rime/dask_predict.py:311-370):
  * the large row table is partitioned, the source/channel/gain dimension
  * tables are broadcast, the (src x row x chan) expansion is a projection
  * inside whole-stage codegen, and the only aggregation is the sum over
  * source (a partial+final agg keyed by row — shuffle volume = output size,
  * never the expanded input). At cluster scale there is NO wide shuffle of
  * the visibility data.
  *
  * Determinism: gain/coherency inputs are dyadic rationals so complex
  * products and source sums are exact in IEEE double (order-independent) —
  * those queries hash-match with no rounding. Transcendental phase terms go
  * through Det.fsum (fixed-point accumulate, mirrored verbatim in the
  * oracle SQL).
  */
object Predict {

  /** Complex gains gathered for both antennas of each row:
    * rows ⋈ g(time_index, ant1) ⋈ g(time_index, ant2), both broadcast
    * (the (time, ant) Jones table is tiny relative to the row table —
    * same build-side choice as the reference's per-row gather). */
  def withGains(rws: DataFrame, g: DataFrame): DataFrame = {
    val gp = g.select(col("time_index").as("tp"), col("ant").as("ap"),
      col("g_re").as("gp_re"), col("g_im").as("gp_im"))
    val gq = g.select(col("time_index").as("tq"), col("ant").as("aq"),
      col("g_re").as("gq_re"), col("g_im").as("gq_im"))
    rws.join(broadcast(gp), col("time_index") === col("tp") && col("ant1") === col("ap"))
      .join(broadcast(gq), col("time_index") === col("tq") && col("ant2") === col("aq"))
      .drop("tp", "ap", "tq", "aq")
  }

  private def gp = CxCol(col("gp_re"), col("gp_im"))
  private def gq = CxCol(col("gq_re"), col("gq_im"))

  /** Σ_src X_s per (row, chan) plus row meta — the source contraction. */
  private def sourceSum(s: SparkSession, dir: String): DataFrame = {
    val rws = uvwRows(s, dir, 16)
    val src = broadcast(sources(s, dir, 5))
    val ch = broadcast(channels(s, dir, 8))
    rws.crossJoin(src).crossJoin(ch)
      .groupBy("row_id", "time_index", "ant1", "ant2", "chan")
      .agg(
        sum(cohRe(col("src_id"), col("row_id"), col("chan"))).as("x_re"),
        sum(cohIm(col("src_id"), col("row_id"), col("chan"))).as("x_im"))
  }

  private val sourceSumSql =
    s"""SELECT row_id, time_index, ant1, ant2, chan,
       |  SUM($cohReSql) AS x_re, SUM($cohImSql) AS x_im
       |FROM rws, src, ch GROUP BY row_id, time_index, ant1, ant2, chan""".stripMargin

  /** gp * x * conj(gq) as SQL text (shared by r02/g03 oracles). */
  private val modelSql = Seq(
    "(gp.g_re*xs.x_re - gp.g_im*xs.x_im)*gq.g_re + (gp.g_re*xs.x_im + gp.g_im*xs.x_re)*gq.g_im",
    "(gp.g_re*xs.x_im + gp.g_im*xs.x_re)*gq.g_re - (gp.g_re*xs.x_re - gp.g_im*xs.x_im)*gq.g_im")

  private val gainJoinSql =
    """FROM xs
      |JOIN g gp ON gp.time_index = xs.time_index AND gp.ant = xs.ant1
      |JOIN g gq ON gq.time_index = xs.time_index AND gq.ant = xs.ant2""".stripMargin

  val qs: Seq[Q] = Seq(

    // -- R2: predict_vis = G_p (Σ_s X_pqs) G_q^H + B_pq (diag/scalar mode).
    Q("r02_predict_vis",
      s"""WITH rws AS (${uvwRowsSql(16)}), src AS (${sourcesSql(5)}),
         |ch AS (${channelsSql(8)}), g AS (${gainsSql()}),
         |xs AS ($sourceSumSql)
         |SELECT xs.row_id, xs.chan,
         |  ${modelSql(0)} + ((xs.row_id * 13 + xs.chan * 5) % 19 - 9) / 16e0 AS vre,
         |  ${modelSql(1)} + ((xs.row_id * 17 + xs.chan * 7) % 11 - 5) / 16e0 AS vim
         |$gainJoinSql""".stripMargin) { (s, dir) =>
      val xs = withGains(sourceSum(s, dir), gains(s, dir))
      val x = CxCol(col("x_re"), col("x_im"))
      val v = gp * x * gq.conj
      xs.select(col("row_id"), col("chan"),
        (v.re + baseRe(col("row_id"), col("chan"))).as("vre"),
        (v.im + baseIm(col("row_id"), col("chan"))).as("vim"))
    },

    // -- G1: corrupt_vis, diagonal 2-corr mode: per-corr gains applied to
    //    per-corr source sums (XX uses g, YY uses a derived second gain).
    Q("g01_corrupt_vis",
      s"""WITH rws AS (${uvwRowsSql(16)}), src AS (${sourcesSql(5)}),
         |ch AS (${channelsSql(8)}), g AS (${gainsSql()}),
         |xs AS (
         |  SELECT row_id, time_index, ant1, ant2, chan,
         |    SUM($cohReSql) AS x_re, SUM($cohImSql) AS x_im,
         |    SUM(((src_id * 5 + row_id * 3 + chan + 8) % 17 - 8) / 16e0) AS y_re,
         |    SUM(((src_id * 7 + row_id * 11 + (chan + 8) * 3) % 13 - 6) / 16e0) AS y_im
         |  FROM rws, src, ch GROUP BY row_id, time_index, ant1, ant2, chan)
         |SELECT xs.row_id, xs.chan,
         |  ${modelSql(0)} AS xx_re,
         |  ${modelSql(1)} AS xx_im,
         |  ((3e0 - gp.g_re)*xs.y_re - (-gp.g_im)*xs.y_im)*(3e0 - gq.g_re) + ((3e0 - gp.g_re)*xs.y_im + (-gp.g_im)*xs.y_re)*(-gq.g_im) AS yy_re,
         |  ((3e0 - gp.g_re)*xs.y_im + (-gp.g_im)*xs.y_re)*(3e0 - gq.g_re) - ((3e0 - gp.g_re)*xs.y_re - (-gp.g_im)*xs.y_im)*(-gq.g_im) AS yy_im
         |$gainJoinSql""".stripMargin) { (s, dir) =>
      val rws = uvwRows(s, dir, 16)
      val src = broadcast(sources(s, dir, 5))
      val ch = broadcast(channels(s, dir, 8))
      val xs = rws.crossJoin(src).crossJoin(ch)
        .groupBy("row_id", "time_index", "ant1", "ant2", "chan")
        .agg(
          sum(cohRe(col("src_id"), col("row_id"), col("chan"))).as("x_re"),
          sum(cohIm(col("src_id"), col("row_id"), col("chan"))).as("x_im"),
          sum(cohRe(col("src_id"), col("row_id"), col("chan") + 8)).as("y_re"),
          sum(cohIm(col("src_id"), col("row_id"), col("chan") + 8)).as("y_im"))
      val j = withGains(xs, gains(s, dir))
      val vxx = gp * CxCol(col("x_re"), col("x_im")) * gq.conj
      // second-corr gain: (3 - g_re, -g_im) — dyadic, |.| >= 1.
      val gp2 = CxCol(lit(3e0) - col("gp_re"), -col("gp_im"))
      val gq2 = CxCol(lit(3e0) - col("gq_re"), -col("gq_im"))
      val vyy = gp2 * CxCol(col("y_re"), col("y_im")) * gq2.conj
      j.select(col("row_id"), col("chan"),
        vxx.re.as("xx_re"), vxx.im.as("xx_im"),
        vyy.re.as("yy_re"), vyy.im.as("yy_im"))
    },

    // -- G2: correct_vis = g_p^{-1} V g_q^{-H} (scalar mode): V / (g_p g_q*).
    //    Division of exact dyadics is a single IEEE op — deterministic, no
    //    rounding needed (|g|^2 >= 1 by construction).
    Q("g02_correct_vis",
      s"""WITH rws AS (${uvwRowsSql(16)}), cv AS (${corrVisSql(16)}),
         |g AS (${gainsSql()}),
         |j AS (
         |  SELECT rws.row_id,
         |    gp.g_re*gq.g_re + gp.g_im*gq.g_im AS d_re,
         |    gp.g_im*gq.g_re - gp.g_re*gq.g_im AS d_im
         |  FROM rws
         |  JOIN g gp ON gp.time_index = rws.time_index AND gp.ant = rws.ant1
         |  JOIN g gq ON gq.time_index = rws.time_index AND gq.ant = rws.ant2)
         |SELECT cv.row_id,
         |  (cv.xx_re*j.d_re + cv.xx_im*j.d_im) / (j.d_re*j.d_re + j.d_im*j.d_im) AS xx_re,
         |  (cv.xx_im*j.d_re - cv.xx_re*j.d_im) / (j.d_re*j.d_re + j.d_im*j.d_im) AS xx_im,
         |  (cv.yy_re*j.d_re + cv.yy_im*j.d_im) / (j.d_re*j.d_re + j.d_im*j.d_im) AS yy_re,
         |  (cv.yy_im*j.d_re - cv.yy_re*j.d_im) / (j.d_re*j.d_re + j.d_im*j.d_im) AS yy_im
         |FROM cv JOIN j ON cv.row_id = j.row_id""".stripMargin) { (s, dir) =>
      val j = withGains(uvwRows(s, dir, 16), gains(s, dir))
        .select(col("row_id").as("jrow"), col("gp_re"), col("gp_im"),
          col("gq_re"), col("gq_im"))
      val d = gp * gq.conj
      val cv = corrVis(s, dir, 16)
      val vxx = CxCol(col("xx_re"), col("xx_im")) / d
      val vyy = CxCol(col("yy_re"), col("yy_im")) / d
      cv.join(j, col("row_id") === col("jrow"))
        .select(col("row_id"),
          vxx.re.as("xx_re"), vxx.im.as("xx_im"),
          vyy.re.as("yy_re"), vyy.im.as("yy_im"))
    },

    // -- G3: residual_vis = B_pq - G_p (Σ_s X_pqs) G_q^H (exact dyadic).
    Q("g03_residual_vis",
      s"""WITH rws AS (${uvwRowsSql(16)}), src AS (${sourcesSql(5)}),
         |ch AS (${channelsSql(8)}), g AS (${gainsSql()}),
         |xs AS ($sourceSumSql)
         |SELECT xs.row_id, xs.chan,
         |  ((xs.row_id * 13 + xs.chan * 5) % 19 - 9) / 16e0 - (${modelSql(0)}) AS vre,
         |  ((xs.row_id * 17 + xs.chan * 7) % 11 - 5) / 16e0 - (${modelSql(1)}) AS vim
         |$gainJoinSql""".stripMargin) { (s, dir) =>
      val xs = withGains(sourceSum(s, dir), gains(s, dir))
      val v = gp * CxCol(col("x_re"), col("x_im")) * gq.conj
      xs.select(col("row_id"), col("chan"),
        (baseRe(col("row_id"), col("chan")) - v.re).as("vre"),
        (baseIm(col("row_id"), col("chan")) - v.im).as("vim"))
    },

    // -- R9: wsclean_predict — WSClean spectra x phase, summed over source
    //    (the fused spectral+phase+sum kernel, rime/wsclean_predict.py:11-118).
    Q("r09_wsclean_predict",
      s"""WITH src AS (${sourcesSql(5)}), rws AS (${uvwRowsSql(16)}),
         |ch AS (${channelsSql(8)})
         |SELECT row_id, chan,
         |  ${fsumSql(s"(CASE WHEN log_poly THEN $specLogSql ELSE $specOrdSql END) * cos($phaseSql)")} AS vre,
         |  ${fsumSql(s"(CASE WHEN log_poly THEN $specLogSql ELSE $specOrdSql END) * sin($phaseSql)")} AS vim
         |FROM rws, src, ch GROUP BY row_id, chan""".stripMargin) { (s, dir) =>
      val src = broadcast(sources(s, dir, 5))
      val rws = uvwRows(s, dir, 16)
      val ch = broadcast(channels(s, dir, 8))
      val spec = Spectral.wscleanSpectra(col("flux"), Seq(col("spi0"), col("spi1")),
        col("log_poly"), col("ref_freq"), col("freq"))
      val ph = Phase.phaseDelay(col("l"), col("m"),
        col("u"), col("v"), col("w"), col("freq"))
      rws.crossJoin(src).crossJoin(ch)
        .groupBy("row_id", "chan")
        .agg(Det.fsum(spec * ph.re).as("vre"), Det.fsum(spec * ph.im).as("vim"))
    },

    // -- D1: im_to_vis — forward DFT with casa sign convention, flux only.
    Q("d01_im_to_vis",
      s"""WITH src AS (${sourcesSql(5)}), rws AS (${uvwRowsSql(16)}),
         |ch AS (${channelsSql(8)})
         |SELECT row_id, chan,
         |  ${fsumSql(s"flux * cos($phaseCasaSql)")} AS vre,
         |  ${fsumSql(s"flux * sin($phaseCasaSql)")} AS vim
         |FROM rws, src, ch GROUP BY row_id, chan""".stripMargin) { (s, dir) =>
      val src = broadcast(sources(s, dir, 5))
      val rws = uvwRows(s, dir, 16)
      val ch = broadcast(channels(s, dir, 8))
      val ph = Phase.phaseDelay(col("l"), col("m"),
        col("u"), col("v"), col("w"), col("freq"), "casa")
      rws.crossJoin(src).crossJoin(ch)
        .groupBy("row_id", "chan")
        .agg(Det.fsum(col("flux") * ph.re).as("vre"),
          Det.fsum(col("flux") * ph.im).as("vim"))
    },

    // -- D2: vis_to_im — adjoint DFT, flag-aware: image cell (src, chan) =
    //    Σ_unflagged rows Re[e^{+i ψ} V]. The only wide operation is the
    //    groupBy(src, chan) whose output is the (tiny) image.
    Q("d02_vis_to_im",
      s"""WITH src AS (${sourcesSql(5)}), rws AS (${uvwRowsSql(16)}),
         |ch AS (${channelsSql(8)})
         |SELECT src_id, chan,
         |  ${fsumSql(s"cos($phaseCasaSql) * ($baseReSql) - sin($phaseCasaSql) * ($baseImSql)")} AS image
         |FROM rws, src, ch
         |WHERE row_id % 80 <> 0
         |GROUP BY src_id, chan""".stripMargin) { (s, dir) =>
      val src = broadcast(sources(s, dir, 5))
      val rws = uvwRows(s, dir, 16).filter(col("row_id") % 80 =!= 0)
      val ch = broadcast(channels(s, dir, 8))
      val ph = Phase.phaseDelay(col("l"), col("m"),
        col("u"), col("v"), col("w"), col("freq"), "casa")
      rws.crossJoin(src).crossJoin(ch)
        .groupBy("src_id", "chan")
        .agg(Det.fsum(
          ph.re * baseRe(col("row_id"), col("chan"))
            - ph.im * baseIm(col("row_id"), col("chan"))).as("image"))
    })
}
