package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables
import graft.operators.Bda

/** BDA queries — SURVEY §2.5 A8/A9.
  *
  * The synthetic view gives every baseline a CONSTANT uvw (so the in-bin
  * decorrelation close never fires and the greedy bins reduce to the time
  * cap's closed form — motion-triggered closes are covered by BdaSpec) but
  * a baseline-DEPENDENT length, so the decorrelation-snapped channel
  * factor genuinely varies per baseline and the oracle states the same
  * sinc thresholds.
  */
object BdaQ {

  private val MaxUvw = 11.0
  private val Tol = 0.95
  private val FracBw = 0.2

  /** Reference-parameterized binner config (Bda.Config): the fixture's
    * per-baseline-constant uvw means the sinc close never fires (Δuvw = 0
    * ⇒ blDecorr ≈ 1 ≥ sinc(πD) for any D > 0), cross-correlations close
    * on the 4 s edge-to-edge span (dense unit intervals ⇒ bins of 4
    * timesteps), and AUTO-correlations never close (the reference's
    * add_row fast path) — the oracle states exactly that closed form. */
  private val Cfg = Bda.Config(
    decorrelation = 0.98, maxLm = 3.0, maxChanFreq = 14e8,
    timeBinSecs = 4.0, maxUvwDist = MaxUvw, chanTol = Tol,
    nchan = 4, fracBw = FracBw)

  /** MS rows with dense per-baseline times and baseline-constant uvw. */
  def bdaRows(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val base = Tables.orders(s, dir).select(
      k.as("row_id"),
      (k % 4).as("ant1"),
      ((k % 16) / 4).cast("long").as("ant2"))
    val seq = row_number()
      .over(Window.partitionBy("ant1", "ant2").orderBy("row_id"))
      .cast("long") - 1L
    base.withColumn("seq", seq)
      .withColumn("time", lit(1e3) + (col("seq") % 64).cast("double"))
      .withColumn("ivl", lit(1e0))
      .withColumn("exposure", (col("row_id") % 3 + 1) / 4e0)
      .withColumn("u", (col("ant1") * 2 - col("ant2")).cast("double"))
      .withColumn("v", (col("ant1") + col("ant2") * 2).cast("double"))
      .withColumn("w", (col("ant1") - col("ant2")) / 2e0)
  }

  private val bdaCte =
    """bda0 AS (
      |  SELECT o_orderkey AS row_id,
      |    o_orderkey % 4 AS ant1,
      |    (o_orderkey % 16) // 4 AS ant2,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderkey % 4, (o_orderkey % 16) // 4
      |                       ORDER BY o_orderkey) - 1 AS seq
      |  FROM orders),
      |bdap AS (
      |  SELECT row_id, ant1, ant2, seq,
      |    1e3 + (seq % 64) * 1e0 AS time,
      |    (row_id % 3 + 1) / 4e0 AS exposure,
      |    CASE WHEN ant1 = ant2 THEN CAST(0 AS BIGINT)
      |         ELSE CAST((seq % 64) // 4 AS BIGINT) END AS bin,
      |    pi() * sqrt((ant1*2 - ant2)*(ant1*2 - ant2)
      |      + (ant1 + ant2*2)*(ant1 + ant2*2)
      |      + ((ant1 - ant2)/2e0)*((ant1 - ant2)/2e0)) / 11e0 * 2e-1 AS psi
      |  FROM bda0),
      |bda AS (
      |  SELECT *,
      |    CASE WHEN (CASE WHEN psi = 0 THEN 1e0 ELSE sin(2e0*psi)/(2e0*psi) END) >= 95e-2
      |           THEN CAST(1 AS BIGINT)
      |         WHEN (CASE WHEN psi = 0 THEN 1e0 ELSE sin(psi)/psi END) >= 95e-2
      |           THEN CAST(2 AS BIGINT)
      |         ELSE CAST(4 AS BIGINT) END AS nchan_out
      |  FROM bdap)""".stripMargin

  private def mapped(s: SparkSession, dir: String): DataFrame =
    Bda.mapper(bdaRows(s, dir), Cfg)

  val qs: Seq[Q] = Seq(

    // -- A8: bda_mapper — greedy baseline-dependent binning + channel
    //    factor snapping.
    Q("a08_bda_mapper",
      s"""WITH $bdaCte
         |SELECT row_id, ant1, ant2, bin, nchan_out FROM bda""".stripMargin) {
      (s, dir) => mapped(s, dir)
    },

    // -- A8b: the RAGGED channel map (bda_mapping.py:192-277 finalise_bin
    //    + :575-614 offsets): per output bin, the Atemkeng-derived channel
    //    count — Δν = (c/2π)·(decorrelation/max_abs_dist) from the bin's
    //    central uvw, divided by the PER-CHANNEL widths (varying
    //    EFFECTIVE_BW), min-capped, snapped UP to the next factor of
    //    nchan — plus flattened-channel-axis offsets, decorrelated channel
    //    width, and the bin's time centroid/interval. Auto-correlated
    //    baselines collapse to one channel (finalise_bin's auto_corr
    //    branch). Offsets are a distributed two-level prefix scan:
    //    per-baseline running sums (partitioned window) + baseline base
    //    offsets (a window over the BASELINE-COUNT relation — tiny by
    //    construction, never data-sized).
    Q("a10_bda_ragged_map", {
      val cw = Seq("1e7", "1125e4", "125e5", "1375e4") // per-channel widths
      s"""WITH $bdaCte,
         |bb AS (
         |  SELECT ant1, ant2, bin, MIN(time) AS t0, MAX(time) AS t1
         |  FROM bda GROUP BY ant1, ant2, bin),
         |bx AS (
         |  SELECT *,
         |    (299792458e0/(2e0*pi()))
         |      * (98e-2 / sqrt(abs(sqrt((ant1*2 - ant2)*(ant1*2 - ant2)*1e0
         |             + (ant1 + ant2*2)*(ant1 + ant2*2)*1e0)) * 5e-1
         |           + abs((ant1 - ant2)/2e0) * abs(sqrt(75e-2) - 1e0))) AS dnu
         |  FROM bb),
         |bn AS (
         |  SELECT ant1, ant2, bin, t0, t1,
         |    CASE WHEN ant1 = ant2 THEN CAST(1 AS BIGINT)
         |         WHEN CEIL(4e0 / GREATEST(
         |             LEAST(${cw.map(c => s"dnu/$c").mkString(", ")}), 1e0)) <= 1
         |           THEN CAST(1 AS BIGINT)
         |         WHEN CEIL(4e0 / GREATEST(
         |             LEAST(${cw.map(c => s"dnu/$c").mkString(", ")}), 1e0)) <= 2
         |           THEN CAST(2 AS BIGINT)
         |         ELSE CAST(4 AS BIGINT) END AS nchan
         |  FROM bx)
         |SELECT ant1, ant2, bin, nchan,
         |  CAST(COALESCE(SUM(nchan) OVER (ORDER BY ant1, ant2, bin
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS offset,
         |  (${cw.mkString(" + ")}) / nchan AS decorr_chan_width,
         |  ((t0 - 5e-1) + (t1 + 5e-1)) / 2e0 AS tc,
         |  (t1 + 5e-1) - (t0 - 5e-1) AS ivl_out
         |FROM bn""".stripMargin
    }) { (s, dir) =>
      // the mapper carries `time` through its one baseline shuffle, so the
      // bin extents aggregate directly off its output — no second window
      // over orders and no row_id join-back
      val bb = Bda.mapperWithPayload(bdaRows(s, dir), Cfg, Nil)
        .groupBy("ant1", "ant2", "bin")
        .agg(min(col("time")).as("t0"), max(col("time")).as("t1"))
      val a1 = col("ant1"); val a2 = col("ant2")
      val cuv = sqrt(((a1 * 2 - a2) * (a1 * 2 - a2) * 1e0
        + (a1 + a2 * 2) * (a1 + a2 * 2) * 1e0))
      val mad = sqrt(abs(cuv) * 5e-1
        + abs((a1 - a2) / 2e0) * abs(sqrt(lit(75e-2)) - 1e0))
      val dnu = lit(299792458e0) / (lit(2e0) * math.Pi) * (lit(98e-2) / mad)
      val cws = Seq(1e7, 1125e4, 125e5, 1375e4)
      val fracMin = least(cws.map(c => dnu / c): _*)
      val nchan0 = ceil(lit(4e0) / greatest(fracMin, lit(1e0)))
      val bn = bb.withColumn("nchan",
        when(a1 === a2, 1L)
          .when(nchan0 <= 1, 1L)
          .when(nchan0 <= 2, 2L)
          .otherwise(4L))
      // two-level distributed prefix scan for the flattened offsets
      val wIn = Window.partitionBy("ant1", "ant2").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
      val withIn = bn.withColumn("within",
        coalesce(sum(col("nchan")).over(wIn), lit(0L)))
      val totals = bn.groupBy(col("ant1").as("ta1"), col("ant2").as("ta2"))
        .agg(sum(col("nchan")).as("tot"))
      val wBase = Window.orderBy("ta1", "ta2")
        .rowsBetween(Window.unboundedPreceding, -1)
      val bases = totals.withColumn("base",
        coalesce(sum(col("tot")).over(wBase), lit(0L))).drop("tot")
      withIn
        .join(broadcast(bases), a1 === col("ta1") && a2 === col("ta2"))
        .select(a1, a2, col("bin"), col("nchan"),
          (col("base") + col("within")).as("offset"),
          (cws.map(lit): Seq[org.apache.spark.sql.Column]).reduce(_ + _)
            .divide(col("nchan")).as("decorr_chan_width"),
          (((col("t0") - 5e-1) + (col("t1") + 5e-1)) / 2e0).as("tc"),
          ((col("t1") + 5e-1) - (col("t0") - 5e-1)).as("ivl_out"))
    },

    // -- A8 flag accounting (Binner.start_bin/add_row count flagged rows;
    //    finalise_bin emits bin_count == bin_flag_count as the bin flag,
    //    bda_mapping.py:100-186, 192-277): flag_row rides the binner's
    //    baseline shuffle as a carry column; per bin the nominal
    //    edge-midpoint time/interval (finalise_bin uses ALL rows) plus
    //    the all-flagged consensus and both counts. The fixture flags bin
    //    0 of every 64-seq block entirely (fallback regime) and scatters
    //    row_id%11 partials through mixed bins; auto baselines (single
    //    all-history bin) stay unflagged-dominated.
    Q("a16_bda_flags",
      s"""WITH $bdaCte,
         |bf AS (
         |  SELECT ant1, ant2, bin,
         |    (seq % 64 < 4) OR (row_id % 11 = 0) AS flag_row, time
         |  FROM bda)
         |SELECT ant1, ant2, bin,
         |  ((MIN(time) - 5e-1) + (MAX(time) + 5e-1)) / 2e0 AS tc,
         |  (MAX(time) + 5e-1) - (MIN(time) - 5e-1) AS ivl_out,
         |  BOOL_AND(flag_row) AS flag_out,
         |  CAST(SUM(CASE WHEN flag_row THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows
         |FROM bf GROUP BY ant1, ant2, bin""".stripMargin) { (s, dir) =>
      val rows = bdaRows(s, dir).withColumn("flag_row",
        (col("seq") % 64 < 4) || (col("row_id") % 11 === 0))
      Bda.mapperWithPayload(rows, Cfg, Seq("flag_row"))
        .groupBy("ant1", "ant2", "bin")
        .agg(
          (((min(col("time")) - 5e-1) + (max(col("time")) + 5e-1)) / 2e0).as("tc"),
          ((max(col("time")) + 5e-1) - (min(col("time")) - 5e-1)).as("ivl_out"),
          bool_and(col("flag_row")).as("flag_out"),
          sum(when(col("flag_row"), 1L).otherwise(0L)).as("n_flagged"),
          count(lit(1)).as("n_rows"))
    },

    // -- A9: bda average — exposure-weighted row averages + ragged channel
    //    groups: each bin emits nchan_out output channels (ochan), vis
    //    weighted-averaged within each group
    //    (africanus/averaging/bda_avg.py:32-654).
    Q("a09_bda_average",
      s"""WITH $bdaCte,
         |cx AS (
         |  SELECT b.*, c.chan, c.chan // (4 // b.nchan_out) AS ochan,
         |    ((b.row_id * 5 + c.chan * 3) % 17 - 8) / 16e0 AS vre,
         |    ((b.row_id * 7 + c.chan * 5) % 13 - 6) / 16e0 AS vim,
         |    ((b.row_id + c.chan) % 4 + 1) / 4e0 AS ws
         |  FROM bda b, (SELECT CAST(n_nationkey AS BIGINT) AS chan
         |               FROM nation WHERE n_nationkey < 4) c)
         |SELECT ant1, ant2, bin, ochan,
         |  SUM(ws * vre) / SUM(ws) AS vre_avg,
         |  SUM(ws * vim) / SUM(ws) AS vim_avg,
         |  SUM(ws) AS ws_sum,
         |  SUM(exposure) AS exposure_sum,
         |  SUM(exposure * time) / SUM(exposure) AS time_centroid,
         |  CAST(COUNT(*) AS BIGINT) AS n_samples
         |FROM cx GROUP BY ant1, ant2, bin, ochan""".stripMargin) { (s, dir) =>
      // exposure rides the mapper's baseline shuffle (carry column) — the
      // former orders-sized row_id join-back is gone
      val m = Bda.mapperWithPayload(bdaRows(s, dir), Cfg, Seq("exposure"))
      val ch = broadcast(Tables.nation(s, dir).filter(col("n_nationkey") < 4)
        .select(col("n_nationkey").cast("long").as("chan")))
      m.crossJoin(ch)
        .withColumn("ochan",
          (col("chan") / (lit(4L) / col("nchan_out")).cast("long")).cast("long"))
        .withColumn("vre", ((col("row_id") * 5 + col("chan") * 3) % 17 - 8) / 16e0)
        .withColumn("vim", ((col("row_id") * 7 + col("chan") * 5) % 13 - 6) / 16e0)
        .withColumn("ws", ((col("row_id") + col("chan")) % 4 + 1) / 4e0)
        .groupBy("ant1", "ant2", "bin", "ochan")
        .agg(
          (sum(col("ws") * col("vre")) / sum(col("ws"))).as("vre_avg"),
          (sum(col("ws") * col("vim")) / sum(col("ws"))).as("vim_avg"),
          sum(col("ws")).as("ws_sum"),
          sum(col("exposure")).as("exposure_sum"),
          (sum(col("exposure") * col("time")) / sum(col("exposure")))
            .as("time_centroid"),
          count(lit(1)).as("n_samples"))
    },

    // -- A9 at FULL 2×2 correlation with WEIGHT_SPECTRUM and per-element
    //    flags (africanus/averaging/bda_avg.py:269-654 row_chan_average):
    //    the corr axis (2×2 Jones flattened to 4) rides the ragged channel
    //    map — each output (bin, ochan, corr) cell averages its
    //    flag-matching samples with the per-(chan, corr) WEIGHT_SPECTRUM,
    //    a cell is flagged only when ALL its samples are flagged, and a
    //    flagged cell still averages its (flagged) samples — the same
    //    two-tier consensus as time_and_channel. The ant-keyed flag term
    //    flags whole (baseline, corr) cells so the fallback branch executes
    //    across merged rows; the row term scatters partials. Spark shape:
    //    the corr expansion joins the mapper's ONE baseline shuffle output
    //    before the single (bin, ochan, corr) aggregation — no extra pass.
    Q("a19_bda_full_corr",
      s"""WITH $bdaCte,
         |cx AS (
         |  SELECT b.*, c.chan, k.corr, c.chan // (4 // b.nchan_out) AS ochan,
         |    ((b.row_id * 5 + c.chan * 3 + k.corr * 7) % 17 - 8) / 16e0 AS vre,
         |    ((b.row_id * 7 + c.chan * 5 + k.corr * 3) % 13 - 6) / 16e0 AS vim,
         |    ((b.row_id * 3 + c.chan * 5 + k.corr) % 9 + 1) / 8e0 AS ws,
         |    ((b.ant1 * 3 + b.ant2 * 5 + k.corr) % 11 < 2)
         |      OR ((b.row_id + c.chan + k.corr) % 23 = 0) AS flg
         |  FROM bda b,
         |    (SELECT CAST(n_nationkey AS BIGINT) AS chan
         |     FROM nation WHERE n_nationkey < 4) c,
         |    (SELECT CAST(n_nationkey AS BIGINT) AS corr
         |     FROM nation WHERE n_nationkey < 4) k),
         |g AS (
         |  SELECT *,
         |    SUM(CASE WHEN flg THEN 0 ELSE 1 END)
         |      OVER (PARTITION BY ant1, ant2, bin, ochan, corr) AS n_ok
         |  FROM cx)
         |SELECT ant1, ant2, bin, ochan, corr,
         |  CAST(SUM(CASE WHEN flg = (n_ok = 0) THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_used,
         |  (n_ok = 0) AS oflag,
         |  SUM(CASE WHEN flg = (n_ok = 0) THEN ws ELSE 0e0 END) AS ws_sum,
         |  SUM(CASE WHEN flg = (n_ok = 0) THEN ws * vre ELSE 0e0 END)
         |    / SUM(CASE WHEN flg = (n_ok = 0) THEN ws ELSE 0e0 END) AS vre_avg,
         |  SUM(CASE WHEN flg = (n_ok = 0) THEN ws * vim ELSE 0e0 END)
         |    / SUM(CASE WHEN flg = (n_ok = 0) THEN ws ELSE 0e0 END) AS vim_avg
         |FROM g GROUP BY ant1, ant2, bin, ochan, corr, n_ok = 0""".stripMargin) {
      (s, dir) =>
      val m = Bda.mapperWithPayload(bdaRows(s, dir), Cfg, Nil)
      val ch = broadcast(Tables.nation(s, dir).filter(col("n_nationkey") < 4)
        .select(col("n_nationkey").cast("long").as("chan")))
      val co = broadcast(Tables.nation(s, dir).filter(col("n_nationkey") < 4)
        .select(col("n_nationkey").cast("long").as("corr")))
      val flat = m.crossJoin(ch).crossJoin(co)
        .withColumn("ochan",
          (col("chan") / (lit(4L) / col("nchan_out")).cast("long")).cast("long"))
        .withColumn("vre",
          ((col("row_id") * 5 + col("chan") * 3 + col("corr") * 7) % 17 - 8) / 16e0)
        .withColumn("vim",
          ((col("row_id") * 7 + col("chan") * 5 + col("corr") * 3) % 13 - 6) / 16e0)
        .withColumn("ws",
          ((col("row_id") * 3 + col("chan") * 5 + col("corr")) % 9 + 1) / 8e0)
        .withColumn("flg",
          ((col("ant1") * 3 + col("ant2") * 5 + col("corr")) % 11 < 2)
            || ((col("row_id") + col("chan") + col("corr")) % 23 === 0))
      val grouped = flat.groupBy("ant1", "ant2", "bin", "ochan", "corr")
        .agg(
          sum(when(!col("flg"), 1).otherwise(0)).as("n_ok"),
          count(lit(1)).as("n_all"),
          sum(when(!col("flg"), col("ws"))).as("w_u"),
          sum(when(col("flg"), col("ws"))).as("w_f"),
          sum(when(!col("flg"), col("ws") * col("vre"))).as("re_u"),
          sum(when(col("flg"), col("ws") * col("vre"))).as("re_f"),
          sum(when(!col("flg"), col("ws") * col("vim"))).as("im_u"),
          sum(when(col("flg"), col("ws") * col("vim"))).as("im_f"))
      val ok = col("n_ok") > 0
      def pick(u: String, f: String) = when(ok, col(u)).otherwise(col(f))
      grouped.select(col("ant1"), col("ant2"), col("bin"), col("ochan"),
        col("corr"),
        when(ok, col("n_ok")).otherwise(col("n_all")).as("n_used"),
        (!ok).as("oflag"),
        pick("w_u", "w_f").as("ws_sum"),
        (pick("re_u", "re_f") / pick("w_u", "w_f")).as("vre_avg"),
        (pick("im_u", "im_f") / pick("w_u", "w_f")).as("vim_avg"))
    })
}
