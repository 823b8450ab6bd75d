package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.core.{Det, Tables}
import graft.operators.{Averaging, Deconv, GlobalIndex, Sessionize}

/** Averaging subsystem queries — SURVEY §2.5 A1-A7.
  *
  * The synthetic MS rows give every baseline a DENSE per-baseline time grid
  * (seq % 64 consecutive seconds, interval = 1 s), so the general greedy
  * sessionizer (graft.operators.Sessionize — the real operator, exercised
  * with irregular intervals in its spec) provably reduces to
  * bin = floor((time - t0) / binSecs), which is what the DuckDB oracle
  * states. All averaged inputs are dyadic rationals — sums are exact and
  * order-independent, divisions/sqrt are single IEEE ops, so every query
  * hash-matches with no rounding.
  *
  * Physical shape at scale: one shuffle keyed by baseline for the binning,
  * then window + groupBy sharing the (baseline, bin) partitioning; payload
  * columns never pass through the sessionizer (joined back on row_id).
  */
object AveragingQ {

  // ---- synthetic MS-main-table view -------------------------------------

  /** Spark side: row_id, ant1, ant2, seq, time, ivl, exposure, weight,
    * sigma, flag_row, u, v, w. NOTE: no `bin` column here — Spark derives
    * bins with the real sessionizer; only the oracle states the closed
    * form. */
  def avRows(s: SparkSession, dir: String): DataFrame = {
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
      .withColumn("weight", (col("row_id") % 5 + 1) / 8e0)
      .withColumn("sigma", (col("row_id") % 7 + 1) / 8e0)
      .withColumn("flag_row",
        (col("row_id") % 11 === 0) || (col("seq") % 64 < 4))
      .withColumn("u", (col("row_id") % 201 - 100) / 4e0)
      .withColumn("v", ((col("row_id") * 3) % 201 - 100) / 4e0)
      .withColumn("w", ((col("row_id") * 7) % 41 - 20) / 8e0)
  }

  /** Oracle CTE chain: av0 (baseline + dense seq), av (columns + the
    * closed-form bin the sessionizer must reproduce). */
  private val avCte =
    """av0 AS (
      |  SELECT o_orderkey AS row_id,
      |    o_orderkey % 4 AS ant1,
      |    (o_orderkey % 16) // 4 AS ant2,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderkey % 4, (o_orderkey % 16) // 4
      |                       ORDER BY o_orderkey) - 1 AS seq
      |  FROM orders),
      |av AS (
      |  SELECT row_id, ant1, ant2, seq,
      |    1e3 + (seq % 64) * 1e0 AS time,
      |    1e0 AS ivl,
      |    (row_id % 3 + 1) / 4e0 AS exposure,
      |    (row_id % 5 + 1) / 8e0 AS weight,
      |    (row_id % 7 + 1) / 8e0 AS sigma,
      |    (row_id % 11 = 0) OR (seq % 64 < 4) AS flag_row,
      |    (row_id % 201 - 100) / 4e0 AS u,
      |    ((row_id * 3) % 201 - 100) / 4e0 AS v,
      |    ((row_id * 7) % 41 - 20) / 8e0 AS w,
      |    CAST((seq % 64) // 4 AS BIGINT) AS bin
      |  FROM av0)""".stripMargin

  /** Flag-match chain over (ant1, ant2, bin) — mirror of
    * operators.Averaging.withFlagMatch. */
  private val avFlagCte =
    """avb AS (
      |  SELECT *, (MIN(CASE WHEN flag_row THEN 1 ELSE 0 END)
      |             OVER (PARTITION BY ant1, ant2, bin) = 1) AS all_flagged
      |  FROM av),
      |avc AS (SELECT *, (flag_row = all_flagged) AS contrib FROM avb)""".stripMargin

  private val a04Select =
    """SELECT ant1, ant2, bin,
      |  AVG(CASE WHEN contrib THEN time END) AS time_avg,
      |  SUM(CASE WHEN contrib THEN ivl END) AS interval_sum,
      |  SUM(CASE WHEN contrib THEN exposure END) AS exposure_sum,
      |  AVG(CASE WHEN contrib THEN u END) AS u_avg,
      |  AVG(CASE WHEN contrib THEN v END) AS v_avg,
      |  AVG(CASE WHEN contrib THEN w END) AS w_avg,
      |  SUM(CASE WHEN contrib THEN weight END) AS weight_sum,
      |  sqrt(SUM(CASE WHEN contrib THEN weight*weight*sigma*sigma END))
      |    / SUM(CASE WHEN contrib THEN weight END) AS sigma_out,
      |  (MIN(CASE WHEN flag_row THEN 1 ELSE 0 END) = 1) AS bin_flag,
      |  CAST(SUM(CASE WHEN contrib THEN 1 ELSE 0 END) AS BIGINT) AS n_contrib
      |FROM avc GROUP BY ant1, ant2, bin""".stripMargin

  /** Per-(row, chan) visibility samples (4 channels) + flag-match chain
    * over (ant1, ant2, bin, chan_bin). */
  private val chvCte =
    """chv AS (
      |  SELECT av.*, c.chan, c.chan // 2 AS chan_bin,
      |    ((av.row_id * 5 + c.chan * 3) % 17 - 8) / 16e0 AS vre,
      |    ((av.row_id * 7 + c.chan * 5) % 13 - 6) / 16e0 AS vim,
      |    ((av.row_id + c.chan) % 4 + 1) / 4e0 AS ws,
      |    ((av.row_id * 7 + c.chan) % 5 + 1) / 8e0 AS sp,
      |    ((av.row_id * 3 + c.chan) % 5 = 0) AS fl
      |  FROM av, (SELECT CAST(n_nationkey AS BIGINT) AS chan
      |            FROM nation WHERE n_nationkey < 4) c),
      |cb AS (
      |  SELECT *, (MIN(CASE WHEN fl THEN 1 ELSE 0 END)
      |             OVER (PARTITION BY ant1, ant2, bin, chan_bin) = 1) AS all_flagged
      |  FROM chv),
      |cc AS (SELECT *, (fl = all_flagged) AS contrib FROM cb)""".stripMargin

  private val a06Select =
    """SELECT ant1, ant2, bin, chan_bin,
      |  SUM(CASE WHEN contrib THEN ws * vre END)
      |    / SUM(CASE WHEN contrib THEN ws END) AS vre_avg,
      |  SUM(CASE WHEN contrib THEN ws * vim END)
      |    / SUM(CASE WHEN contrib THEN ws END) AS vim_avg,
      |  SUM(CASE WHEN contrib THEN ws END) AS ws_sum,
      |  sqrt(SUM(CASE WHEN contrib THEN ws*ws*sp*sp END))
      |    / SUM(CASE WHEN contrib THEN ws END) AS sigma_sp,
      |  (MIN(CASE WHEN fl THEN 1 ELSE 0 END) = 1) AS bin_flag,
      |  CAST(SUM(CASE WHEN contrib THEN 1 ELSE 0 END) AS BIGINT) AS n_samples
      |FROM cc GROUP BY ant1, ant2, bin, chan_bin""".stripMargin

  // ---- Spark-side building blocks ---------------------------------------

  /** avRows through the sessionizer with payload CARRY (round 14): the
    * greedy binner's single (ant1, ant2) shuffle carries every column
    * and appends `bin`. The previous thin-binner + row_id join-back
    * recomputed avRows (scan + seq window) TWICE and paid two extra
    * row_id exchanges + SMJ sorts per consumer — a04/a06/a07 measured
    * 5.9 → 4.1 s combined at sf0.1 (a07 3.2 → 1.8). Binning rule and
    * sort order are
    * bit-identical to the thin path (SessionizeSpec pins it); all
    * averaged inputs stay exact dyadics, so every downstream aggregate
    * is unchanged. */
  private def binned(s: SparkSession, dir: String): DataFrame =
    Sessionize.timeBinsGreedy(avRows(s, dir), 4.0, "ivl")

  def rowAverage(df: DataFrame): DataFrame = {
    import Averaging.{cwhen, sigmaOut}
    Averaging.withFlagMatch(df, "flag_row", Seq("ant1", "ant2", "bin"))
      .groupBy("ant1", "ant2", "bin")
      .agg(
        avg(cwhen(col("time"))).as("time_avg"),
        sum(cwhen(col("ivl"))).as("interval_sum"),
        sum(cwhen(col("exposure"))).as("exposure_sum"),
        avg(cwhen(col("u"))).as("u_avg"),
        avg(cwhen(col("v"))).as("v_avg"),
        avg(cwhen(col("w"))).as("w_avg"),
        sum(cwhen(col("weight"))).as("weight_sum"),
        sigmaOut(col("weight"), col("sigma")).as("sigma_out"),
        (min(when(col("flag_row"), 1L).otherwise(0L)) === 1L).as("bin_flag"),
        sum(when(col("contrib"), 1L).otherwise(0L)).as("n_contrib"))
  }

  private def chanVis(s: SparkSession, dir: String, df: DataFrame): DataFrame = {
    val ch = broadcast(Tables.nation(s, dir).filter(col("n_nationkey") < 4)
      .select(col("n_nationkey").cast("long").as("chan")))
    df.crossJoin(ch)
      .withColumn("chan_bin", (col("chan") / 2).cast("long"))
      .withColumn("vre", ((col("row_id") * 5 + col("chan") * 3) % 17 - 8) / 16e0)
      .withColumn("vim", ((col("row_id") * 7 + col("chan") * 5) % 13 - 6) / 16e0)
      .withColumn("ws", ((col("row_id") + col("chan")) % 4 + 1) / 4e0)
      .withColumn("sp", ((col("row_id") * 7 + col("chan")) % 5 + 1) / 8e0)
      .withColumn("fl", (col("row_id") * 3 + col("chan")) % 5 === 0)
  }

  private def rowChanAverage(df: DataFrame): DataFrame = {
    import Averaging.{cwhen, sigmaOut, wmean}
    Averaging.withFlagMatch(df, "fl", Seq("ant1", "ant2", "bin", "chan_bin"))
      .groupBy("ant1", "ant2", "bin", "chan_bin")
      .agg(
        wmean(col("ws"), col("vre")).as("vre_avg"),
        wmean(col("ws"), col("vim")).as("vim_avg"),
        sum(cwhen(col("ws"))).as("ws_sum"),
        sigmaOut(col("ws"), col("sp")).as("sigma_sp"),
        (min(when(col("fl"), 1L).otherwise(0L)) === 1L).as("bin_flag"),
        sum(when(col("contrib"), 1L).otherwise(0L)).as("n_samples"))
  }

  // ---- queries ----------------------------------------------------------

  val qs: Seq[Q] = Seq(

    // -- A1: unique baselines + dense inverse index + counts
    //    (africanus/averaging/support.py:11-105).
    Q("a01_unique_baselines",
      s"""WITH $avCte
         |SELECT ant1, ant2,
         |  CAST(DENSE_RANK() OVER (ORDER BY ant1, ant2) - 1 AS BIGINT) AS bl_idx,
         |  n_rows, first_row
         |FROM (SELECT ant1, ant2, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |        MIN(row_id) AS first_row
         |      FROM av GROUP BY ant1, ant2)""".stripMargin) { (s, dir) =>
      val bl = avRows(s, dir)
        .groupBy("ant1", "ant2")
        .agg(count(lit(1)).as("n_rows"), min(col("row_id")).as("first_row"))
      // dense index WITHOUT a partition-less window (the single-partition
      // sort PlanSpec bans): rank = count of baselines with a smaller key,
      // via a broadcast self-join over the (tiny, post-aggregation)
      // baseline relation
      val keys = broadcast(bl.select(col("ant1").as("ka1"), col("ant2").as("ka2")))
      bl.join(keys,
          col("ka1") < col("ant1") ||
            (col("ka1") === col("ant1") && col("ka2") < col("ant2")),
          "left")
        .groupBy("ant1", "ant2", "n_rows", "first_row")
        .agg(count(col("ka1")).as("bl_idx"))
        .select("ant1", "ant2", "bl_idx", "n_rows", "first_row")
    },

    // -- A2: row_mapper — greedy per-baseline time binning; the oracle
    //    states the closed form valid on the dense grid.
    Q("a02_row_mapper",
      s"""WITH $avCte
         |SELECT row_id, ant1, ant2, bin FROM av""".stripMargin) { (s, dir) =>
      Sessionize.timeBins(avRows(s, dir), 4.0, "ivl")
    },

    // -- A2 FULL semantics (time_and_channel_mapping.py:255-358): the
    //    reference's interval-window close rule (bin closes when
    //    time + ivl/2 − bin_low > binSecs), unique (baseline, time) rows,
    //    per-bin nominal TIME mean / INTERVAL sum, bins flagged only when
    //    EVERY member row is flagged, and the GLOBAL output-row numbering
    //    from the argsort of averaged bin times (stable: ties broken by
    //    the lexicographic baseline order, then bin). The global index is
    //    a range-partitioned sort + per-partition numbering + collected
    //    partition counts — never a single-partition window.
    Q("a14_row_mapper_full",
      """WITH f0 AS (
        |  SELECT o_orderkey AS row_id,
        |    o_orderkey % 4 AS ant1,
        |    (o_orderkey % 16) // 4 AS ant2,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderkey % 4, (o_orderkey % 16) // 4
        |                       ORDER BY o_orderkey) - 1 AS seq
        |  FROM orders),
        |f AS (
        |  SELECT row_id, ant1, ant2, seq,
        |    1e3 + seq * 1e0 AS time,
        |    (row_id % 11 = 0) OR (seq % 64 < 4) AS flag_row,
        |    CAST(seq // 4 AS BIGINT) AS bin
        |  FROM f0),
        |bins AS (
        |  SELECT ant1, ant2, bin,
        |    AVG(time) AS time_avg, SUM(1e0) AS ivl_sum,
        |    BOOL_AND(flag_row) AS flag_out
        |  FROM f GROUP BY ant1, ant2, bin),
        |obins AS (
        |  SELECT *, CAST(ROW_NUMBER() OVER
        |      (ORDER BY time_avg, ant1, ant2, bin) - 1 AS BIGINT) AS out_row
        |  FROM bins)
        |SELECT r.row_id, o.out_row, o.time_avg, o.ivl_sum, o.flag_out
        |FROM f r JOIN obins o
        |  ON r.ant1 = o.ant1 AND r.ant2 = o.ant2 AND r.bin = o.bin""".stripMargin) {
      (s, dir) =>
      val rows = avRows(s, dir)
        .withColumn("time", lit(1e3) + col("seq").cast("double"))
        .select("row_id", "ant1", "ant2", "time", "ivl", "flag_row")
      // payload rides the binner's single (ant1, ant2) shuffle — no
      // row_id join-back (the a10 idiom; saves a fact-sized shuffle)
      val withBin = Sessionize.timeBinsCarry(rows, 4.0)
      val bins = withBin.groupBy("ant1", "ant2", "bin")
        .agg(avg(col("time")).as("time_avg"),
          sum(col("ivl")).as("ivl_sum"),
          bool_and(col("flag_row")).as("flag_out"))
      val obins = GlobalIndex.byOrder(bins,
        Seq(col("time_avg"), col("ant1"), col("ant2"), col("bin")), "out_row")
        .select(col("ant1").as("ba1"), col("ant2").as("ba2"),
          col("bin").as("bb"), col("out_row"), col("time_avg"),
          col("ivl_sum"), col("flag_out"))
      withBin.join(obins,
          col("ant1") === col("ba1") && col("ant2") === col("ba2")
            && col("bin") === col("bb"))
        .select("row_id", "out_row", "time_avg", "ivl_sum", "flag_out")
    },

    // -- A2 FULL flag semantics: flag_row derived from the per-channel
    //    flag array by merge_flags (all-set ⇒ row flagged, shared.py:19-80)
    //    and the TWO-TIER bin statistics of row_mapper
    //    (time_and_channel_mapping.py:66-120, 255-308): bin time/interval
    //    average over the UNFLAGGED rows when any exist, over the flagged
    //    rows otherwise; the bin flag is the all-flagged consensus. The
    //    fixture makes the first bin of every 64-seq block ALL flagged
    //    (seq%64<4 rows) so the fallback tier executes, scatters
    //    partially-flagged rows (row_id%11) through mixed bins so the two
    //    tiers genuinely differ from the nominal average, and adds
    //    channel-local flags that must NOT reach flag_row (the merge only
    //    fires when every channel agrees).
    Q("a15_row_mapper_flags",
      """WITH f0 AS (
        |  SELECT o_orderkey AS row_id,
        |    o_orderkey % 4 AS ant1,
        |    (o_orderkey % 16) // 4 AS ant2,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderkey % 4, (o_orderkey % 16) // 4
        |                       ORDER BY o_orderkey) - 1 AS seq
        |  FROM orders),
        |f AS (
        |  SELECT row_id, ant1, ant2, seq,
        |    1e3 + seq * 1e0 AS time, 1e0 AS ivl,
        |    (seq % 64 < 4) OR (row_id % 11 = 0) AS flag_row,
        |    CAST(seq // 4 AS BIGINT) AS bin
        |  FROM f0)
        |SELECT ant1, ant2, bin,
        |  CASE WHEN SUM(CASE WHEN NOT flag_row THEN 1 END) > 0
        |       THEN SUM(CASE WHEN NOT flag_row THEN time END)
        |            / SUM(CASE WHEN NOT flag_row THEN 1 END)
        |       ELSE SUM(time) / COUNT(*) END AS time_out,
        |  CASE WHEN SUM(CASE WHEN NOT flag_row THEN 1 END) > 0
        |       THEN SUM(CASE WHEN NOT flag_row THEN ivl END)
        |       ELSE SUM(ivl) END AS ivl_out,
        |  BOOL_AND(flag_row) AS flag_out,
        |  CAST(SUM(CASE WHEN flag_row THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM f GROUP BY ant1, ant2, bin""".stripMargin) { (s, dir) =>
      val rows = avRows(s, dir)
        .withColumn("time", lit(1e3) + col("seq").cast("double"))
        // per-channel flag array; the closed form (seq%64<4 OR row_id%11=0)
        // the oracle states emerges ONLY through the all-channels merge —
        // the (row_id+c)%3 term flags scattered channels but can never
        // cover all four, so it must not survive into flag_row
        .withColumn("flags", expr(
          """transform(sequence(0, 3), c ->
            |  (seq % 64 < 4) OR (row_id % 11 = 0) OR ((row_id + c) % 3 = 0))""".stripMargin))
        .withColumn("flag_row", Averaging.mergeFlagRow(col("flags")))
        .select("row_id", "ant1", "ant2", "time", "ivl", "flag_row")
      Sessionize.timeBinsCarry(rows, 4.0)
        .groupBy("ant1", "ant2", "bin")
        .agg(
          Averaging.twoTierAvg(col("time"), col("flag_row")).as("time_out"),
          Averaging.twoTierSum(col("ivl"), col("flag_row")).as("ivl_out"),
          bool_and(col("flag_row")).as("flag_out"),
          sum(when(col("flag_row"), 1L).otherwise(0L)).as("n_flagged"),
          count(lit(1)).as("n_rows"))
    },

    // -- A5: channel bin averages (africanus/averaging/time_and_channel_avg
    //    .py:680-753): mean freq, summed width per 2-channel bin.
    Q("a05_chan_average",
      s"""WITH ch AS (${SyntheticMs.channelsSql(8)})
         |SELECT chan // 2 AS chan_bin,
         |  AVG(freq) AS freq_avg,
         |  SUM(1e6 * (chan % 3 + 1)) AS width_sum,
         |  CAST(COUNT(*) AS BIGINT) AS n_chans
         |FROM ch GROUP BY chan // 2""".stripMargin) { (s, dir) =>
      SyntheticMs.channels(s, dir, 8)
        .withColumn("chan_bin", (col("chan") / 2).cast("long"))
        .groupBy("chan_bin")
        .agg(avg(col("freq")).as("freq_avg"),
          sum(lit(1e6) * (col("chan") % 3 + 1)).as("width_sum"),
          count(lit(1)).as("n_chans"))
    },

    // -- A4: row averages under the flag-match rule.
    Q("a04_row_average",
      s"""WITH $avCte, $avFlagCte
         |$a04Select""".stripMargin) { (s, dir) =>
      rowAverage(binned(s, dir))
    },

    // -- A6: (row, chan) weighted visibility averages with flag consensus.
    Q("a06_row_chan_average",
      s"""WITH $avCte, $chvCte
         |$a06Select""".stripMargin) { (s, dir) =>
      rowChanAverage(chanVis(s, dir, binned(s, dir)))
    },

    // -- A7: composite time_and_channel — row-level and chan-level averages
    //    assembled into one output (time_and_channel_avg.py:763-974).
    Q("a07_time_channel",
      s"""WITH $avCte, $avFlagCte, $chvCte,
         |r AS ($a04Select), c AS ($a06Select)
         |SELECT r.ant1, r.ant2, r.bin, c.chan_bin,
         |  r.time_avg, r.interval_sum, r.exposure_sum, r.weight_sum,
         |  r.sigma_out, r.bin_flag AS row_flag,
         |  c.vre_avg, c.vim_avg, c.ws_sum, c.bin_flag AS chan_flag
         |FROM r JOIN c
         |  ON r.ant1 = c.ant1 AND r.ant2 = c.ant2 AND r.bin = c.bin""".stripMargin) { (s, dir) =>
      // both average branches consume the sessionizer output — persist it
      // so the per-baseline binning (the only flatMapGroups stage) runs
      // once, not once per branch
      val b = binned(s, dir).persist()
      val r = rowAverage(b)
        .withColumnRenamed("bin_flag", "row_flag")
      val c = rowChanAverage(chanVis(s, dir, b))
        .withColumnRenamed("bin_flag", "chan_flag")
      r.join(c, Seq("ant1", "ant2", "bin"))
        .select("ant1", "ant2", "bin", "chan_bin",
          "time_avg", "interval_sum", "exposure_sum", "weight_sum",
          "sigma_out", "row_flag", "vre_avg", "vim_avg", "ws_sum", "chan_flag")
    },

    // -- A10 under the gate: the REAL natural-cubic-spline fit/eval
    //    (operators/Deconv.fitCubicSpline/evalSpline —
    //    averaging/splines.py:14-130) run per nation on 6 uniform knots
    //    whose y-values are exact integer cent sums. With h = 1 every
    //    Thomas-algorithm step is a single IEEE op (+,−,×,/) on
    //    bit-identical operands, so the oracle can state the SAME op
    //    sequence (unrolled n=6 forward elimination + back substitution)
    //    and hash-match with no rounding — CLAUDE.md class (a). The
    //    trailing + 0.0 / + 0e0 normalizes a possible −0.0 second
    //    derivative identically on both sides. DeterminismSpec pins the
    //    2^53 sum-exactness precondition.
    Q("a17_cubic_spline", {
      val ys = (0 to 5).map { b =>
        s"""CAST(COALESCE(SUM(CASE WHEN c_custkey % 6 = $b
           |  THEN CAST(ROUND(c_acctbal * 100) AS BIGINT) END), 0) AS DOUBLE) AS y$b""".stripMargin
      }.mkString(",\n    ")
      // eval at dyadic xv with t = u = 0.5: mirrors evalSpline's
      // t*y(j) + u*y(j+1) + ((t³−t)·m(j) + (u³−u)·m(j+1))·h·h/6
      def ev(yj: String, yj1: String, mj: String, mj1: String) =
        s"(5e-1*$yj + 5e-1*$yj1 + ((5e-1*5e-1*5e-1 - 5e-1)*$mj + " +
          s"(5e-1*5e-1*5e-1 - 5e-1)*$mj1) * 1e0 * 1e0 / 6e0) + 0e0"
      s"""WITH y AS (
         |  SELECT CAST(c_nationkey AS BIGINT) AS k,
         |    $ys
         |  FROM customer GROUP BY 1),
         |d AS (
         |  SELECT *,
         |    (y2 - y1)/1e0 - (y1 - y0)/1e0 AS d1,
         |    (y3 - y2)/1e0 - (y2 - y1)/1e0 AS d2,
         |    (y4 - y3)/1e0 - (y3 - y2)/1e0 AS d3,
         |    (y5 - y4)/1e0 - (y4 - y3)/1e0 AS d4
         |  FROM y),
         |f1 AS (SELECT *, 2e0/3e0 - ((1e0/6e0)/(2e0/3e0))*(1e0/6e0) AS b2,
         |              d2 - ((1e0/6e0)/(2e0/3e0))*d1 AS e2 FROM d),
         |f2 AS (SELECT *, 2e0/3e0 - ((1e0/6e0)/b2)*(1e0/6e0) AS b3,
         |              d3 - ((1e0/6e0)/b2)*e2 AS e3 FROM f1),
         |f3 AS (SELECT *, 2e0/3e0 - ((1e0/6e0)/b3)*(1e0/6e0) AS b4,
         |              d4 - ((1e0/6e0)/b3)*e3 AS e4 FROM f2),
         |s4 AS (SELECT *, e4/b4 AS m4 FROM f3),
         |s3 AS (SELECT *, (e3 - (1e0/6e0)*m4)/b3 AS m3 FROM s4),
         |s2 AS (SELECT *, (e2 - (1e0/6e0)*m3)/b2 AS m2 FROM s3),
         |s1 AS (SELECT *, (d1 - (1e0/6e0)*m2)/(2e0/3e0) AS m1 FROM s2)
         |SELECT k, m1 + 0e0 AS m1, m2 + 0e0 AS m2,
         |  m3 + 0e0 AS m3, m4 + 0e0 AS m4,
         |  ${ev("y0", "y1", "0e0", "m1")} AS v05,
         |  ${ev("y2", "y3", "m2", "m3")} AS v25,
         |  ${ev("y4", "y5", "m4", "0e0")} AS v45
         |FROM s1""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val knotAggs = (0 to 5).map { b =>
        coalesce(sum(when(col("c_custkey") % 6 === b,
          Det.cents(col("c_acctbal")))), lit(0L)).cast("double").as(s"y$b")
      }
      Tables.customer(s, dir)
        .groupBy(col("c_nationkey").cast("long").as("k"))
        .agg(knotAggs.head, knotAggs.tail: _*)
        .as[(Long, Double, Double, Double, Double, Double, Double)]
        .map { case (k, y0, y1, y2, y3, y4, y5) =>
          val xk = Array(0.0, 1.0, 2.0, 3.0, 4.0, 5.0)
          val yk = Array(y0, y1, y2, y3, y4, y5)
          val m = Deconv.fitCubicSpline(xk, yk)
          val v = Deconv.evalSpline(xk, yk, m, Array(0.5, 2.5, 4.5))
          (k, m(1) + 0.0, m(2) + 0.0, m(3) + 0.0, m(4) + 0.0,
            v(0) + 0.0, v(1) + 0.0, v(2) + 0.0)
        }
        .toDF("k", "m1", "m2", "m3", "m4", "v05", "v25", "v45")
    })
}
