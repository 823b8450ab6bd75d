package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables

/** Array-native Measurement-Set data model — SURVEY §1.5.
  *
  * A real MS row carries multi-dim columns: `vis (chan, corr)`,
  * `weight_spectrum (chan, corr)`, `flag (chan, corr)` plus row-level
  * `weight`. The reference's averaging surface is defined over those arrays
  * (africanus/averaging/time_and_channel_avg.py:413-785); this module is
  * the Spark-native equivalent: `ArrayType` columns processed with
  * higher-order functions (transform/filter/aggregate/zip_with), never a
  * driver-side loop, and exploded ONLY where a genuine regrouping shuffle
  * is required.
  *
  * Weight hierarchy (time_and_channel_avg.py:413-676): per-element
  * WEIGHT_SPECTRUM if present ▸ row WEIGHT ▸ natural (1.0), expressed as a
  * single element-level coalesce.
  *
  * Determinism: vis are dyadic /16, weights dyadic /8 — every weighted sum
  * is exact in IEEE double and order-free; the closing division is one IEEE
  * op. No rounding layer needed (CLAUDE.md float rules).
  */
object ArrayMsQ {

  val NChan = 8

  /** Synthetic array-MS: one row per (kept) order key with array columns
    * vis/wspec/flag of length NChan, plus nullable row weight. Mirrored
    * flattened by [[msFlatSql]] for the DuckDB oracle. */
  def msArray(s: SparkSession, dir: String, every: Int = 8): DataFrame = {
    val k = col("o_orderkey")
    Tables.orders(s, dir).filter(k % every === 0)
      .select(
        k.as("row_id"),
        ((k / 16) % 16).cast("long").as("time_index"),
        (k % 7).as("ant1"),
        ((k * 3) % 7).as("ant2"),
        when(k % 24 === 0, lit(null).cast("double"))
          .otherwise((lit(1) + k % 5) / 4e0).as("w_row"))
      .withColumn("vis", expr(
        s"""transform(sequence(0, ${NChan - 1}), c -> named_struct(
           |  're', ((row_id*5 + c*3) % 17 - 8)/16e0,
           |  'im', ((row_id*7 + c*5) % 13 - 6)/16e0))""".stripMargin))
      .withColumn("wspec", expr(
        s"""transform(sequence(0, ${NChan - 1}), c ->
           |  CASE WHEN ((row_id div 8) + c) % 7 = 0 THEN CAST(NULL AS DOUBLE)
           |       ELSE ((row_id*3 + c*5) % 9 + 1)/8e0 END)""".stripMargin))
      // flag rule mixes a per-bin and a per-channel term so that some
      // 2-channel output bins are ENTIRELY flagged (~1/7 of them) — the
      // all-flagged consensus branch must actually execute.
      .withColumn("flag", expr(
        s"""transform(sequence(0, ${NChan - 1}), c ->
           |  (row_id*5 + (c div 2)*3 + c) % 7 < 2)""".stripMargin))
  }

  /** The same MS, flattened to one row per (row, chan) — the oracle's view
    * of the array columns (DuckDB builds no arrays; values must be
    * bit-identical to the Spark `transform` lambdas above). */
  def msFlatSql(every: Int = 8): String =
    s"""SELECT o_orderkey AS row_id,
       |  CAST((o_orderkey // 16) % 16 AS BIGINT) AS time_index,
       |  o_orderkey % 7 AS ant1, (o_orderkey * 3) % 7 AS ant2,
       |  CASE WHEN o_orderkey % 24 = 0 THEN NULL
       |       ELSE (1 + o_orderkey % 5) / 4e0 END AS w_row,
       |  unnest(generate_series(1, $NChan)) - 1 AS chan
       |FROM orders WHERE o_orderkey % $every = 0""".stripMargin

  private val valSql = Seq(
    "((row_id*5 + chan*3) % 17 - 8)/16e0 AS vre",
    "((row_id*7 + chan*5) % 13 - 6)/16e0 AS vim",
    """CASE WHEN ((row_id//8) + chan) % 7 = 0 THEN NULL
      |     ELSE ((row_id*3 + chan*5) % 9 + 1)/8e0 END AS wsp""".stripMargin,
    "(row_id*5 + (chan//2)*3 + chan) % 7 < 2 AS flg").mkString(",\n  ")

  /** Oracle CTE: flattened MS with values + effective weight attached. */
  private def msCte(every: Int = 8): String =
    s"""msf AS (SELECT *, $valSql FROM (${msFlatSql(every)})),
       |ms AS (SELECT *, COALESCE(wsp, w_row, 1e0) AS w FROM msf)""".stripMargin

  val qs: Seq[Q] = Seq(

    // -- A6 over arrays, in-row channel binning: array-in / array-out with
    //    zero shuffle. Each output bin averages its unflagged samples with
    //    the effective weight; an all-flagged bin falls back to averaging
    //    the flagged samples and keeps the flag raised — the reference's
    //    flagged/unflagged consensus (time_and_channel_avg.py:519-586).
    Q("a11_array_chan_avg",
      s"""WITH ${msCte()},
         |b AS (
         |  SELECT row_id, chan // 2 AS out_chan, flg, w, vre, vim,
         |    SUM(CASE WHEN flg THEN 0 ELSE 1 END)
         |      OVER (PARTITION BY row_id, chan // 2) AS n_ok
         |  FROM ms)
         |SELECT row_id, out_chan,
         |  CAST(SUM(CASE WHEN flg = (n_ok = 0) THEN 1 ELSE 0 END) AS BIGINT) AS n_used,
         |  (n_ok = 0) AS oflag,
         |  SUM(CASE WHEN flg = (n_ok = 0) THEN w ELSE 0e0 END) AS wsum,
         |  SUM(CASE WHEN flg = (n_ok = 0) THEN w * vre ELSE 0e0 END)
         |    / SUM(CASE WHEN flg = (n_ok = 0) THEN w ELSE 0e0 END) AS ore,
         |  SUM(CASE WHEN flg = (n_ok = 0) THEN w * vim ELSE 0e0 END)
         |    / SUM(CASE WHEN flg = (n_ok = 0) THEN w ELSE 0e0 END) AS oim
         |FROM b GROUP BY row_id, out_chan, n_ok = 0""".stripMargin) { (s, dir) =>
      // ONE array walk per row through the CODEGEN'D chan_bin_avg
      // expression (expr/GraftExpressions.scala ChanBinAvg) — the same
      // two-tier consensus fold the earlier aggregate() lambda computed
      // (ChanBinAvgSpec pins them bit-for-bit), minus its interpretation
      // overhead, which at the 10× replica was ~3 s of lambda eval on
      // this zero-shuffle projection. Dyadic inputs keep every partial
      // sum exact, so the oracle is unchanged.
      graft.expr.GraftFunctions.register(s)
      msArray(s, dir)
        .select(col("row_id"), posexplode(call_function("chan_bin_avg",
          col("vis"), col("wspec"), col("flag"), col("w_row"), lit(2))))
        .select(col("row_id"), col("pos").cast("long").as("out_chan"),
          col("col.n_used").as("n_used"), col("col.oflag").as("oflag"),
          col("col.wsum").as("wsum"), col("col.ore").as("ore"),
          col("col.oim").as("oim"))
    },

    // -- A7 over arrays, row+channel averaging: the one genuine shuffle.
    //    Rows bucket by (baseline, time bin); arrays are POSEXPLODED into
    //    the exchange (shuffle volume = data volume — same bytes an
    //    array-payload shuffle would move, but hash-agg codegen applies),
    //    merged with the same flag consensus, and the channel axis is
    //    rebinned 2:1 in the same aggregation.
    Q("a12_array_row_chan_avg",
      s"""WITH ${msCte()},
         |b AS (
         |  SELECT ant1, ant2, time_index // 4 AS tbin, chan // 2 AS out_chan,
         |    flg, w, vre, vim,
         |    SUM(CASE WHEN flg THEN 0 ELSE 1 END)
         |      OVER (PARTITION BY ant1, ant2, time_index // 4, chan // 2) AS n_ok
         |  FROM ms)
         |SELECT ant1, ant2, tbin, out_chan,
         |  CAST(SUM(CASE WHEN flg = (n_ok = 0) THEN 1 ELSE 0 END) AS BIGINT) AS n_used,
         |  (n_ok = 0) AS oflag,
         |  SUM(CASE WHEN flg = (n_ok = 0) THEN w * vre ELSE 0e0 END)
         |    / SUM(CASE WHEN flg = (n_ok = 0) THEN w ELSE 0e0 END) AS ore,
         |  SUM(CASE WHEN flg = (n_ok = 0) THEN w * vim ELSE 0e0 END)
         |    / SUM(CASE WHEN flg = (n_ok = 0) THEN w ELSE 0e0 END) AS oim
         |FROM b
         |GROUP BY ant1, ant2, tbin, out_chan, n_ok = 0""".stripMargin) { (s, dir) =>
      val ms = msArray(s, dir)
      val flat = ms.select(col("ant1"), col("ant2"),
          expr("time_index div 4").as("tbin"), col("w_row"),
          posexplode(arrays_zip(col("vis"), col("wspec"), col("flag"))))
        .select(col("ant1"), col("ant2"), col("tbin"),
          expr("CAST(pos div 2 AS BIGINT)").as("out_chan"),
          col("col.flag").as("flg"),
          coalesce(col("col.wspec"), col("w_row"), lit(1e0)).as("w"),
          col("col.vis.re").as("vre"), col("col.vis.im").as("vim"))
      val grouped = flat.groupBy("ant1", "ant2", "tbin", "out_chan")
        .agg(
          sum(when(!col("flg"), 1).otherwise(0)).as("n_ok"),
          sum(when(!col("flg"), col("w"))).as("w_u"),
          sum(when(!col("flg"), col("w") * col("vre"))).as("re_u"),
          sum(when(!col("flg"), col("w") * col("vim"))).as("im_u"),
          count(lit(1)).as("n_all"),
          sum(when(col("flg"), col("w"))).as("w_f"),
          sum(when(col("flg"), col("w") * col("vre"))).as("re_f"),
          sum(when(col("flg"), col("w") * col("vim"))).as("im_f"))
      val ok = col("n_ok") > 0
      grouped.select(col("ant1"), col("ant2"), col("tbin"), col("out_chan"),
        when(ok, col("n_ok")).otherwise(col("n_all")).as("n_used"),
        (!ok).as("oflag"),
        (when(ok, col("re_u")).otherwise(col("re_f"))
          / when(ok, col("w_u")).otherwise(col("w_f"))).as("ore"),
        (when(ok, col("im_u")).otherwise(col("im_f"))
          / when(ok, col("w_u")).otherwise(col("w_f"))).as("oim"))
    },

    // -- A7 at FULL 2×2 correlation with a TUPLE of vis columns: the
    //    reference's Jones-shaped (corr, corr) visibilities ride
    //    time_and_channel through the tuple-of-vis intrinsics
    //    (average_visibilities/normalise_visibilities,
    //    time_and_channel_avg.py:277-412) — each tuple member (here DATA
    //    and MODEL_DATA) accumulates with the SAME weight and the flag
    //    consensus applies per (chan, corr) element. Spark shape: the
    //    (chan, corr=2×2 flattened) nested arrays are exploded into the
    //    ONE (baseline, tbin) shuffle and every output statistic comes out
    //    of a single partial+final aggregation — corr adds an axis, not a
    //    pass. The ant1-keyed flag term makes whole merged
    //    (bl, tbin, out_chan, corr) bins all-flagged, so the consensus
    //    fallback branch executes across rows. (The nested-array fixture
    //    build is two reviewed interpreted transform() nodes — 16 lambda
    //    evals per fixture row; an unrolled 4×4 literal was measured to
    //    blow a 19 KB generated method past the JIT threshold, which is
    //    strictly worse.)
    Q("a18_array_full_corr",
      s"""WITH ms0 AS (
         |  SELECT o_orderkey AS row_id,
         |    CAST((o_orderkey // 16) % 16 AS BIGINT) AS time_index,
         |    o_orderkey % 7 AS ant1, (o_orderkey * 3) % 7 AS ant2,
         |    CASE WHEN o_orderkey % 24 = 0 THEN NULL
         |         ELSE (1 + o_orderkey % 5) / 4e0 END AS w_row
         |  FROM orders WHERE o_orderkey % 8 = 0),
         |chs AS (SELECT unnest(generate_series(0, 3)) AS chan),
         |cor AS (SELECT unnest(generate_series(0, 3)) AS corr),
         |msf AS (
         |  SELECT *,
         |    ((row_id*5 + chan*3 + corr*7) % 17 - 8)/16e0 AS vre,
         |    ((row_id*7 + chan*5 + corr*3) % 13 - 6)/16e0 AS vim,
         |    ((row_id*11 + chan*7 + corr*5) % 19 - 9)/16e0 AS v2re,
         |    ((row_id*13 + chan*3 + corr*11) % 15 - 7)/16e0 AS v2im,
         |    CASE WHEN ((row_id//8) + chan + corr) % 7 = 0 THEN NULL
         |         ELSE ((row_id*3 + chan*5 + corr) % 9 + 1)/8e0 END AS wsp,
         |    ((ant1*5 + (chan//2)*3 + chan + corr*2) % 7 < 2)
         |      OR ((row_id + chan + corr) % 31 = 0) AS flg
         |  FROM ms0, chs, cor),
         |ms AS (SELECT *, COALESCE(wsp, w_row, 1e0) AS w FROM msf),
         |b AS (
         |  SELECT ant1, ant2, time_index // 4 AS tbin, chan // 2 AS out_chan,
         |    corr, flg, w, vre, vim, v2re, v2im,
         |    SUM(CASE WHEN flg THEN 0 ELSE 1 END)
         |      OVER (PARTITION BY ant1, ant2, time_index // 4, chan // 2, corr)
         |      AS n_ok
         |  FROM ms)
         |SELECT ant1, ant2, tbin, out_chan, corr,
         |  CAST(SUM(CASE WHEN flg = (n_ok = 0) THEN 1 ELSE 0 END) AS BIGINT) AS n_used,
         |  (n_ok = 0) AS oflag,
         |  SUM(CASE WHEN flg = (n_ok = 0) THEN w ELSE 0e0 END) AS wsum,
         |  SUM(CASE WHEN flg = (n_ok = 0) THEN w * vre ELSE 0e0 END)
         |    / SUM(CASE WHEN flg = (n_ok = 0) THEN w ELSE 0e0 END) AS ore,
         |  SUM(CASE WHEN flg = (n_ok = 0) THEN w * vim ELSE 0e0 END)
         |    / SUM(CASE WHEN flg = (n_ok = 0) THEN w ELSE 0e0 END) AS oim,
         |  SUM(CASE WHEN flg = (n_ok = 0) THEN w * v2re ELSE 0e0 END)
         |    / SUM(CASE WHEN flg = (n_ok = 0) THEN w ELSE 0e0 END) AS o2re,
         |  SUM(CASE WHEN flg = (n_ok = 0) THEN w * v2im ELSE 0e0 END)
         |    / SUM(CASE WHEN flg = (n_ok = 0) THEN w ELSE 0e0 END) AS o2im
         |FROM b
         |GROUP BY ant1, ant2, tbin, out_chan, corr, n_ok = 0""".stripMargin) { (s, dir) =>
      val k = col("o_orderkey")
      val ms = Tables.orders(s, dir).filter(k % 8 === 0)
        .select(
          k.as("row_id"),
          ((k / 16) % 16).cast("long").as("time_index"),
          (k % 7).as("ant1"),
          ((k * 3) % 7).as("ant2"),
          when(k % 24 === 0, lit(null).cast("double"))
            .otherwise((lit(1) + k % 5) / 4e0).as("w_row"))
        .withColumn("vis", expr(
          """transform(sequence(0, 3), c -> transform(sequence(0, 3), k ->
            |  named_struct(
            |    're', ((row_id*5 + c*3 + k*7) % 17 - 8)/16e0,
            |    'im', ((row_id*7 + c*5 + k*3) % 13 - 6)/16e0)))""".stripMargin))
        .withColumn("vis2", expr(
          """transform(sequence(0, 3), c -> transform(sequence(0, 3), k ->
            |  named_struct(
            |    're', ((row_id*11 + c*7 + k*5) % 19 - 9)/16e0,
            |    'im', ((row_id*13 + c*3 + k*11) % 15 - 7)/16e0)))""".stripMargin))
        .withColumn("wspec", expr(
          """transform(sequence(0, 3), c -> transform(sequence(0, 3), k ->
            |  CASE WHEN ((row_id div 8) + c + k) % 7 = 0 THEN CAST(NULL AS DOUBLE)
            |       ELSE ((row_id*3 + c*5 + k) % 9 + 1)/8e0 END))""".stripMargin))
        .withColumn("flag", expr(
          """transform(sequence(0, 3), c -> transform(sequence(0, 3), k ->
            |  ((ant1*5 + (c div 2)*3 + c + k*2) % 7 < 2)
            |    OR ((row_id + c + k) % 31 = 0)))""".stripMargin))
      val byChan = ms.select(col("ant1"), col("ant2"),
          expr("time_index div 4").as("tbin"), col("w_row"),
          posexplode(arrays_zip(col("vis"), col("vis2"),
            col("wspec"), col("flag"))))
        .select(col("ant1"), col("ant2"), col("tbin"), col("w_row"),
          expr("CAST(pos div 2 AS BIGINT)").as("out_chan"),
          col("col.vis").as("vc"), col("col.vis2").as("v2c"),
          col("col.wspec").as("wc"), col("col.flag").as("fc"))
      val flat = byChan.select(col("ant1"), col("ant2"), col("tbin"),
          col("out_chan"), col("w_row"),
          posexplode(arrays_zip(col("vc"), col("v2c"), col("wc"), col("fc"))))
        .select(col("ant1"), col("ant2"), col("tbin"), col("out_chan"),
          col("pos").cast("long").as("corr"),
          col("col.fc").as("flg"),
          coalesce(col("col.wc"), col("w_row"), lit(1e0)).as("w"),
          col("col.vc.re").as("vre"), col("col.vc.im").as("vim"),
          col("col.v2c.re").as("v2re"), col("col.v2c.im").as("v2im"))
      val grouped = flat.groupBy("ant1", "ant2", "tbin", "out_chan", "corr")
        .agg(
          sum(when(!col("flg"), 1).otherwise(0)).as("n_ok"),
          count(lit(1)).as("n_all"),
          sum(when(!col("flg"), col("w"))).as("w_u"),
          sum(when(col("flg"), col("w"))).as("w_f"),
          sum(when(!col("flg"), col("w") * col("vre"))).as("re_u"),
          sum(when(col("flg"), col("w") * col("vre"))).as("re_f"),
          sum(when(!col("flg"), col("w") * col("vim"))).as("im_u"),
          sum(when(col("flg"), col("w") * col("vim"))).as("im_f"),
          sum(when(!col("flg"), col("w") * col("v2re"))).as("re2_u"),
          sum(when(col("flg"), col("w") * col("v2re"))).as("re2_f"),
          sum(when(!col("flg"), col("w") * col("v2im"))).as("im2_u"),
          sum(when(col("flg"), col("w") * col("v2im"))).as("im2_f"))
      val ok = col("n_ok") > 0
      def pick(u: String, f: String) =
        when(ok, col(u)).otherwise(col(f))
      grouped.select(col("ant1"), col("ant2"), col("tbin"), col("out_chan"),
        col("corr"),
        when(ok, col("n_ok")).otherwise(col("n_all")).as("n_used"),
        (!ok).as("oflag"),
        pick("w_u", "w_f").as("wsum"),
        (pick("re_u", "re_f") / pick("w_u", "w_f")).as("ore"),
        (pick("im_u", "im_f") / pick("w_u", "w_f")).as("oim"),
        (pick("re2_u", "re2_f") / pick("w_u", "w_f")).as("o2re"),
        (pick("im2_u", "im2_f") / pick("w_u", "w_f")).as("o2im"))
    },

    // -- The weight-fallback hierarchy itself, verified mode by mode: the
    //    same array averaged under spectrum▸row▸natural, row▸natural, and
    //    natural weighting (flags ignored — isolates the weight semantics).
    Q("a13_weight_fallback",
      s"""WITH ${msCte()}
         |SELECT row_id,
         |  SUM(w * vre) / SUM(w) AS re_spectrum,
         |  SUM(COALESCE(w_row, 1e0) * vre) / SUM(COALESCE(w_row, 1e0)) AS re_row,
         |  SUM(vre) / $NChan AS re_natural
         |FROM ms GROUP BY row_id""".stripMargin) { (s, dir) =>
      msArray(s, dir).select(
        col("row_id"),
        expr(s"""aggregate(sequence(0, ${NChan - 1}), 0e0,
             |  (a, c) -> a + coalesce(wspec[c], w_row, 1e0) * vis[c].re)
             |/ aggregate(sequence(0, ${NChan - 1}), 0e0,
             |  (a, c) -> a + coalesce(wspec[c], w_row, 1e0))""".stripMargin)
          .as("re_spectrum"),
        expr(s"""aggregate(vis, 0e0, (a, x) -> a + coalesce(w_row, 1e0) * x.re)
             |/ (coalesce(w_row, 1e0) * $NChan)""".stripMargin).as("re_row"),
        expr(s"aggregate(vis, 0e0, (a, x) -> a + x.re) / ${NChan}e0")
          .as("re_natural"))
    })
}
