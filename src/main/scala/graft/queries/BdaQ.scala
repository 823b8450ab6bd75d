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
      |    CAST((seq % 64) // 4 AS BIGINT) AS bin,
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
    Bda.mapper(bdaRows(s, dir), MaxUvw, Tol, 4.0, 4, FracBw)

  val qs: Seq[Q] = Seq(

    // -- A8: bda_mapper — greedy baseline-dependent binning + channel
    //    factor snapping.
    Q("a08_bda_mapper",
      s"""WITH $bdaCte
         |SELECT row_id, ant1, ant2, bin, nchan_out FROM bda""".stripMargin) {
      (s, dir) => mapped(s, dir)
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
      val av = bdaRows(s, dir)
      val m = mapped(s, dir).select("row_id", "bin", "nchan_out")
      val ch = broadcast(Tables.nation(s, dir).filter(col("n_nationkey") < 4)
        .select(col("n_nationkey").cast("long").as("chan")))
      av.join(m, "row_id")
        .crossJoin(ch)
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
    })
}
