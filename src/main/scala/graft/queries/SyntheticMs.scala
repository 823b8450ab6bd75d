package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Deterministic Measurement-Set-shaped views derived from the driver's
  * relational tables, so the radio-astronomy operators are verifiable by
  * the DuckDB oracle over the exact same inputs.
  *
  * Every derivation is integer arithmetic (exact) or single IEEE double
  * expressions mirrored verbatim in the SQL CTE bodies below — Spark and
  * DuckDB produce bit-identical inputs. Double constants are written in
  * e-notation in SQL because DuckDB parses plain decimals as DECIMAL.
  *
  * Layout mirrors the MS main/dim tables of SURVEY §1.1: a source dim
  * table (nation), a uvw row table (orders), and a SPW channel table.
  */
object SyntheticMs {

  /** Source dim table: src_id, ra, dec, flux, spi0, spi1, ref_freq, log_poly. */
  def sources(s: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val k = col("n_nationkey").cast("long")
    Tables.nation(s, dir).filter(col("n_nationkey") < n).select(
      k.as("src_id"),
      (lit(2e-1) + k * 1e-2).as("ra"),
      (lit(-4e-1) + k * 5e-3).as("dec"),
      (lit(1e0) + (k % 5) * 25e-2).as("flux"),
      (lit(-7e-1) + (k % 3) * 1e-1).as("spi0"),
      (lit(-25e-3) + (k % 4) * 25e-3).as("spi1"),
      lit(14e8).as("ref_freq"),
      (k % 2 === 1).as("log_poly"),
      // direct lm (pure arithmetic, bit-identical across engines) for the
      // phase/predict kernels; the trig-derived lmn path is exercised
      // separately by the radec_to_lmn query.
      (lit(-2e-2) + k * 1e-2).as("l"),
      (lit(1e-2) - (k % 3) * 5e-3).as("m"))
  }

  def sourcesSql(n: Int = 5): String =
    s"""SELECT CAST(n_nationkey AS BIGINT) AS src_id,
       |  2e-1 + n_nationkey * 1e-2 AS ra,
       |  -4e-1 + n_nationkey * 5e-3 AS dec,
       |  1e0 + (n_nationkey % 5) * 25e-2 AS flux,
       |  -7e-1 + (n_nationkey % 3) * 1e-1 AS spi0,
       |  -25e-3 + (n_nationkey % 4) * 25e-3 AS spi1,
       |  14e8 AS ref_freq,
       |  (n_nationkey % 2 = 1) AS log_poly,
       |  -2e-2 + n_nationkey * 1e-2 AS l,
       |  1e-2 - (n_nationkey % 3) * 5e-3 AS m
       |FROM nation WHERE n_nationkey < $n""".stripMargin

  /** Phase centre used throughout. */
  val Ra0 = 25e-2
  val Dec0 = -38e-2

  /** UVW/main-table rows keyed by order key; `every` thins rows. */
  def uvwRows(s: SparkSession, dir: String, every: Int = 16): DataFrame = {
    val k = col("o_orderkey")
    Tables.orders(s, dir).filter(k % every === 0).select(
      k.as("row_id"),
      (((k % 2001) - 1000) / 2e0).as("u"),
      ((((k * 3) % 2001) - 1000) / 2e0).as("v"),
      ((((k * 7) % 201) - 100) / 2e1).as("w"),
      (k % 7).as("ant1"),
      ((k * 3) % 7).as("ant2"),
      ((k / 16) % 16).cast("long").as("time_index"))
  }

  def uvwRowsSql(every: Int = 16): String =
    s"""SELECT o_orderkey AS row_id,
       |  ((o_orderkey % 2001) - 1000) / 2e0 AS u,
       |  (((o_orderkey * 3) % 2001) - 1000) / 2e0 AS v,
       |  (((o_orderkey * 7) % 201) - 100) / 2e1 AS w,
       |  o_orderkey % 7 AS ant1,
       |  (o_orderkey * 3) % 7 AS ant2,
       |  CAST((o_orderkey // 16) % 16 AS BIGINT) AS time_index
       |FROM orders WHERE o_orderkey % $every = 0""".stripMargin

  /** SPW channel table: chan, freq (0.856 + 0.107k GHz). */
  def channels(s: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val k = col("n_nationkey").cast("long")
    Tables.nation(s, dir).filter(col("n_nationkey") < n)
      .select(k.as("chan"), (lit(856e6) + k * 107e6).as("freq"))
  }

  def channelsSql(n: Int = 8): String =
    s"""SELECT CAST(n_nationkey AS BIGINT) AS chan,
       |  856e6 + n_nationkey * 107e6 AS freq
       |FROM nation WHERE n_nationkey < $n""".stripMargin

  /** Synthetic full-corr complex visibilities per row (exact small ints). */
  def corrVis(s: SparkSession, dir: String, every: Int = 4): DataFrame = {
    val k = col("o_orderkey")
    Tables.orders(s, dir).filter(k % every === 0).select(
      k.as("row_id"),
      ((k % 19) - 9).cast("double").as("xx_re"),
      (((k * 3) % 17) - 8).cast("double").as("xx_im"),
      (((k * 5) % 23) - 11).cast("double").as("xy_re"),
      (((k * 7) % 13) - 6).cast("double").as("xy_im"),
      (((k * 11) % 19) - 9).cast("double").as("yx_re"),
      (((k * 13) % 17) - 8).cast("double").as("yx_im"),
      (((k * 17) % 23) - 11).cast("double").as("yy_re"),
      (((k * 19) % 13) - 6).cast("double").as("yy_im"))
  }

  def corrVisSql(every: Int = 4): String =
    s"""SELECT o_orderkey AS row_id,
       |  CAST((o_orderkey % 19) - 9 AS DOUBLE) AS xx_re,
       |  CAST(((o_orderkey * 3) % 17) - 8 AS DOUBLE) AS xx_im,
       |  CAST(((o_orderkey * 5) % 23) - 11 AS DOUBLE) AS xy_re,
       |  CAST(((o_orderkey * 7) % 13) - 6 AS DOUBLE) AS xy_im,
       |  CAST(((o_orderkey * 11) % 19) - 9 AS DOUBLE) AS yx_re,
       |  CAST(((o_orderkey * 13) % 17) - 8 AS DOUBLE) AS yx_im,
       |  CAST(((o_orderkey * 17) % 23) - 11 AS DOUBLE) AS yy_re,
       |  CAST(((o_orderkey * 19) % 13) - 6 AS DOUBLE) AS yy_im
       |FROM orders WHERE o_orderkey % $every = 0""".stripMargin

  /** Parallactic-angle table over (time, ant) from nation x nation. */
  def paTable(s: SparkSession, dir: String,
              nTime: Int = 16, nAnt: Int = 7): DataFrame = {
    val t = Tables.nation(s, dir).filter(col("n_nationkey") < nTime)
      .select(col("n_nationkey").cast("long").as("time_index"))
    val a = Tables.nation(s, dir).filter(col("n_nationkey") < nAnt)
      .select(col("n_nationkey").cast("long").as("ant"))
    t.crossJoin(a).withColumn(
      "pa", lit(-15e-1) + col("time_index") * 2e-1 + col("ant") * 3e-2)
  }

  def paTableSql(nTime: Int = 16, nAnt: Int = 7): String =
    s"""SELECT CAST(t.n_nationkey AS BIGINT) AS time_index,
       |  CAST(a.n_nationkey AS BIGINT) AS ant,
       |  -15e-1 + t.n_nationkey * 2e-1 + a.n_nationkey * 3e-2 AS pa
       |FROM nation t, nation a
       |WHERE t.n_nationkey < $nTime AND a.n_nationkey < $nAnt""".stripMargin
}
