package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
      // separately by the radec_to_lmn query. The /1024 (dyadic) keeps
      // |2π/c · (u·l + v·m + w(n−1)) · freq| ≲ 1 rad so the hash-compared
      // cos/sin evaluate at SMALL arguments, where JVM and DuckDB libm
      // agree to ≤1 ulp — large arguments go through env-sensitive range
      // reduction and flipped a round(x·1e6) boundary on the driver.
      ((lit(-2e-2) + k * 1e-2) / 1024e0).as("l"),
      ((lit(1e-2) - (k % 3) * 5e-3) / 1024e0).as("m"))
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
       |  (-2e-2 + n_nationkey * 1e-2) / 1024e0 AS l,
       |  (1e-2 - (n_nationkey % 3) * 5e-3) / 1024e0 AS m
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

  /** Direction-independent complex gains per (time_index, ant).
    *
    * Values are dyadic rationals (small ints / 8) so every complex product
    * downstream is exact in IEEE double and order-independent — the
    * predict/corrupt/residual oracles hash-match bit-for-bit with no
    * rounding. Mirrors the per-(time, ant) Jones gathers of
    * africanus/rime/predict.py:199-224.
    */
  def gains(s: SparkSession, dir: String,
            nTime: Int = 16, nAnt: Int = 7): DataFrame = {
    val t = col("time_index")
    val a = col("ant")
    paTable(s, dir, nTime, nAnt).select(
      t, a,
      (lit(15e-1) + ((t * 7 + a * 5) % 9 - 4) / 8e0).as("g_re"),
      (((t * 3 + a * 11) % 7 - 3) / 8e0).as("g_im"))
  }

  def gainsSql(nTime: Int = 16, nAnt: Int = 7): String =
    s"""SELECT CAST(t.n_nationkey AS BIGINT) AS time_index,
       |  CAST(a.n_nationkey AS BIGINT) AS ant,
       |  15e-1 + ((t.n_nationkey * 7 + a.n_nationkey * 5) % 9 - 4) / 8e0 AS g_re,
       |  ((t.n_nationkey * 3 + a.n_nationkey * 11) % 7 - 3) / 8e0 AS g_im
       |FROM nation t, nation a
       |WHERE t.n_nationkey < $nTime AND a.n_nationkey < $nAnt""".stripMargin

  /** Per-(source, row, chan) model coherencies, dyadic (ints / 16): the
    * "X_pqs" input of predict_vis / corrupt_vis. Computed as expressions on
    * an existing (src x row x chan) frame — also emitted as SQL snippets so
    * the oracle builds bit-identical inputs. */
  def cohRe(src: Column, row: Column, chan: Column): Column =
    ((src * 5 + row * 3 + chan) % 17 - 8) / 16e0
  def cohIm(src: Column, row: Column, chan: Column): Column =
    ((src * 7 + row * 11 + chan * 3) % 13 - 6) / 16e0
  val cohReSql = "((src_id * 5 + row_id * 3 + chan) % 17 - 8) / 16e0"
  val cohImSql = "((src_id * 7 + row_id * 11 + chan * 3) % 13 - 6) / 16e0"

  /** Dyadic per-(row, chan) base visibilities (the "B_pq" / dirty-vis input). */
  def baseRe(row: Column, chan: Column): Column =
    ((row * 13 + chan * 5) % 19 - 9) / 16e0
  def baseIm(row: Column, chan: Column): Column =
    ((row * 17 + chan * 7) % 11 - 5) / 16e0
  val baseReSql = "((row_id * 13 + chan * 5) % 19 - 9) / 16e0"
  val baseImSql = "((row_id * 17 + chan * 7) % 11 - 5) / 16e0"

  // -- Shared oracle-SQL snippets over the synthetic column names.
  // Keep these textually in sync with the Scala expressions in
  // graft.functions (Phase.realPhase, Spectral.wsclean*): the driver's
  // DuckDB run must evaluate the same IEEE expression tree.
  val phaseSql =
    "(-2 * pi() / 299792458e0) * (u*l + v*m + w*(sqrt(greatest(0e0, 1e0 - l*l - m*m)) - 1e0)) * freq"
  val phaseCasaSql =
    "(2 * pi() / 299792458e0) * (u*l + v*m + w*(sqrt(greatest(0e0, 1e0 - l*l - m*m)) - 1e0)) * freq"
  val specLogSql =
    "flux * exp(spi0 * ln(freq/ref_freq) + spi1 * (ln(freq/ref_freq)*ln(freq/ref_freq)))"
  val specOrdSql =
    "flux + spi0 * (freq/ref_freq - 1e0) + spi1 * ((freq/ref_freq - 1e0)*(freq/ref_freq - 1e0))"
}
