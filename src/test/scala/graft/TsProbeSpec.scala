package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Measures (and PRINTS) the data margins that make s02's hash robust to
  * the driver DuckDB's ns-parquet read semantics (truncate / round /
  * keep-ns — see EventsQ header):
  *
  *  1. second-boundary margin: a ±1 µs read perturbation flips a
  *     seconds-truncated timestamp only if an event sits < 1 µs below a
  *     second boundary. Asserted > 1 µs at every available SF.
  *  2. 30-min gap margin: a ±1 µs perturbation flips a session split only
  *     if some per-user µs gap sits within 1 µs of exactly 30 min.
  *     Asserted > 1 ms at every available SF.
  */
class TsProbeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1").filter(d => new java.io.File(d + "/events.parquet").exists)

  test("events loader yields the ns-long ts contract on every layout") {
    // the generator has shipped both TIMESTAMP(NANOS) (read as a raw long
    // under nanosAsLong) and TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ);
    // Tables.events must normalize either to ns-since-epoch LONG, in
    // 2024-range, µs-aligned when the source is µs — every `ts div 1000`
    // consumer depends on this
    for (dir <- sfs) {
      val ev = core.Tables.events(spark, dir)
      assert(ev.schema("ts").dataType ===
        org.apache.spark.sql.types.LongType,
        s"$dir: events.ts must read as ns-long")
      val r = ev.agg(min(col("ts")), max(col("ts"))).head()
      val y2024 = 1704067200000000000L // 2024-01-01 UTC in ns
      assert(r.getLong(0) >= y2024 && r.getLong(1) < y2024 + 400L * 86400e9.toLong,
        s"$dir: ts range [${r.getLong(0)}, ${r.getLong(1)}] outside 2024")
    }
  }

  test("events sit well clear of second boundaries (s02 t_start/t_end safety)") {
    for (dir <- sfs) {
      val ns = core.Tables.events(spark, dir).select(col("ts"))
      val row = ns.agg(
        max(expr("ts % 1000000000")).as("max_subsec"),
        count(lit(1)).as("n")).head()
      val maxSub = row.getLong(0)
      val marginNs = 1000000000L - maxSub
      info(s"$dir: n=${row.getLong(1)} max sub-second offset = $maxSub ns " +
        s"(margin to boundary = $marginNs ns; danger < 1000 ns)")
      assert(marginNs > 1000L,
        s"$dir: an event sits $marginNs ns below a second boundary — " +
          "seconds-truncated t_start/t_end would be read-semantics sensitive")
    }
  }

  test("s05 RANGE frame is read-semantics safe: no near-ties, no pair near 1h") {
    // a ±1 µs read perturbation changes a trailing-hour RANGE frame only
    // if (a) two same-user events sit within 1 µs of each other (peer
    // membership flips) or (b) some same-user PAIR's gap sits within 2 µs
    // of exactly 3 600 000 000 µs (frame-edge membership flips)
    val hourUs = 3600000000L
    for (dir <- sfs) {
      val ev = core.Tables.events(spark, dir)
        .select(col("user_id"), expr("ts div 1000").as("tus"))
      val pairs = ev.as("a").join(ev.as("b"),
          col("a.user_id") === col("b.user_id")
            && col("a.tus") < col("b.tus"))
        .select((col("b.tus") - col("a.tus")).as("gap"))
      val row = pairs.agg(
        min(col("gap")).as("min_gap"),
        min(abs(col("gap") - hourUs)).as("min_hour_dist")).head()
      info(s"$dir: min same-user gap = ${row.getLong(0)} µs (danger < 1); " +
        s"min |pair gap − 1 h| = ${row.getLong(1)} µs (danger < 2)")
      assert(row.getLong(0) > 1L, s"$dir: near-tie events break s05 peers")
      assert(row.getLong(1) > 2L, s"$dir: a pair gap hugs the 1-hour frame edge")
    }
  }

  test("s09 session spans match an independent window recomputation") {
    // s09 is rows-checked only by the driver (no oracle — timestamp-valued
    // hashes are unfalsifiable against the driver DuckDB's ns-read
    // semantics, see EventsQ header). This pins its VALUES locally: the
    // mapPartitions sessionizer vs the declarative lag/sum-window
    // formulation the s02 oracle uses.
    import org.apache.spark.sql.expressions.Window
    for (dir <- sfs) {
      val got = queries.EventsQ.qs.find(_.name == "s09_session_spans").get
        .fn(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val ev = core.Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("tus"))
      val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
      val expected = ev
        .withColumn("new_s",
          when(col("tus") - lag("tus", 1).over(w) > 1800000000L, 1).otherwise(0))
        .withColumn("session_id", sum("new_s").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(expr("min(tus) div 1000000").as("t_start_s"),
          expr("max(tus) div 1000000").as("t_end_s"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      assert(got === expected, s"$dir: s09 spans diverge from window recomputation")
      info(s"$dir: ${got.size} sessions, spans identical")
    }
  }

  test("no per-user gap sits near a session-split boundary (30 min, 4 h)") {
    // 30 min guards s02/s09; 4 h guards the s24 path sessions — any µs
    // comparison threshold on a driver-read-perturbable gap needs a
    // measured margin (project invariant)
    val thresholds = Seq("30min" -> 1800000000L, "4h" -> 14400000000L)
    for (dir <- sfs; (label, gapUs) <- thresholds) {
      val ev = core.Tables.events(spark, dir)
        .select(col("user_id"), expr("ts div 1000").as("tus"), col("event_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("tus", "event_id")
      val minDist = ev
        .withColumn("gap", col("tus") - lag("tus", 1).over(w))
        .filter(col("gap").isNotNull)
        .agg(min(abs(col("gap") - gapUs)).as("d")).head().getLong(0)
      info(s"$dir: min |gap - $label| = $minDist µs (danger < 2 µs)")
      assert(minDist > 2000L,
        s"$dir: a session gap sits $minDist µs from the $label boundary")
    }
  }
}
