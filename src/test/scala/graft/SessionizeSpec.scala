package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sessionize

/** Greedy time-binning semantics on irregular intervals — the general case
  * the closed-form oracle of a02 cannot express
  * (africanus/averaging/time_and_channel_mapping.py:66-358 semantics). */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("greedy bins close when accumulated interval would exceed binSecs") {
    import spark.implicits._
    // (row_id, ant1, ant2, time, interval)
    val rows = Seq(
      (0L, 0L, 1L, 0.0, 3.0), // bin 0: acc 3
      (1L, 0L, 1L, 1.0, 2.0), // 3+2 > 4 -> bin 1: acc 2
      (2L, 0L, 1L, 5.0, 1.0), // bin 1: acc 3
      (3L, 0L, 1L, 6.0, 1.0), // bin 1: acc 4 (== binSecs stays)
      (4L, 0L, 1L, 7.0, 4.0), // 4+4 > 4 -> bin 2
      (5L, 0L, 1L, 7.0, 4.0), // same timestep -> same bin 2
      // independent baseline
      (6L, 2L, 2L, 0.0, 1.0), // bin 0
      (7L, 2L, 2L, 9.0, 1.0)) // acc 1+1 <= 4 -> still bin 0 (no gap rule)
      .toDF("row_id", "ant1", "ant2", "time", "interval")
    val got = Sessionize.timeBins(rows, 4.0)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 2L, 5L -> 2L, 6L -> 0L, 7L -> 0L))
  }

  test("plan is a streaming scan: one exchange, key-prefixed sort, no per-group array") {
    // use a non-trivial input: EliminateSorts removes the sort on a
    // maxRows<=1 relation and would void the assertion
    val rows = spark.range(100).selectExpr("id AS row_id", "id % 3 AS ant1",
      "id % 5 AS ant2", "CAST(id % 7 AS DOUBLE) AS time",
      "1.0 AS interval")
    val plan = Sessionize.timeBins(rows, 4.0)
      .queryExecution.executedPlan.toString
    // constant-memory shape: repartition + sortWithinPartitions +
    // mapPartitions — NOT flatMapGroups (whose per-group materialization
    // grows with observation length)
    assert(plan.contains("MapPartitions"), "expected a mapPartitions scan")
    assert(!plan.contains("FlatMapGroups"), "per-group materialization crept back")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1)
    // the sort is the within-partition key+time sort, nothing else
    assert(plan.contains("Sort [ant1"))
  }

  test("rows arriving out of time order are sorted before binning") {
    import spark.implicits._
    val rows = Seq(
      (10L, 0L, 0L, 3.0, 2.0),
      (11L, 0L, 0L, 0.0, 2.0),
      (12L, 0L, 0L, 1.0, 2.0))
      .toDF("row_id", "ant1", "ant2", "time", "interval")
    // sorted: t0 acc2, t1 acc4, t3 -> 4+2 > 4 -> bin 1
    val got = Sessionize.timeBins(rows, 4.0)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(11L -> 0L, 12L -> 0L, 10L -> 1L))
  }

  test("round 14: greedy payload carry equals thin binner + row_id join " +
      "exactly, and carries every column") {
    import spark.implicits._
    // irregular intervals + duplicate timesteps + a payload column —
    // the general case, not the dense a04 fixture
    val rows = Seq(
      (0L, 0L, 1L, 0.0, 3.0, 10.5), (1L, 0L, 1L, 1.0, 2.0, -1.25),
      (2L, 0L, 1L, 5.0, 1.0, 0.0), (3L, 0L, 1L, 6.0, 1.0, 7.75),
      (4L, 0L, 1L, 7.0, 4.0, 2.5), (5L, 0L, 1L, 7.0, 4.0, 3.0),
      (6L, 2L, 2L, 0.0, 1.0, -9.0), (7L, 2L, 2L, 9.0, 1.0, 4.5))
      .toDF("row_id", "ant1", "ant2", "time", "interval", "payload")
    val thin = Sessionize.timeBins(rows, 4.0).select("row_id", "bin")
    val joined = rows.join(thin, "row_id")
      .select("row_id", "ant1", "ant2", "time", "interval", "payload", "bin")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getLong(6))).toMap
    val carried = Sessionize.timeBinsGreedy(rows, 4.0)
      .select("row_id", "ant1", "ant2", "time", "interval", "payload", "bin")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getLong(6))).toMap
    assert(carried === joined)
  }
}
