package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the properties that matter at 100 TB
  * (pushdown reaching the scan, dimension joins broadcasting, fact-fact
  * joins NOT broadcasting) must not silently degrade. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString

  test("q01: shipdate predicate is pushed to the parquet scan") {
    val p = planOf("q01_pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q03: all four dimension joins broadcast, none sort-merge") {
    val p = planOf("q03_revenue_by_nation")
    assert("BroadcastHashJoin".r.findAllIn(p).size === 4)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q08: the fact-fact join does not broadcast") {
    val p = planOf("q08_customer_ltv")
    assert(p.contains("SortMergeJoin"))
  }

  test("r02: gains gather via broadcast joins; no shuffle of the expansion") {
    val p = planOf("r02_predict_vis")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2)
    assert(!p.contains("SortMergeJoin"))
  }

  test("a11: in-row array channel averaging is a zero-shuffle projection") {
    val p = planOf("a11_array_chan_avg")
    assert(!p.contains("Exchange"), "array-native per-row op must not shuffle")
  }

  test("a12: array row+chan averaging shuffles exactly once (partial+final agg)") {
    val p = planOf("a12_array_row_chan_avg")
    assert("Exchange".r.findAllIn(p).size === 1)
    assert(p.contains("HashAggregate"))
  }

  test("lineitem scans prune to referenced columns") {
    val scans = SparkEntry.queries("q01_pricing_summary")(spark, TestSpark.sf)
      .queryExecution.sparkPlan.collectLeaves()
    assert(scans.nonEmpty)
    val cols = scans.flatMap(_.output.map(_.name)).toSet
    assert(cols.contains("l_quantity") && !cols.contains("l_comment"))
  }
}
