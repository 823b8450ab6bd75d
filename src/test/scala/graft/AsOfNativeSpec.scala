package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin
import graft.plans.{AsOfJoinExec, AsOfJoinPlan}

/** The custom Catalyst as-of operator (plans/AsOfJoinPlan.scala) against
  * the union-sort window formulation (operators/AsOfJoin.asOf) on
  * adversarial fixtures: ties at equal ts, keys with no right rows, right
  * rows after every left row, null payloads inside matched rows, and
  * multi-partition shuffles. Also pins the physical plan: AsOfJoinExec
  * with one exchange per side. */
class AsOfNativeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // left: (key, ts, lid); right: (key, ts, pay) with pay sometimes null
  private val left = Seq(
    (1L, 10L, 100L), (1L, 20L, 101L), (1L, 20L, 102L), (1L, 5L, 103L),
    (2L, 50L, 200L), // key with no right rows at all
    (3L, 7L, 300L),  // right rows exist but all AFTER this ts
    (4L, 40L, 400L), (4L, 41L, 401L),
    (5L, 90L, 500L))
  private val right = Seq(
    (1L, 10L, Some(1000L)),           // exact-ts match (<= convention)
    (1L, 15L, None),                  // matched row with NULL payload
    (1L, 19L, Some(1002L)),
    (3L, 8L, Some(3000L)),
    (4L, 40L, Some(4000L)), (4L, 40L, Some(4001L)), // tie at equal ts
    (5L, 1L, Some(5000L)), (5L, 2L, Some(5001L)))

  private def frames = {
    val l = left.toDF("k", "ts", "lid").repartition(5)
    val r = right.toDF("k", "ts", "pay").repartition(3)
    (l, r)
  }

  test("native operator matches the union-sort window plan") {
    val (l, r) = frames
    val native = AsOfJoinPlan.asOfNative(l, r, "k", "ts", Map("pay" -> "p"))
      .select("k", "ts", "lid", "p")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3))).toSet
    val window = AsOfJoin.asOf(l, r, "k", "ts", Map("pay" -> "p"))
      .select("k", "ts", "lid", "p")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3))).toSet
    assert(native === window)
    // spot-checks: <= convention, no-match nulls, null payload preserved
    val byId = native.map(t => t._3 -> t._4).toMap
    assert(byId(100L) === 1000L) // ts 10 matches the right row AT 10
    assert(byId(103L) === -1L)   // ts 5 precedes every right row
    assert(byId(200L) === -1L)   // key 2 has no right rows
    assert(byId(300L) === -1L)   // key 3's right row is later
    assert(byId(101L) === 1002L)
    // the matched row's OWN null payload stays null (no stale carry)
    val l15 = Seq((1L, 16L, 900L)).toDF("k", "ts", "lid")
    val m = AsOfJoinPlan.asOfNative(l15, r.toDF().as("r2"), "k", "ts",
      Map("pay" -> "p")).collect()
    assert(m.head.isNullAt(m.head.fieldIndex("p")))
  }

  test("equal-ts right rows: the greatest payload wins, deterministically " +
      "on both plans (round-12 rule — arrival order is NOT a tiebreak)") {
    val (l, r) = frames
    val native = AsOfJoinPlan.asOfNative(l, r, "k", "ts", Map("pay" -> "p"))
    val window = AsOfJoin.asOf(l, r, "k", "ts", Map("pay" -> "p"))
    val n400 = native.filter(col("lid") === 400L).select("p").head().getLong(0)
    val w400 = window.filter(col("lid") === 400L).select("p").head().getLong(0)
    // the DEFINED value rule — shuffle-arrival order flipped this across
    // executor layouts before round 12 pinned the payload into the sort
    assert(n400 === 4001L)
    assert(w400 === 4001L)
  }

  test("left-only filters push through the custom node into the scan") {
    import graft.core.Tables
    val ev = Tables.events(spark, TestSpark.sf).withColumn("tus", expr("ts div 1000"))
    val l = Tables.events(spark, TestSpark.sf).withColumn("tus", expr("ts div 1000"))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("tus"))
    val r = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("tus"), col("event_id"))
    val joined = AsOfJoinPlan.asOfNative(l, r, "user_id", "tus",
      Map("event_id" -> "view_id"))
    val filtered = joined.filter(col("user_id") < 100L)
    val plan = filtered.queryExecution.executedPlan.toString
    // the left-only predicate must reach the left parquet scan, BELOW the
    // as-of node — without AsOfJoinPushdown it evaluates after the shuffle
    assert(plan.contains("PushedFilters") &&
      plan.contains("LessThan(user_id,100)"), plan)
    // and the rewrite is semantics-preserving
    val viaFilter = filtered.select("event_id", "view_id").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    val prefiltered = AsOfJoinPlan.asOfNative(
      l.filter(col("user_id") < 100L), r, "user_id", "tus",
      Map("event_id" -> "view_id"))
      .select("event_id", "view_id").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    assert(viaFilter === prefiltered)
  }

  test("plan: AsOfJoinExec with a keyed exchange and sort per side") {
    val (l, r) = frames
    val df = AsOfJoinPlan.asOfNative(l, r, "k", "ts", Map("pay" -> "p"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan) // SparkPlan nodeName strips "Exec"
    assert("Exchange hashpartitioning".r.findAllIn(plan).size >= 2, plan)
    assert("(?i)sort".r.findAllIn(plan).nonEmpty, plan)
  }
}
