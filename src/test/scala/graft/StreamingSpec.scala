package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.EventOps
import graft.operators.EventOps.Ev

/** Structured Streaming paths: watermarked windowed aggregation and
  * stateful sessionization (flatMapGroupsWithState) across micro-batches. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("watermarked tumbling-window aggregation over a memory stream") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Double)]
    val windowed = ms.toDF().toDF("event_id", "ts_us", "value")
      .withColumn("tts", timestamp_micros(col("ts_us")))
      .withWatermark("tts", "1 hour")
      .groupBy(window(col("tts"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val q = windowed.writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try {
      val h = 3600L * 1000000L // 1 hour in micros
      ms.addData((0L, 10L * h + 1L, 1.0), (1L, 10L * h + 2L, 2.0),
        (2L, 11L * h + 1L, 4.0))
      q.processAllAvailable()
      val got = spark.table("win_agg")
        .select(col("n"), col("v")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got === Set((2L, 3.0), (1L, 4.0)))
    } finally q.stop()
  }

  test("stateful sessions survive across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val gap = 100L
    val ms = MemoryStream[Ev]
    val q = EventOps.streamingSessions(ms.toDS(), gap)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // batch 1: user 7 opens a session (not yet emitted)
      ms.addData(Ev(7L, 0L, 1.0), Ev(7L, 50L, 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 0)
      // batch 2: gap of 1000 > 100 closes it; new session opens
      ms.addData(Ev(7L, 1050L, 4.0))
      q.processAllAvailable()
      val done = spark.table("sessions").as[EventOps.SessionOut].collect()
      assert(done.toSeq === Seq(EventOps.SessionOut(7L, 0L, 50L, 2L, 3.0)))
    } finally q.stop()
  }
}
