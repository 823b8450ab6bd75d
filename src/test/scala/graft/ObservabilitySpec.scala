package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Observability

/** `observe()`-based pipeline monitoring: metrics must ride the existing
  * action (no extra scan) and land in the listener keyed by stage name —
  * for batch actions and per micro-batch on a stream.
  */
class ObservabilitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stage observations ride a batch action into the listener") {
    val listener = Observability.install(spark)
    try {
      val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      val staged = Observability.observed(docs, "ingest", "text", "lang")
        .filter(col("n_chars") > 0)
      val kept = Observability.observed(staged, "post_filter")
        .count()
      // the listener fires asynchronously after the action completes
      val deadline = System.nanoTime() + 10e9.toLong
      while (listener.get("post_filter").isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      val ingest = listener.get("ingest").get
      val post = listener.get("post_filter").get
      assert(ingest.getAs[Long]("rows") === docs.count())
      assert(ingest.getAs[Long]("text_nulls") === 0L)
      assert(ingest.getAs[Long]("lang_nulls") === 0L)
      assert(post.getAs[Long]("rows") === kept)
    } finally listener.clear()
  }

  test("observations surface per micro-batch on a stream") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val observed = Observability.observed(
      ms.toDF().toDF("id", "text"), "stream_ingest", "text")
    val q = observed.writeStream.format("noop").start()
    try {
      ms.addData((1L, "a"), (2L, null), (3L, "c"))
      q.processAllAvailable()
      val p = q.recentProgress.filter(_.observedMetrics.containsKey("stream_ingest"))
      assert(p.nonEmpty, "no micro-batch carried the observation")
      val m = p.last.observedMetrics.get("stream_ingest")
      assert(m.getAs[Long]("rows") === 3L)
      assert(m.getAs[Long]("text_nulls") === 1L)
    } finally q.stop()
  }
}
