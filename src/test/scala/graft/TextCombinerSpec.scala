package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextCombiner

/** The LUT combiner must be a pure re-expression of the explode plan:
  * identical counts under ANY partitioning, and BigramFsum must equal
  * the per-pair sum it replaces. */
class TextCombinerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pairCodeCounts equals the explode plan and is partition-invariant") {
    import spark.implicits._
    val docs = Seq("abab", "ba", "x", "", "hello world", "aaaa")
      .toDF("text")
    val explodePlan = docs.filter(length(col("text")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 3, 7)) {
      val got = TextCombiner.pairCodeCounts(docs.repartition(parts), "text")
        .select(TextCombiner.pairString("code").as("pair"), col("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === explodePlan, s"combiner diverges at $parts partitions")
    }
  }

  test("BigramFsum equals the per-occurrence rounded-term sum") {
    import spark.implicits._
    // terms LUT: t[code] = code * 3 - 7 (arbitrary longs, incl. negatives)
    val lut: Seq[Long] = (0 until 16384).map(i => i.toLong * 3 - 7)
    val docs = Seq("abcabc", "zz", "a", "hello world").toDF("text")
      .crossJoin(broadcast(Seq(lut).toDF("arr")))
    graft.expr.GraftFunctions.register(spark)
    val got = docs.select(col("text"), expr("bigram_fsum(text, arr)").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ref(t: String): Long = t.sliding(2).filter(_.length == 2)
      .map(p => lut(p.charAt(0).toInt * 128 + p.charAt(1).toInt)).sum
    got.foreach { case (t, s) => assert(s === ref(t), s"mismatch on '$t'") }
  }

  test("non-ASCII input fails fast instead of mis-bucketing") {
    import spark.implicits._
    val docs = Seq("café").toDF("text")
    val ex = intercept[Exception] {
      TextCombiner.pairCodeCounts(docs, "text").collect()
    }
    // the corpus-contract check must be what fired — not an unrelated
    // analysis/serialization error that would also satisfy intercept
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs.contains("non-ASCII"),
      s"expected the corpus-contract failure, got: $msgs")
  }
}
