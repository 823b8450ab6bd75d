package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expr.GraftFunctions

class GraftExpressionsSpec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark; GraftFunctions.register(s); s }

  test("sinc expression: exact at zero, matches scala elsewhere, codegen path") {
    val rows = spark.sql(
      "SELECT x, sinc(x) AS s FROM VALUES (0.0D), (0.5D), (-2.0D), (3.14159D) AS t(x)")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(rows(0.0) === 1.0)
    for ((x, s) <- rows if x != 0.0) assert(s === math.sin(x) / x)
    // null propagates
    assert(spark.sql("SELECT sinc(CAST(NULL AS DOUBLE))").collect()(0).isNullAt(0))
  }

  test("kahan_sum preserves small terms that a naive double sum drops") {
    import spark.implicits._
    val vals = Seq(1e16, 1.0, -1e16, 1.0)
    val df = vals.toDF("v").coalesce(1)
    df.createOrReplaceTempView("kahan_in")
    val k = spark.sql("SELECT kahan_sum(v) FROM kahan_in").collect()(0).getDouble(0)
    assert(k === 2.0)
    // distributed merge keeps the compensation
    val big = (1 to 1000).flatMap(_ => Seq(1e12, 0.1, -1e12))
    big.toDF("v").repartition(8).createOrReplaceTempView("kahan_big")
    val kb = spark.sql("SELECT kahan_sum(v) FROM kahan_big").collect()(0).getDouble(0)
    assert(math.abs(kb - 100.0) < 1e-9)
  }

  test("kahan_sum of empty input is 0") {
    import spark.implicits._
    Seq.empty[Double].toDF("v").createOrReplaceTempView("kahan_empty")
    assert(spark.sql("SELECT kahan_sum(v) FROM kahan_empty")
      .collect()(0).getDouble(0) === 0.0)
  }

  test("lsh_code16 matches the declarative 16-pass formulation and eval path") {
    import spark.implicits._
    val vecs = Seq(
      (0L, (1 to 64).map(i => ((i * 7) % 23 - 11).toLong)),
      (1L, (1 to 64).map(i => ((i * 13) % 17 - 8).toLong)),
      (2L, Seq.empty[Long]), // empty array → all projections 0 → code 0
      (3L, Seq(5L)))
    val df = vecs.toDF("id", "qv")
    df.createOrReplaceTempView("lsh_in")
    val declarative =
      """aggregate(sequence(0, 15), 0L, (acc, j) -> acc +
        |  CASE WHEN aggregate(transform(qv, (x, i) ->
        |         x * ((CAST(i + 1 AS BIGINT) * (2654435761 + CAST(j AS BIGINT) * 40503)) % 2048 - 1024)),
        |       0L, (a, x) -> a + x) > 0
        |  THEN CAST(shiftleft(1L, CAST(j AS INT)) AS BIGINT) ELSE 0L END)""".stripMargin
    val rows = spark.sql(
      s"SELECT id, lsh_code16(qv) AS fast, $declarative AS slow FROM lsh_in")
      .collect()
    for (r <- rows)
      assert(r.getLong(1) === r.getLong(2), s"id ${r.getLong(0)}")
    assert(rows.find(_.getLong(0) == 2L).get.getLong(1) === 0L)
    // interpreted (non-codegen) eval path agrees with the codegen result
    val direct = graft.expr.LshCode16(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        vecs.head._2.toArray,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
      .eval(null).asInstanceOf[Long]
    assert(direct === rows.find(_.getLong(0) == 0L).get.getLong(1))
  }

  test("rolling_fp matches the declarative per-character aggregate") {
    import spark.implicits._
    Seq((0L, "hello world"), (1L, ""), (2L, "a"),
        (3L, "The quick brown fox! 42"))
      .toDF("id", "text").createOrReplaceTempView("fp_in")
    val declarative =
      """aggregate(
        |  sequence(1, length(text)),
        |  0L,
        |  (acc, i) -> acc + CAST(ascii(substring(text, i, 1)) AS BIGINT)
        |    * ((CAST(i AS BIGINT) * 2654435761) % 1048576 + 1)
        |) % 1073741824""".stripMargin
    val rows = spark.sql(
      s"SELECT id, rolling_fp(text) AS fast, $declarative AS slow FROM fp_in")
      .collect()
    for (r <- rows)
      assert(r.getLong(1) === r.getLong(2), s"id ${r.getLong(0)}")
    // direct object API agrees too
    assert(graft.expr.RollingFingerprint.compute("hello world")
      === rows.find(_.getLong(0) == 0L).get.getLong(1))
    assert(graft.expr.RollingFingerprint.compute("") === 0L)
  }

  test("kmv_minhash keeps the k smallest distinct values, invariant to partitioning") {
    import spark.implicits._
    // values with duplicates, spread over many partitions so map-side
    // partials MUST merge; expectation is the brute-force bottom-8
    val vals = (1L to 500L).map(i => (i * 7919) % 997) ++ Seq(3L, 3L, 5L)
    val expect = vals.distinct.sorted.take(8)
    for (parts <- Seq(1, 7, 32)) {
      val got = vals.toDF("v").repartition(parts)
        .agg(org.apache.spark.sql.functions.expr("kmv_minhash(v, 8)").as("arr"))
        .head.getSeq[Long](0)
      assert(got === expect, s"parts=$parts")
    }
    // fewer distinct values than k: the sketch returns them all, sorted
    val small = Seq(9L, 2L, 9L, 4L).toDF("v")
      .agg(org.apache.spark.sql.functions.expr("kmv_minhash(v, 8)").as("arr"))
      .head.getSeq[Long](0)
    assert(small === Seq(2L, 4L, 9L))
  }

  test("bloom sketch: zero false negatives; false-positive rate within bound") {
    import spark.implicits._
    // the t19 prefilter contract: members ALWAYS pass (so the exact join
    // after the prefilter is lossless), and the 10-bits-per-item sizing
    // holds the FP rate near its ~1% design point on disjoint probes
    (1 to 10000).map(i => s"member_$i").toDF("s")
      .createOrReplaceTempView("bloom_members")
    val bloomSub =
      "(SELECT bloom_filter_agg(xxhash64(s), 10000L, 100000L) FROM bloom_members)"
    val fn = spark.sql(
      s"""SELECT count(*) FROM bloom_members
         |WHERE NOT bloom_might_contain($bloomSub, xxhash64(s))""".stripMargin)
      .head.getLong(0)
    assert(fn === 0L, "a bloom filter must have no false negatives")
    (1 to 20000).map(i => s"probe_$i").toDF("s")
      .createOrReplaceTempView("bloom_probes")
    val fp = spark.sql(
      s"""SELECT count(*) FROM bloom_probes
         |WHERE bloom_might_contain($bloomSub, xxhash64(s))""".stripMargin)
      .head.getLong(0)
    val rate = fp.toDouble / 20000
    info(s"bloom FP rate at 10 bits/item: $rate ($fp / 20000)")
    assert(rate < 0.03, s"FP rate $rate exceeds 3x the 1% design point")
  }
}
