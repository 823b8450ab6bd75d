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
}
