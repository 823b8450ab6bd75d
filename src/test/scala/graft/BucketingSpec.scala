package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketing: pre-partitioned co-located joins — the 100 TB answer to
  * repeated fact-fact joins on the same key (shuffle once at write time,
  * never again at read time). */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables join without any exchange") {
    val li = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"${TestSpark.sf}/orders.parquet")
      .select("o_orderkey", "o_custkey")
    // the catalog is in-memory per JVM: clear leftover warehouse dirs from
    // prior runs before writing
    for (t <- Seq("li_bucketed", "o_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete())
        dir.delete()
      }
    }
    li.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey").agg(sum("l_quantity").as("qty"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // the join itself is exchange-free; only the final groupBy shuffles
      val joinPart = plan.split("SortMergeJoin")(1)
      assert(!joinPart.contains("Exchange hashpartitioning"))
      // and it computes the right thing
      val expect = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey").agg(sum("l_quantity").as("qty"))
      assert(j.exceptAll(expect).count() === 0 && expect.exceptAll(j).count() === 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
