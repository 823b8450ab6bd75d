package graft

import org.apache.spark.sql.SparkSession

/** Deployment check for the `spark.sql.extensions=graft.expr.
  * GraftExtensions` config path — the wiring a cluster's
  * spark-defaults.conf applies with no programmatic register() call.
  * Static SQL conf binds at SparkContext creation, so this must run in a
  * FRESH JVM (ExtensionsSpec forks one; `runMain graft.ExtensionsCheck`
  * works too). Exits non-zero on any failure.
  */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      require(spark.sql("SELECT qdot(array(1L, 2L), array(3L, 4L))")
        .collect().head.getLong(0) == 11L, "qdot not wired")
      require(spark.sql("SELECT sinc(0.0)").collect().head.getDouble(0) == 1.0,
        "sinc not wired")
      require(spark.sql(
        "SELECT scatter_moments(v).n FROM VALUES (array(1L,2L)), (array(3L,4L)) AS t(v)")
        .collect().head.getLong(0) == 2L, "scatter_moments not wired")
      // the injected planner strategy (not spark.experimental) must plan
      // the custom as-of node
      import org.apache.spark.sql.functions._
      val l = spark.range(3).select(col("id").as("k"), (col("id") * 10).as("t"))
      val r = spark.range(3).select(col("id").as("k"),
        (col("id") * 10 - 1).as("t"), col("id").as("payload"))
      val joined = graft.plans.AsOfJoinPlan.asOfNative(l, r, "k", "t",
        Map("payload" -> "p"))
      require(joined.queryExecution.executedPlan.toString.contains("AsOfJoin"),
        "as-of strategy not wired")
      require(joined.count() == 3, "as-of join wrong row count")
      println("EXTENSIONS OK")
    } finally spark.stop()
  }
}
