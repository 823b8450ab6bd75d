package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at the env-selected
  * scale factor and prints one JSON line.
  *
  * Materialization is a noop-format write (all columns evaluated, nothing
  * persisted) — `count()` would let Spark prune the very work being
  * measured. One cheap warmup job absorbs JVM/codegen startup so the
  * first measured query isn't charged for it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: codegen machinery + parquet reader/footers for the big facts
    spark.range(1L << 22).selectExpr("sum(id * 3)").collect()
    Seq("lineitem", "orders").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }
    // two timed runs per query, report the min — single-run wall-clock at
    // this scale is dominated by scheduler jitter
    def once(q: Q): Double = {
      val t0 = System.nanoTime()
      try q.fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.registry.map { q =>
      q.name -> math.min(once(q), once(q))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
