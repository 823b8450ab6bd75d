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
    // this scale is dominated by scheduler jitter. A failed run yields the
    // -1 sentinel (never a phantom elapsed time).
    def once(q: Q): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        q.fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        None
      }
    }
    // optional comma-separated name filter for local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.registry.filter(q => names(q.name))
      case None => SparkEntry.registry
    }
    val results = selected.zipWithIndex.map { case (q, i) =>
      // Periodic hygiene: a few queries pin block-manager state
      // (localCheckpoint graphs) and every run leaves shuffle files whose
      // cleanup rides the ContextCleaner, which only fires on driver GC.
      // Over 160+ queries × 2 runs that accumulated state taxes later
      // queries; forcing a GC every 16 queries keeps the JVM at
      // steady-state so timings measure the QUERY, not the backlog.
      if (i % 16 == 15) { spark.catalog.clearCache(); System.gc() }
      val v = (once(q), once(q)) match {
        case (Some(a), Some(b)) => math.min(a, b)
        case _ => -1.0
      }
      q.name -> v
    }
    def fmt(v: Double) = if (v < 0) "-1" else f"$v%.3f"
    // Sort the per-query map FASTEST-FIRST: the driver records the TAIL
    // of stdout, so whatever is truncated is the cheap head — the slow
    // queries (the ones a regression diagnosis needs) always land inside
    // the captured window, immediately before the headline object.
    val qs = results.sortBy { case (_, v) => if (v < 0) Double.MaxValue else v }
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val full =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"failed":$failed,"sf":"$sfDir","queries":$qs}"""
    // The driver captures the TAIL of stdout, so the long per-query line
    // goes first (and to bench_results.json), and a SHORT headline object
    // is the very LAST stdout line — it survives truncation and parses.
    println(full)
    // only FULL runs update the committed record — a SPARK_GRAFT_ONLY
    // filtered iteration run must not clobber the 170+-query baseline
    if (only.isEmpty) try {
      val w = new java.io.PrintWriter("bench_results.json")
      w.println(full); w.close()
    } catch { case _: Throwable => }
    spark.stop()
    println(
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"failed":$failed,"sf":"$sfDir"}""")
  }
}
