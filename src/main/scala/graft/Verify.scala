package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg (local iteration only): comma-separated query-name
    // filter; the driver always calls with exactly (sfDir, outDir)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // local iteration only: SPARK_GRAFT_MASTER=local-cluster[2,8,4096]
    // re-gates the engine across REAL executor JVM boundaries (closure
    // serialization, torrent broadcasts, off-driver task state) — the
    // round-10 multi-JVM discipline; the driver always runs plain local
    val builder = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // local iteration only (driver never sets it): "k=v;k=v" extra confs —
    // e.g. a lowered autoBroadcastJoinThreshold to hash-gate the size-aware
    // escalations (SemDedup.assignAuto) with the escalation ENGAGED
    graft.core.Env.applyExtraConf(builder)
    val spark = builder.getOrCreate()
    // SPARK_GRAFT_LOG=INFO captures per-task serialized sizes (TaskSetManager)
    // for the multi-JVM task-binary distribution audit; default stays WARN
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "WARN"))
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .zipWithIndex
      .foreach { case ((name, fn), i) =>
      // same periodic hygiene as Bench: localCheckpoint graphs and
      // pending shuffle cleanup accumulate across a long sequential run
      // (ContextCleaner only fires on driver GC); at 10-20x data the
      // backlog measurably taxed later queries' single write task
      // self-contained-queries invariant stated at Env.sweepSession
      if (i % 16 == 15) graft.core.Env.sweepSession(spark)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
