package graft.core

import org.apache.spark.sql.SparkSession

/** Shared env-var plumbing for the driver-contract mains (Verify/Bench).
  * Local-iteration only — the driver never sets these. */
object Env {
  /** Apply `SPARK_GRAFT_EXTRA_CONF` ("k=v;k=v") to a session builder.
    * Each ';'-separated entry must contain '='; a malformed token fails
    * loudly BY NAME (the old `val Array(k, v) = ...` threw an opaque
    * MatchError). Values may contain '=' (split at the first one) but not
    * ';' — none of the Spark confs this repo gates on do; if one ever
    * does, add escaping here rather than picking it apart at call sites. */
  def applyExtraConf(builder: SparkSession.Builder): SparkSession.Builder = {
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach {
      _.split(";").filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) if k.trim.nonEmpty =>
            builder.config(k.trim, v.trim)
          case _ => throw new IllegalArgumentException(
            s"SPARK_GRAFT_EXTRA_CONF: malformed entry '$kv' " +
              "(expected key=value, ';'-separated)")
        }
      }
    }
    builder
  }

  /** Between-query session hygiene for the sequential harness mains
    * (Bench/Verify): drop SQL-cached DataFrames AND every raw persisted
    * RDD, then force a GC so the ContextCleaner's shuffle/broadcast
    * backlog drains (it only fires on driver GC; over 200+ queries the
    * backlog measurably taxed late queries — round 13: p01 15.8 s late
    * in the sweep vs ~6 s solo, same binary).
    *
    * INVARIANT (round-14 ADVICE, stated loudly): queries must be
    * SELF-CONTAINED — no query may rely on a cached/localCheckpointed
    * DataFrame or RDD surviving from an earlier query. The sweep
    * unpersists localCheckpointed RDDs whose blocks are the ONLY copy
    * (lineage is truncated), so a future cross-query memoized fixture
    * would fail far from here with "Checkpoint block not found". If such
    * a fixture is ever needed, exempt it by name here rather than
    * weakening the sweep. */
  def sweepSession(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    System.gc()
  }

  /** Data-scaled repartition width: at least the session's default
    * parallelism (all cores busy), and at least enough partitions that
    * no task handles more than `unitsPerTask` work units. A FIXED width
    * is the scale bug in both directions — defaultParallelism alone
    * leaves 100×-replica tasks holding millions of rows-unique aggregate
    * groups (the p01 4 GB-executor OOM), while rows/unitsPerTask alone
    * under-parallelizes small inputs. */
  def scaledWidth(spark: SparkSession, units: Long,
                  unitsPerTask: Long): Int = {
    require(unitsPerTask > 0, "unitsPerTask must be positive")
    val byData = (units + unitsPerTask - 1) / unitsPerTask
    math.max(spark.sparkContext.defaultParallelism,
      math.min(byData, 100000L).toInt)
  }
}
