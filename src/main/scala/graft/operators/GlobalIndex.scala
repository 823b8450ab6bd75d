package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense global 0-based ordering index — the scalable replacement for a
  * partition-less `row_number() OVER (ORDER BY ...)` (which funnels the
  * whole relation through one task). Used by A2's output-row numbering,
  * where the reference argsorts the flattened bin axis
  * (averaging/time_and_channel_mapping.py:318-327).
  *
  * Shape: range-partitioned sort on the key, per-partition row numbers
  * (partitioned window), plus a collected per-partition COUNT vector —
  * one long per partition, never data-sized — turned into base offsets.
  */
object GlobalIndex {

  def byOrder(df: DataFrame, cols: Seq[Column], out: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    // materialize ONE range partitioning before deriving both jobs:
    // repartitionByRange samples boundaries per execution, so without
    // this the counts job and the numbering job could partition
    // differently once the reservoir sample stops covering the data —
    // the offsets would then attach to the wrong _pid and the index
    // would be silently non-dense exactly at scale
    val sorted = df.repartitionByRange(cols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    // per-partition cardinalities: numPartitions values on the driver
    val counts = sorted.groupBy("_pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.toSeq.map { case (p, n) =>
      val off = acc; acc += n; (p, off)
    }
    val offDf = broadcast(offsets.toDF("_pid2", "_off"))
    val w = Window.partitionBy("_pid").orderBy(cols: _*)
    sorted.withColumn("_rn", row_number().over(w).cast("long"))
      .join(offDf, col("_pid") === col("_pid2"))
      .withColumn(out, col("_off") + col("_rn") - 1L)
      .drop("_pid", "_pid2", "_off", "_rn")
  }
}
