package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-binning sessionizer — SURVEY §2.5 A2 (`row_mapper`).
  *
  * Reference semantics (africanus/averaging/time_and_channel_mapping.py:66-358):
  * per baseline (ant1, ant2), rows sorted by time are greedily packed into
  * bins — a new unique timestep opens a new bin when the bin's accumulated
  * interval would exceed `binSecs`. Rows sharing a timestep always land in
  * the same bin. Bin ids are 0-based per baseline.
  *
  * Spark shape: ONE shuffle on the baseline key, then a per-group sorted
  * scan (`Dataset.flatMapGroups`). Groups are independent, so this
  * parallelizes across baselines exactly like the reference's dask layer;
  * within a group the scan is O(rows). At 100 TB the baseline count
  * (~ant²/2, thousands) times utimes bounds group size, not total rows —
  * a group never needs to exceed executor memory because only (time,
  * interval) pairs participate; payload columns are joined back afterward
  * on row_id.
  */
object Sessionize {

  /** Input columns: row_id, ant1, ant2, time, `intervalCol`.
    * Output: (row_id, ant1, ant2, bin). */
  def timeBins(df: DataFrame, binSecs: Double,
               intervalCol: String = "interval"): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col("row_id").cast("long"), col("ant1").cast("long"),
        col("ant2").cast("long"), col("time").cast("double"),
        col(intervalCol).cast("double"))
      .as[(Long, Long, Long, Double, Double)]
      .groupByKey(r => (r._2, r._3))
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(r => (r._4, r._1))
        var bin = -1L
        var acc = 0.0
        var lastTime = Double.NaN
        rows.iterator.map { r =>
          if (lastTime != r._4) {
            if (bin < 0L || acc + r._5 > binSecs) { bin += 1L; acc = 0.0 }
            acc += r._5
            lastTime = r._4
          }
          (r._1, r._2, r._3, bin)
        }
      }
      .toDF("row_id", "ant1", "ant2", "bin")
  }
}
