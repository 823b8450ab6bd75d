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
  * Spark shape: ONE shuffle — `repartition` on the baseline key — then
  * `sortWithinPartitions(baseline, time)` and a STREAMING `mapPartitions`
  * scan that detects key changes as it walks the sorted partition. Per-key
  * state is three scalars, so executor memory is CONSTANT no matter how
  * long the observation runs (a per-group toArray would grow with
  * history length). Groups are independent and parallel across baselines,
  * exactly like the reference's dask layer; payload columns are joined
  * back afterward on row_id.
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
      .repartition(col("ant1"), col("ant2"))
      .sortWithinPartitions(col("ant1"), col("ant2"), col("time"), col("row_id"))
      .as[(Long, Long, Long, Double, Double)]
      .mapPartitions { it =>
        // streaming scan over (baseline-sorted, time-sorted) rows:
        // constant-memory greedy binning, reset at every key change
        var curA1 = -1L; var curA2 = -1L
        var bin = -1L
        var acc = 0.0
        var lastTime = Double.NaN
        it.map { r =>
          if (r._2 != curA1 || r._3 != curA2) {
            curA1 = r._2; curA2 = r._3
            bin = -1L; acc = 0.0; lastTime = Double.NaN
          }
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

  /** FULL reference semantics of `row_mapper`
    * (time_and_channel_mapping.py:255-308): the bin closes when the new
    * row's upper interval edge would stretch the bin past `binSecs` from
    * the FIRST row's lower edge (`time + ivl/2 − bin_low > binSecs`), not
    * when accumulated intervals overflow. Assumes unique (baseline, time)
    * rows — the reference raises on duplicates. Same constant-memory
    * sorted-partition streaming scan as [[timeBins]]. */
  def timeBinsFull(df: DataFrame, binSecs: Double,
                   intervalCol: String = "ivl"): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col("row_id").cast("long"), col("ant1").cast("long"),
        col("ant2").cast("long"), col("time").cast("double"),
        col(intervalCol).cast("double"))
      .repartition(col("ant1"), col("ant2"))
      .sortWithinPartitions(col("ant1"), col("ant2"), col("time"), col("row_id"))
      .as[(Long, Long, Long, Double, Double)]
      .mapPartitions { it =>
        var curA1 = -1L; var curA2 = -1L
        var bin = -1L
        var binLow = 0.0
        it.map { r =>
          if (r._2 != curA1 || r._3 != curA2) {
            curA1 = r._2; curA2 = r._3; bin = -1L
          }
          val half = r._5 * 0.5
          if (bin < 0L) { bin = 0L; binLow = r._4 - half }
          else if (r._4 + half - binLow > binSecs) {
            bin += 1L; binLow = r._4 - half
          }
          (r._1, r._2, r._3, bin)
        }
      }
      .toDF("row_id", "ant1", "ant2", "bin")
  }

  /** [[timeBinsFull]] with payload carry: the same sorted-partition
    * streaming scan, but EVERY input column rides the binner's single
    * (ant1, ant2) shuffle and `bin` is appended — the a10 idiom. The
    * thin variant forces a row_id join-back to reattach payload, which
    * at scale is a SECOND fact-sized shuffle; carrying makes the binner
    * one-shuffle total. Requires long ant1/ant2, double time/interval. */
  def timeBinsCarry(df: DataFrame, binSecs: Double,
                    intervalCol: String = "ivl"): DataFrame = {
    val s = df.sparkSession
    // same defensive coercion as timeBinsFull — casting ONLY the key
    // columns preserves the payload carry; without it an int ant or
    // float time fails mid-job with an opaque ClassCastException
    val dfc = df
      .withColumn("ant1", col("ant1").cast("long"))
      .withColumn("ant2", col("ant2").cast("long"))
      .withColumn("time", col("time").cast("double"))
      .withColumn(intervalCol, col(intervalCol).cast("double"))
    val part = dfc.repartition(col("ant1"), col("ant2"))
      .sortWithinPartitions(col("ant1"), col("ant2"), col("time"),
        col("row_id"))
    val sch = part.schema
    val iA1 = sch.fieldIndex("ant1"); val iA2 = sch.fieldIndex("ant2")
    val iT = sch.fieldIndex("time"); val iI = sch.fieldIndex(intervalCol)
    val rdd = part.rdd.mapPartitions { it =>
      var curA1 = Long.MinValue; var curA2 = Long.MinValue
      var bin = -1L; var binLow = 0.0
      it.map { r =>
        val a1 = r.getLong(iA1); val a2 = r.getLong(iA2)
        if (a1 != curA1 || a2 != curA2) { curA1 = a1; curA2 = a2; bin = -1L }
        val t = r.getDouble(iT); val half = r.getDouble(iI) * 0.5
        if (bin < 0L) { bin = 0L; binLow = t - half }
        else if (t + half - binLow > binSecs) { bin += 1L; binLow = t - half }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ bin)
      }
    }
    s.createDataFrame(rdd,
      sch.add("bin", org.apache.spark.sql.types.LongType))
  }

  /** [[timeBins]] — the GREEDY accumulated-interval rule, unchanged —
    * with payload carry (round 14): every input column rides the
    * binner's single (ant1, ant2) shuffle and `bin` is appended, the
    * [[timeBinsCarry]] plumbing applied to the greedy rule. The thin
    * variant forces a row_id join-back to reattach payload, which
    * recomputes the upstream fact a second time AND re-shuffles both
    * sides by row_id — at scale two extra fact-sized exchanges plus
    * their sorts (guide §2.4). Binning state machine, sort order and
    * key coercions are IDENTICAL to [[timeBins]], so the (row_id, bin)
    * pairs are bit-identical (SessionizeSpec pins carry ≡ thin+join on
    * an irregular-interval fixture). */
  def timeBinsGreedy(df: DataFrame, binSecs: Double,
                     intervalCol: String = "interval"): DataFrame = {
    val s = df.sparkSession
    val dfc = df
      .withColumn("ant1", col("ant1").cast("long"))
      .withColumn("ant2", col("ant2").cast("long"))
      .withColumn("time", col("time").cast("double"))
      .withColumn(intervalCol, col(intervalCol).cast("double"))
    val part = dfc.repartition(col("ant1"), col("ant2"))
      .sortWithinPartitions(col("ant1"), col("ant2"), col("time"),
        col("row_id"))
    val sch = part.schema
    val iA1 = sch.fieldIndex("ant1"); val iA2 = sch.fieldIndex("ant2")
    val iT = sch.fieldIndex("time"); val iI = sch.fieldIndex(intervalCol)
    val rdd = part.rdd.mapPartitions { it =>
      var curA1 = Long.MinValue; var curA2 = Long.MinValue
      var bin = -1L; var acc = 0.0; var lastTime = Double.NaN
      it.map { r =>
        val a1 = r.getLong(iA1); val a2 = r.getLong(iA2)
        if (a1 != curA1 || a2 != curA2) {
          curA1 = a1; curA2 = a2
          bin = -1L; acc = 0.0; lastTime = Double.NaN
        }
        val t = r.getDouble(iT)
        if (lastTime != t) {
          val ivl = r.getDouble(iI)
          if (bin < 0L || acc + ivl > binSecs) { bin += 1L; acc = 0.0 }
          acc += ivl
          lastTime = t
        }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ bin)
      }
    }
    s.createDataFrame(rdd,
      sch.add("bin", org.apache.spark.sql.types.LongType))
  }
}
