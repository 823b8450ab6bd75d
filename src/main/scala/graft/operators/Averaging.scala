package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Flag-aware averaging aggregation helpers — SURVEY §2.5 A4/A6.
  *
  * The reference's flag-matching rule
  * (africanus/averaging/time_and_channel_avg.py:75-120, 413-676): a bin is
  * flagged only when ALL its samples are flagged; a sample contributes to
  * the bin's averages iff its flag equals the bin flag (i.e. unflagged
  * samples win when any exist, otherwise the flagged samples are averaged).
  *
  * Implemented as a window pass (bin flag) + conditional aggregates — both
  * stages stay in Tungsten codegen; the window and the groupBy share the
  * same partitioning key so AQE coalesces them into one exchange.
  */
object Averaging {

  /** Adds `all_flagged` (bin flag) and `contrib` per group. */
  def withFlagMatch(df: DataFrame, flagCol: String,
                    groupCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("all_flagged",
        min(when(col(flagCol), 1L).otherwise(0L)).over(w) === 1L)
      .withColumn("contrib", col(flagCol) === col("all_flagged"))
  }

  /** Aggregate input gated on the contributing-sample rule. */
  def cwhen(c: Column): Column = when(col("contrib"), c)

  /** Error-propagated output sigma: sqrt(Σ w²σ²)/Σw over contributing
    * samples (time_and_channel_avg.py:174-187). */
  def sigmaOut(weight: Column, sigma: Column): Column =
    sqrt(sum(cwhen(weight * weight * sigma * sigma))) / sum(cwhen(weight))

  /** Weighted mean Σwv/Σw over contributing samples (the
    * `average_visibilities` intrinsic, time_and_channel_avg.py:277-412). */
  def wmean(w: Column, v: Column): Column =
    sum(cwhen(w * v)) / sum(cwhen(w))

  /** merge_flags (africanus/averaging/shared.py:19-80): a row-level flag
    * derived from the per-(chan, corr) flag array — set iff EVERY element
    * is flagged. When an explicit flag_row accompanies the array the
    * reference validates agreement; deriving from the array is the
    * authoritative direction. */
  def mergeFlagRow(flagArray: Column): Column = forall(flagArray, x => x)

  /** Two-tier bin statistic (the row_mapper docstring semantics,
    * time_and_channel_mapping.py:255-308 + docstring 66-120): average of
    * the UNFLAGGED samples when the bin has any, otherwise the average of
    * the flagged ones. `value` and the guard are evaluated per row inside
    * one aggregation — no window needed. */
  def twoTierAvg(value: Column, flagRow: Column): Column = {
    val nOk = sum(when(!flagRow, 1L))
    when(nOk > 0, sum(when(!flagRow, value)) / nOk)
      .otherwise(sum(value) / count(lit(1)))
  }

  /** Two-tier sum (interval/exposure accumulate over the same tier the
    * average uses). */
  def twoTierSum(value: Column, flagRow: Column): Column =
    when(sum(when(!flagRow, 1L)) > 0, sum(when(!flagRow, value)))
      .otherwise(sum(value))
}
