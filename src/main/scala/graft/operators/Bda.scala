package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Baseline-dependent averaging (BDA) binner — SURVEY §2.5 A8
  * (`bda_mapper`, africanus/averaging/bda_mapping.py:62-277).
  *
  * Semantics kept from the reference: per baseline, rows sorted by time
  * are greedily admitted to a bin while (a) the accumulated interval stays
  * within `maxBinSecs` and (b) the decorrelation estimate
  * sinc(π·|Δuvw|/maxUvwDist) stays above `decorrTol` (Δuvw measured from
  * the bin's opening row — long/fast baselines close bins earlier).
  * Per-row output channel count `nchan_out` is the decorrelation-snapped
  * factorization of `nchan` (bda_mapping.py:192-260): the smallest factor
  * whose channel-group decorrelation sinc(ψ·g/2) still meets the
  * tolerance, ψ = π·|uvw|/maxUvwDist·fracBw.
  *
  * The uvw speed model is simplified (uvw deltas in units of maxUvwDist
  * instead of the full Atemkeng sinc² fit); the greedy structure, the
  * dual close conditions, and the factor snapping are the reference's.
  *
  * Spark shape: identical to Sessionize — one repartition on the baseline
  * key, sortWithinPartitions, then a constant-memory streaming
  * mapPartitions scan (per-key state is a handful of scalars; no per-group
  * array ever materializes), perfectly parallel across baselines.
  */
object Bda {

  private def sinc(x: Double): Double = if (x == 0.0) 1.0 else math.sin(x) / x

  /** Input columns: row_id, ant1, ant2, time, ivl, u, v, w.
    * Output: (row_id, ant1, ant2, bin, nchan_out). */
  def mapper(df: DataFrame, maxUvwDist: Double, decorrTol: Double,
             maxBinSecs: Double, nchan: Int, fracBw: Double): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col("row_id").cast("long"), col("ant1").cast("long"),
        col("ant2").cast("long"), col("time").cast("double"),
        col("ivl").cast("double"), col("u").cast("double"),
        col("v").cast("double"), col("w").cast("double"))
      .as[(Long, Long, Long, Double, Double, Double, Double, Double)]
      .repartition(col("ant1"), col("ant2"))
      .sortWithinPartitions(col("ant1"), col("ant2"), col("time"), col("row_id"))
      .mapPartitions { it =>
        var curA1 = -1L; var curA2 = -1L
        var bin = -1L
        var acc = 0.0
        var lastTime = Double.NaN
        var u0 = 0.0; var v0 = 0.0; var w0 = 0.0
        it.map { r =>
          if (r._2 != curA1 || r._3 != curA2) {
            curA1 = r._2; curA2 = r._3
            bin = -1L; acc = 0.0; lastTime = Double.NaN
            u0 = 0.0; v0 = 0.0; w0 = 0.0
          }
          if (lastTime != r._4) {
            val du = r._6 - u0; val dv = r._7 - v0; val dw = r._8 - w0
            val decorr = sinc(
              math.Pi * math.sqrt(du * du + dv * dv + dw * dw) / maxUvwDist)
            if (bin < 0L || acc + r._5 > maxBinSecs || decorr < decorrTol) {
              bin += 1L; acc = 0.0; u0 = r._6; v0 = r._7; w0 = r._8
            }
            acc += r._5
            lastTime = r._4
          }
          val blLen = math.sqrt(r._6 * r._6 + r._7 * r._7 + r._8 * r._8)
          val psi = math.Pi * blLen / maxUvwDist * fracBw
          val f = (1 to nchan)
            .find(k => nchan % k == 0 && sinc(psi * (nchan / k) / 2.0) >= decorrTol)
            .getOrElse(nchan)
          (r._1, r._2, r._3, bin, f.toLong)
        }
      }
      .toDF("row_id", "ant1", "ant2", "bin", "nchan_out")
  }
}
