package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
             maxBinSecs: Double, nchan: Int, fracBw: Double): DataFrame =
    mapperWithPayload(df, maxUvwDist, decorrTol, maxBinSecs, nchan, fracBw, Nil)
      .select("row_id", "ant1", "ant2", "bin", "nchan_out")

  /** The same greedy binner, carrying `carry` payload columns through the
    * one baseline shuffle — downstream averages (a09/a10) then need NO
    * join-back of an orders-sized relation on row_id (which cost a second
    * full window + a sort-merge join at bench time; at cluster scale it
    * doubled the shuffled bytes). Output: row_id, ant1, ant2, time, ivl,
    * u, v, w, carry..., bin, nchan_out. */
  def mapperWithPayload(df: DataFrame, maxUvwDist: Double, decorrTol: Double,
                        maxBinSecs: Double, nchan: Int, fracBw: Double,
                        carry: Seq[String]): DataFrame = {
    val base = Seq(
      col("row_id").cast("long").as("row_id"),
      col("ant1").cast("long").as("ant1"),
      col("ant2").cast("long").as("ant2"),
      col("time").cast("double").as("time"),
      col("ivl").cast("double").as("ivl"),
      col("u").cast("double").as("u"),
      col("v").cast("double").as("v"),
      col("w").cast("double").as("w"))
    val sel = df.select(base ++ carry.map(col): _*)
    val outSchema = StructType(sel.schema.fields ++
      Seq(StructField("bin", LongType, nullable = false),
        StructField("nchan_out", LongType, nullable = false)))
    val width = sel.schema.size
    // precomputed per-(nchan_out candidate) thresholds don't help here:
    // the factor snap is a ≤nchan probe over scalars, negligible per row
    sel.repartition(col("ant1"), col("ant2"))
      .sortWithinPartitions(col("ant1"), col("ant2"), col("time"), col("row_id"))
      .mapPartitions { it =>
        var curA1 = -1L; var curA2 = -1L
        var bin = -1L
        var acc = 0.0
        var lastTime = Double.NaN
        var u0 = 0.0; var v0 = 0.0; var w0 = 0.0
        it.map { r =>
          val a1 = r.getLong(1); val a2 = r.getLong(2)
          val time = r.getDouble(3); val ivl = r.getDouble(4)
          val u = r.getDouble(5); val v = r.getDouble(6); val w = r.getDouble(7)
          if (a1 != curA1 || a2 != curA2) {
            curA1 = a1; curA2 = a2
            bin = -1L; acc = 0.0; lastTime = Double.NaN
            u0 = 0.0; v0 = 0.0; w0 = 0.0
          }
          if (lastTime != time) {
            val du = u - u0; val dv = v - v0; val dw = w - w0
            val decorr = sinc(
              math.Pi * math.sqrt(du * du + dv * dv + dw * dw) / maxUvwDist)
            if (bin < 0L || acc + ivl > maxBinSecs || decorr < decorrTol) {
              bin += 1L; acc = 0.0; u0 = u; v0 = v; w0 = w
            }
            acc += ivl
            lastTime = time
          }
          val blLen = math.sqrt(u * u + v * v + w * w)
          val psi = math.Pi * blLen / maxUvwDist * fracBw
          val f = (1 to nchan)
            .find(k => nchan % k == 0 && sinc(psi * (nchan / k) / 2.0) >= decorrTol)
            .getOrElse(nchan)
          val out = new Array[Any](width + 2)
          var i = 0
          while (i < width) { out(i) = r.get(i); i += 1 }
          out(width) = bin
          out(width + 1) = f.toLong
          Row.fromSeq(out.toIndexedSeq)
        }
      }(Encoders.row(outSchema))
  }
}
