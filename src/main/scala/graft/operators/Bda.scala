package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Baseline-dependent averaging (BDA) binner — SURVEY §2.5 A8
  * (`bda_mapper`, africanus/averaging/bda_mapping.py:62-277).
  *
  * Bin-close rule is the reference Binner.add_row's (bda_mapping.py:
  * 111-186): per baseline, rows sorted by time greedily extend a bin; a
  * row is REFUSED (closing the bin) when either
  *   - the fringe-decorrelation estimate sin(Ψ)/Ψ drops below sinc(D),
  *     Ψ = |Δuvw|·ν_max·sin(|lm_max|)·π/c + 1e-8 with Δuvw measured from
  *     the bin's STARTING row (long/fast baselines close earlier), or
  *   - the edge-to-edge span (time+ivl/2 − (time_start−ivl_start/2))
  *     exceeds `timeBinSecs`.
  * Auto-correlated baselines take the Δuvw = 0 fast path and never close
  * on decorrelation.
  *
  * Per-row output channel count `nchan_out` is the decorrelation-snapped
  * factorization of `nchan` (bda_mapping.py:192-260): the smallest factor
  * whose channel-group decorrelation sinc(ψ·g/2) still meets `chanTol`,
  * ψ = π·|uvw|/maxUvwDist·fracBw.
  *
  * Spark shape: identical to Sessionize — one repartition on the baseline
  * key, sortWithinPartitions, then a constant-memory streaming
  * mapPartitions scan (per-key state is a handful of scalars; no per-group
  * array ever materializes), perfectly parallel across baselines.
  */
object Bda {

  /** Speed of light (africanus/constants.py lightspeed). */
  val C = 299792458.0

  /** Reference parameterization of the binner (see object doc).
    * `decorrelation` is the D of the sinc(D) close threshold; `maxLm` and
    * `maxChanFreq` set the fringe-rate scale; `maxUvwDist`/`chanTol`/
    * `fracBw` parameterize the channel-factor snap. */
  final case class Config(
      decorrelation: Double,
      maxLm: Double,
      maxChanFreq: Double,
      timeBinSecs: Double,
      maxUvwDist: Double,
      chanTol: Double,
      nchan: Int,
      fracBw: Double,
      /** Lower bound on the per-row output channel count, snapped UP to
        * the next factor of `nchan` (bda_mapper's min_nchan,
        * bda_mapping.py:294-310); 1 = no floor. */
      minNchan: Int = 1)

  private def sinc(x: Double): Double = if (x == 0.0) 1.0 else math.sin(x) / x

  /** Input columns: row_id, ant1, ant2, time, ivl, u, v, w.
    * Output: (row_id, ant1, ant2, bin, nchan_out). */
  def mapper(df: DataFrame, cfg: Config): DataFrame =
    mapperWithPayload(df, cfg, Nil)
      .select("row_id", "ant1", "ant2", "bin", "nchan_out")

  /** The greedy binner, carrying `carry` payload columns through the one
    * baseline shuffle — downstream averages (a09/a10) then need NO
    * join-back of an orders-sized relation on row_id (which cost a second
    * full window + a sort-merge join at bench time; at cluster scale it
    * doubled the shuffled bytes). Output: row_id, ant1, ant2, time, ivl,
    * u, v, w, carry..., bin, nchan_out. */
  def mapperWithPayload(df: DataFrame, cfg: Config,
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
    // sinc(D) threshold: numpy.sinc is the normalized sin(πx)/(πx)
    val closeThresh = sinc(math.Pi * cfg.decorrelation)
    val fringeScale = cfg.maxChanFreq * math.sin(math.abs(cfg.maxLm)) * math.Pi / C
    sel.repartition(col("ant1"), col("ant2"))
      .sortWithinPartitions(col("ant1"), col("ant2"), col("time"), col("row_id"))
      .mapPartitions { it =>
        var curA1 = -1L; var curA2 = -1L
        var bin = -1L
        // bin-start row state (time/interval lower edge + uvw reference)
        var tsLow = 0.0
        var u0 = 0.0; var v0 = 0.0; var w0 = 0.0
        it.map { r =>
          val a1 = r.getLong(1); val a2 = r.getLong(2)
          val time = r.getDouble(3); val ivl = r.getDouble(4)
          val u = r.getDouble(5); val v = r.getDouble(6); val w = r.getDouble(7)
          if (a1 != curA1 || a2 != curA2) {
            curA1 = a1; curA2 = a2; bin = -1L
          }
          if (bin < 0L) {
            bin = 0L; tsLow = time - ivl / 2.0; u0 = u; v0 = v; w0 = w
          } else if (a1 != a2) { // auto-corr fast path: never closes
            val du = u - u0; val dv = v - v0; val dw = w - w0
            val halfPsi =
              math.sqrt(du * du + dv * dv + dw * dw) * fringeScale + 1.0e-8
            val blDecorr = math.sin(halfPsi) / halfPsi
            val dt = time + ivl / 2.0 - tsLow
            if (blDecorr < closeThresh || dt > cfg.timeBinSecs) {
              bin += 1L; tsLow = time - ivl / 2.0; u0 = u; v0 = v; w0 = w
            }
          }
          val blLen = math.sqrt(u * u + v * v + w * w)
          val psi = math.Pi * blLen / cfg.maxUvwDist * cfg.fracBw
          val f = (1 to cfg.nchan)
            .find(k => k >= cfg.minNchan && cfg.nchan % k == 0 &&
              sinc(psi * (cfg.nchan / k) / 2.0) >= cfg.chanTol)
            .getOrElse(cfg.nchan)
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
