package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spectral models (SURVEY §2.2 M1/M2) as Catalyst column expressions.
  *
  * M1: /root/reference/africanus/model/spectral/spec_model.py:11-54 —
  * per-source flux vs frequency with 'std' power-law, 'log'/'log10'
  * polynomial-in-log bases.
  * M2: /root/reference/africanus/model/wsclean/spec_model.py:9-27 —
  * WSClean ordinary / logarithmic polynomials.
  *
  * Coefficients arrive as a Seq[Column] (one per spectral index term);
  * polynomial powers are expanded by repeated multiplication so the
  * ordinary variants are pure add/multiply arithmetic (bit-deterministic
  * across engines — no pow()).
  */
object Spectral {

  /** x^k by repeated multiplication (k >= 1), keeping determinism and
    * codegen-friendliness (no transcendental pow for integer exponents). */
  private def ipow(x: Column, k: Int): Column =
    Iterator.fill(k)(x).reduce(_ * _)

  /** M1 'std' base: S(ν) = S0 · Π_i (ν/ν0)^spi_i
    * (spec_model.py:37-40). */
  def spectralModelStd(stokes: Column, spi: Seq[Column],
                       refFreq: Column, freq: Column): Column = {
    val ratio = freq / refFreq
    spi.foldLeft(stokes)((acc, a) => acc * pow(ratio, a))
  }

  /** M1 'log' base: S(ν) = S0 · exp(Σ_i spi_i · ln(ν/ν0)^(i+1))
    * (spec_model.py:41-45). */
  def spectralModelLog(stokes: Column, spi: Seq[Column],
                       refFreq: Column, freq: Column): Column = {
    val lr = log(freq / refFreq)
    val s = spi.zipWithIndex
      .map { case (a, idx) => a * ipow(lr, idx + 1) }
      .reduce(_ + _)
    stokes * exp(s)
  }

  /** M1 'log10' base: S(ν) = S0 · 10^(Σ_i spi_i · log10(ν/ν0)^(i+1))
    * (spec_model.py:46-49). */
  def spectralModelLog10(stokes: Column, spi: Seq[Column],
                         refFreq: Column, freq: Column): Column = {
    val lr = log10(freq / refFreq)
    val s = spi.zipWithIndex
      .map { case (a, idx) => a * ipow(lr, idx + 1) }
      .reduce(_ + _)
    stokes * pow(lit(10.0), s)
  }

  /** M2 ordinary: S(ν) = I + Σ_i c_i ((ν/ν0) - 1)^(i+1)
    * (wsclean/spec_model.py:9-17). Pure arithmetic — exact. */
  def wscleanOrdinary(flux: Column, coeffs: Seq[Column],
                      refFreq: Column, freq: Column): Column = {
    val t = freq / refFreq - lit(1.0)
    coeffs.zipWithIndex
      .foldLeft(flux) { case (acc, (c, idx)) => acc + c * ipow(t, idx + 1) }
  }

  /** M2 logarithmic: S(ν) = I · exp(Σ_i c_i · ln(ν/ν0)^(i+1))
    * (wsclean/spec_model.py:20-27). */
  def wscleanLog(flux: Column, coeffs: Seq[Column],
                 refFreq: Column, freq: Column): Column =
    spectralModelLog(flux, coeffs, refFreq, freq)

  /** M2 dispatch on per-source log_poly flag (wsclean_predict uses this per
    * row — rime/wsclean_predict.py:33-47). */
  def wscleanSpectra(flux: Column, coeffs: Seq[Column], logPoly: Column,
                     refFreq: Column, freq: Column): Column =
    when(logPoly, wscleanLog(flux, coeffs, refFreq, freq))
      .otherwise(wscleanOrdinary(flux, coeffs, refFreq, freq))
}
