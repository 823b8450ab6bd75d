package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.{Cx, CxCol}

/** Phase delay (K term) — SURVEY §2.1 R1.
  *
  * e^{±2πi (u l + v m + w (n-1)) f / c}, n = sqrt(1 - l^2 - m^2) clamped at
  * 0; 'fourier' uses the minus sign, 'casa' the plus sign. Semantics match
  * /root/reference/africanus/rime/phase.py:11-63. Pure column expressions:
  * at cluster scale this runs inside whole-stage codegen over the
  * source x row x chan expansion with the source table broadcast.
  */
object Phase {
  /** Speed of light, m/s (africanus/constants.py). */
  val C: Double = 299792458.0

  /** Real phase -2π (u l + v m + w (n-1)) / c — per (source, row); multiply
    * by frequency per channel (phase.py:44-51 does the same split). */
  def realPhase(l: Column, m: Column,
                u: Column, v: Column, w: Column,
                convention: String = "fourier"): Column = {
    val k = convention match {
      case "fourier" => -2.0 * math.Pi / C
      case "casa"    => 2.0 * math.Pi / C
      case other => throw new IllegalArgumentException(
        s"convention '$other' not in ('fourier', 'casa')")
    }
    val n = Coordinates.nFromLm(l, m) - lit(1.0)
    lit(k) * (u * l + v * m + w * n)
  }

  /** Full complex phase for one (source, row, chan) cell. */
  def phaseDelay(l: Column, m: Column,
                 u: Column, v: Column, w: Column,
                 freq: Column, convention: String = "fourier"): CxCol =
    Cx.expi(realPhase(l, m, u, v, w, convention) * freq)
}
