package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Coordinate transforms (SURVEY §2.3, C1/C2).
  *
  * Direction cosines relative to a phase centre, as pure Catalyst column
  * expressions (codegen'd trig; no UDFs). Semantics match
  * /root/reference/africanus/coordinates/coordinates.py:28-118 (radec_to_lmn)
  * and :121-197 (lmn_to_radec / lm_to_radec).
  */
object Coordinates {

  final case class Lmn(l: Column, m: Column, n: Column)

  /** (ra, dec) -> (l, m, n) about phase centre (ra0, dec0).
    * coordinates.py:46-71: l = cos(dec) sin(ra-ra0),
    * m = sin(dec) cos(dec0) - cos(dec) sin(dec0) cos(ra-ra0),
    * n = sqrt(1 - l^2 - m^2). */
  def radecToLmn(ra: Column, dec: Column, ra0: Column, dec0: Column): Lmn = {
    val l = cos(dec) * sin(ra - ra0)
    val m = sin(dec) * cos(dec0) - cos(dec) * sin(dec0) * cos(ra - ra0)
    val n = sqrt(lit(1.0) - l * l - m * m)
    Lmn(l, m, n)
  }

  /** n = sqrt(1 - l^2 - m^2), clamped at 0 below the horizon
    * (africanus/rime/phase.py:43-44 does the same clamp). */
  def nFromLm(l: Column, m: Column): Column =
    sqrt(greatest(lit(0.0), lit(1.0) - l * l - m * m))

  /** (l, m, n) -> (ra, dec); coordinates.py:121-160:
    * dec = arcsin(m cos(dec0) + n sin(dec0)),
    * ra = ra0 + arctan(l / (n cos(dec0) - m sin(dec0))). */
  def lmnToRadec(l: Column, m: Column, n: Column,
                 ra0: Column, dec0: Column): (Column, Column) = {
    val dec = asin(m * cos(dec0) + n * sin(dec0))
    val ra = ra0 + atan(l / (n * cos(dec0) - m * sin(dec0)))
    (ra, dec)
  }

  /** (l, m) -> (ra, dec) deriving n; coordinates.py:163-197. */
  def lmToRadec(l: Column, m: Column,
                ra0: Column, dec0: Column): (Column, Column) =
    lmnToRadec(l, m, nFromLm(l, m), ra0, dec0)
}
