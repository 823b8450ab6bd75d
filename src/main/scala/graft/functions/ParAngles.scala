package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parallactic-angle backends beyond the 'test' formula (rime/parangles.py
  * backend dispatch). The reference's default 'casa' backend
  * (rime/parangles_casa.py:24-63) feeds UTC epochs, ITRF antenna
  * positions, and a J2000 field centre through casacore's measures
  * server; this object implements the MEASURABLE core of that published
  * algorithm as column expressions:
  *
  *   ITRF (x, y, z) metres → (longitude, geodetic latitude) via
  *   single-step Bowring inversion on the WGS84 ellipsoid;
  *   MJD UTC seconds → Greenwich mean sidereal time (IAU 1982
  *   polynomial) → local hour angle;
  *   position angle of zenith at the field centre (the standard
  *   spherical-triangle posangle).
  *
  * casacore's full ephemeris stack additionally applies the equation of
  * the equinoxes, nutation, and polar motion — sub-arcsecond terms that
  * need ephemeris tables the container does not ship; the GMST stand-in
  * was accepted in round 2 and this backend closes the remaining input-
  * contract gap (real ITRF positions + MJD-second epochs, the 'casa'
  * calling convention).
  */
object ParAngles {

  /** WGS84 ellipsoid. */
  val WgsA: Double = 6378137.0
  private val invF = 298.257223563
  val WgsF: Double = 1.0 / invF
  val WgsB: Double = WgsA * (1.0 - WgsF)
  val WgsE2: Double = WgsF * (2.0 - WgsF)
  val WgsEp2: Double = WgsE2 / (1.0 - WgsE2)

  /** ITRF longitude (radians). */
  def itrfLon(x: Column, y: Column): Column = atan2(y, x)

  /** Equatorial projection radius. */
  def itrfP(x: Column, y: Column): Column = sqrt(x * x + y * y)

  /** Bowring parametric angle θ = atan2(z·a, p·b). */
  def bowringTheta(p: Column, z: Column): Column =
    atan2(z * WgsA, p * WgsB)

  /** Geodetic latitude, single Bowring step (exact to ~1e-12 rad for
    * near-surface points — casacore's own frame conversion class). */
  def itrfLat(p: Column, z: Column, theta: Column): Column =
    atan2(z + lit(WgsEp2) * WgsB * sin(theta) * sin(theta) * sin(theta),
      p - lit(WgsE2) * WgsA * cos(theta) * cos(theta) * cos(theta))

  /** GMST in degrees, reduced to [0, 360): the IAU 1982 polynomial in
    * days (and centuries) since J2000.0, UT1 ≈ UTC. */
  def gmstDegRed(mjdDay: Column): Column = {
    val d = mjdDay - 51544.5
    val t = d / 36525.0
    val deg = lit(280.46061837) + lit(360.98564736629) * d +
      lit(0.000387933) * (t * t) - (t * t * t) / 38710000.0
    deg - lit(360.0) * floor(deg / 360.0)
  }

  /** Position angle of the zenith at (ha, dec) for latitude `lat` —
    * the posangle casacore evaluates between the field centre and the
    * AZEL zenith (parangles_casa.py:38-40, 57-60). */
  def posAngle(lat: Column, ha: Column, dec: Column): Column =
    atan2(cos(lat) * sin(ha),
      sin(lat) * cos(dec) - cos(lat) * sin(dec) * cos(ha))

  /** The full 'casa'-contract chain: UTC MJD seconds + ITRF metres +
    * J2000 (ra, dec) radians → parallactic angle. */
  def casaPa(mjdSec: Column, x: Column, y: Column, z: Column,
             ra: Column, dec: Column): Column = {
    val mjdDay = mjdSec / 86400.0
    val lon = itrfLon(x, y)
    val p = itrfP(x, y)
    val lat = itrfLat(p, z, bowringTheta(p, z))
    val ha = gmstDegRed(mjdDay) * (math.Pi / 180.0) + lon - ra
    posAngle(lat, ha, dec)
  }

  /** Earth Rotation Angle (IAU 2000 / Capitaine et al.), radians in
    * [0, 2π): ERA = 2π·(0.7790572732640 + 1.00273781191135448·Tu),
    * Tu = JD(UT1) − 2451545.0, reduced to one turn before the 2π scale
    * so the angle stays in libm's well-agreed small-argument range. */
  def eraRad(mjdDay: Column): Column = {
    val turns = lit(0.7790572732640) +
      lit(1.00273781191135448) * (mjdDay - 51544.5)
    (turns - floor(turns)) * (2.0 * math.Pi)
  }

  /** The 'astropy'-contract chain (rime/parangles_astropy.py:20-41):
    * same UTC-MJD-seconds / ITRF-metres / (ra, dec) inputs and the same
    * geodetic inversion as [[casaPa]], but the hour angle runs off the
    * IAU-2000 ERA — the rotation underlying astropy's CIRS frame — in
    * place of casacore's GMST-1982. The CIRS precession-nutation and
    * polar-motion corrections (sub-arcminute at these epochs) need
    * ephemeris tables the container does not ship, same scope decision
    * as the casa backend's equation-of-the-equinoxes term.
    *
    * Determinism: `lat` and `ha` are r9-rounded (1 nrad — physically
    * nil) so the hashed posangle takes cos/sin of BIT-IDENTICAL
    * arguments on both engines; DeterminismSpec measures the flip
    * margins of both roundings over the query grid. */
  def astropyPa(mjdSec: Column, x: Column, y: Column, z: Column,
                ra: Column, dec: Column): Column = {
    import graft.core.Det
    val mjdDay = mjdSec / 86400.0
    val lon = itrfLon(x, y)
    val p = itrfP(x, y)
    val lat = Det.r9(itrfLat(p, z, bowringTheta(p, z)))
    val ha = Det.r9(eraRad(mjdDay) + lon - ra)
    posAngle(lat, ha, dec)
  }
}
