package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.ParAngles

/** The 'casa'-backend parallactic-angle chain (rime/parangles_casa.py
  * calling convention): geodetic inversion correctness, a scalar mirror
  * of the full chain, the meridian fixpoint, and the r04c hash-surface
  * margins. */
class CasaParanglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def geodeticToItrf(lat: Double, lon: Double, h: Double)
      : (Double, Double, Double) = {
    // published WGS84 forward transform — the independent direction
    val n = ParAngles.WgsA /
      math.sqrt(1.0 - ParAngles.WgsE2 * math.sin(lat) * math.sin(lat))
    ((n + h) * math.cos(lat) * math.cos(lon),
      (n + h) * math.cos(lat) * math.sin(lon),
      (n * (1.0 - ParAngles.WgsE2) + h) * math.sin(lat))
  }

  test("Bowring single-step inverts the WGS84 forward transform to ~1e-11 rad") {
    val cases = Seq(
      (0.6, -2.1, 0.0), (-0.54, 0.35, 1000.0), (0.0, 1.0, 0.0),
      (1.4, 2.9, 2500.0), (-1.2, -0.1, 0.0))
    val df = cases.map(c => geodeticToItrf(c._1, c._2, c._3))
      .toDF("x", "y", "z")
      .select(
        ParAngles.itrfLon(col("x"), col("y")).as("lon"),
        ParAngles.itrfLat(ParAngles.itrfP(col("x"), col("y")), col("z"),
          ParAngles.bowringTheta(ParAngles.itrfP(col("x"), col("y")),
            col("z"))).as("lat"))
      .collect()
    for (((latIn, lonIn, h), row) <- cases.zip(df)) {
      assert(math.abs(row.getDouble(0) - lonIn) < 1e-12,
        s"lon mismatch at ($latIn, $lonIn, $h)")
      // single Bowring step: ~1e-11 rad near the surface, still ≤1e-9
      // (~6 mm) at aircraft altitudes
      assert(math.abs(row.getDouble(1) - latIn) < 1e-9,
        s"lat mismatch at ($latIn, $lonIn, $h): got ${row.getDouble(1)}")
    }
  }

  test("column chain matches a plain-Scala mirror of the published algorithm") {
    def scalarPa(mjdSec: Double, x: Double, y: Double, z: Double,
                 ra: Double, dec: Double): Double = {
      val mjdDay = mjdSec / 86400.0
      val lon = math.atan2(y, x)
      val p = math.sqrt(x * x + y * y)
      val th = math.atan2(z * ParAngles.WgsA, p * ParAngles.WgsB)
      val lat = math.atan2(
        z + ParAngles.WgsEp2 * ParAngles.WgsB * math.pow(math.sin(th), 3),
        p - ParAngles.WgsE2 * ParAngles.WgsA * math.pow(math.cos(th), 3))
      val d = mjdDay - 51544.5
      val t = d / 36525.0
      val deg0 = 280.46061837 + 360.98564736629 * d +
        0.000387933 * (t * t) - (t * t * t) / 38710000.0
      val gdeg = deg0 - 360.0 * math.floor(deg0 / 360.0)
      val ha = gdeg * (math.Pi / 180.0) + lon - ra
      math.atan2(math.cos(lat) * math.sin(ha),
        math.sin(lat) * math.cos(dec) -
          math.cos(lat) * math.sin(dec) * math.cos(ha))
    }
    val fixtures = Seq(
      (5084553600.0, -1601710.0, -5042006.0, 3554880.0, 0.25, -0.38),
      (5084580600.0, -1601646.0, -5041878.0, 3554912.0, 0.25, -0.38),
      (5084553600.0, 5109360.0, 2006852.0, -3238948.0, 1.2, -0.7))
    val got = fixtures.toDF("t", "x", "y", "z", "ra", "dec")
      .select(ParAngles.casaPa(col("t"), col("x"), col("y"), col("z"),
        col("ra"), col("dec")).as("pa"))
      .collect().map(_.getDouble(0))
    for ((f, g) <- fixtures.zip(got)) {
      val e = scalarPa(f._1, f._2, f._3, f._4, f._5, f._6)
      assert(math.abs(g - e) < 1e-12, s"pa mismatch for $f: $g vs $e")
    }
  }

  test("meridian fixpoint: ha = 0 gives pa = 0 (source south of zenith)") {
    // lat > dec ⇒ the source transits south of zenith ⇒ posangle 0
    val pa = Seq((0.6, 0.0, -0.38)).toDF("lat", "ha", "dec")
      .select(ParAngles.posAngle(col("lat"), col("ha"), col("dec")).as("pa"))
      .head.getDouble(0)
    assert(pa === 0.0)
  }

  test("r04c hashed surface: pa·1e6 sits far from every rounding boundary") {
    val q = SparkEntry.queries("r04c_parallactic_casa")
    for (d <- Seq(TestSpark.sf, "/root/testdata/sf0.01")) {
      // rebuild unrounded
      val mjdSec = lit(5084553600e0) + col("time_index") * 5400e0
      val x = lit(-1601710e0) + col("ant") * 64e0
      val y = lit(-5042006e0) + col("ant") * 128e0
      val z = lit(3554880e0) + col("ant") * 32e0
      val raw = graft.queries.SyntheticMs.paTable(spark, d)
        .select(ParAngles.casaPa(mjdSec, x, y, z,
          lit(25e-2), lit(-38e-2)).as("pa"))
      val m = raw
        .select(abs(abs(col("pa") * 1e6 - floor(col("pa") * 1e6)) - 0.5).as("t"))
        .agg(min(col("t"))).head.getDouble(0)
      info(s"$d: r04c min |frac(pa·1e6)−.5| = $m (flip window ~1e-12)")
      assert(m > 1e-6, s"r04c pa within 1e-6 of an r6 boundary at $d")
      assert(q(spark, d).count() === 112)
    }
  }
}
