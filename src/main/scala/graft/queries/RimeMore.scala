package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Det
import graft.core.Det.r6Sql
import SyntheticMs._

/** Remaining RIME-family kernels — SURVEY §2.1 R4/R6/R10, §2.3 C2 — as
  * pure column-expression queries over the synthetic dim tables (all are
  * shuffle-free broadcast-expansion projections at cluster scale).
  */
object RimeMore {

  /** Shared Spark-expr/oracle text for r04b: pa from the IAU 1982 GMST
    * polynomial. Epoch: mjd = 58849 + time_index/80 days; lon/lat per
    * antenna; target at (ra, dec) = (0.25, −0.38) rad. */
  val paGmstSql: String = {
    val mjd = "(58849e0 + time_index / 8e1)"
    val d = s"($mjd - 515445e-1)" // days since J2000.0
    val t = s"($d / 36525e0)"
    val gmstDeg = s"(28046061837e-8 + 36098564736629e-11 * $d" +
      s" + 387933e-9 * ($t*$t) - ($t*$t*$t) / 3871e4)"
    val gRed = s"($gmstDeg - 36e1 * floor($gmstDeg / 36e1))"
    val lon = "(-8e-2 + ant * 1e-2)"
    val lat = "(35e-2 + ant * 25e-3)"
    val ha = s"($gRed * pi() / 18e1 + $lon - 25e-2)"
    s"atan2(cos($lat)*sin($ha), " +
      s"sin($lat)*cos(-38e-2) - cos($lat)*sin(-38e-2)*cos($ha))"
  }

  /** Oracle text for r04c: the 'casa'-backend chain of
    * functions.ParAngles.casaPa as chained CTEs over a (time_index, ant)
    * grid with dyadic-integer ITRF fixture antennas and integer MJD-second
    * epochs. Constants in e-notation (DuckDB DECIMAL pitfall); the WGS84
    * derived constants are spelled as the same IEEE expressions the JVM
    * folds. */
  def paCasaOracleSql(nTime: Int = 16, nAnt: Int = 7): String = {
    val f = "(1e0 / 298257223563e-9)"
    val b = s"(6378137e0 * (1e0 - $f))"
    val e2 = s"($f * (2e0 - $f))"
    val ep2 = s"($e2 / (1e0 - $e2))"
    s"""WITH pat AS (
       |  SELECT CAST(t.n_nationkey AS BIGINT) AS time_index,
       |    CAST(a.n_nationkey AS BIGINT) AS ant
       |  FROM nation t, nation a
       |  WHERE t.n_nationkey < $nTime AND a.n_nationkey < $nAnt),
       |geo AS (
       |  SELECT time_index, ant,
       |    -1601710e0 + ant * 64e0 AS x,
       |    -5042006e0 + ant * 128e0 AS y,
       |    3554880e0 + ant * 32e0 AS z,
       |    (5084553600e0 + time_index * 5400e0) / 86400e0 AS mjd_day
       |  FROM pat),
       |g2 AS (
       |  SELECT *, atan2(y, x) AS lon, sqrt(x*x + y*y) AS p FROM geo),
       |g3 AS (
       |  SELECT *, atan2(z * 6378137e0, p * $b) AS th FROM g2),
       |g4 AS (
       |  SELECT *,
       |    atan2(z + $ep2 * $b * sin(th)*sin(th)*sin(th),
       |          p - $e2 * 6378137e0 * cos(th)*cos(th)*cos(th)) AS lat,
       |    28046061837e-8 + 36098564736629e-11 * (mjd_day - 515445e-1)
       |      + 387933e-9 * (((mjd_day - 515445e-1) / 36525e0)
       |                     * ((mjd_day - 515445e-1) / 36525e0))
       |      - (((mjd_day - 515445e-1) / 36525e0)
       |         * ((mjd_day - 515445e-1) / 36525e0)
       |         * ((mjd_day - 515445e-1) / 36525e0)) / 3871e4 AS gdeg
       |  FROM g3),
       |g5 AS (
       |  SELECT *,
       |    (gdeg - 36e1 * floor(gdeg / 36e1)) * (pi() / 18e1)
       |      + lon - 25e-2 AS ha
       |  FROM g4)
       |SELECT time_index, ant,
       |  ${r6Sql("atan2(cos(lat)*sin(ha), " +
           "sin(lat)*cos(-38e-2) - cos(lat)*sin(-38e-2)*cos(ha))")} AS pa
       |FROM g5""".stripMargin
  }

  /** Oracle for r04d: the astropy-convention chain — identical geodetic
    * inversion to [[paCasaOracleSql]], hour angle from the IAU-2000 ERA,
    * lat/ha r9-rounded before the posangle (mirrors
    * ParAngles.astropyPa). */
  def paEraOracleSql(nTime: Int = 16, nAnt: Int = 7): String = {
    val f = "(1e0 / 298257223563e-9)"
    val b = s"(6378137e0 * (1e0 - $f))"
    val e2 = s"($f * (2e0 - $f))"
    val ep2 = s"($e2 / (1e0 - $e2))"
    s"""WITH pat AS (
       |  SELECT CAST(t.n_nationkey AS BIGINT) AS time_index,
       |    CAST(a.n_nationkey AS BIGINT) AS ant
       |  FROM nation t, nation a
       |  WHERE t.n_nationkey < $nTime AND a.n_nationkey < $nAnt),
       |geo AS (
       |  SELECT time_index, ant,
       |    -1601710e0 + ant * 64e0 AS x,
       |    -5042006e0 + ant * 128e0 AS y,
       |    3554880e0 + ant * 32e0 AS z,
       |    (5084553600e0 + time_index * 5400e0) / 86400e0 AS mjd_day
       |  FROM pat),
       |g2 AS (
       |  SELECT *, atan2(y, x) AS lon, sqrt(x*x + y*y) AS p FROM geo),
       |g3 AS (
       |  SELECT *, atan2(z * 6378137e0, p * $b) AS th FROM g2),
       |g4 AS (
       |  SELECT *,
       |    atan2(z + $ep2 * $b * sin(th)*sin(th)*sin(th),
       |          p - $e2 * 6378137e0 * cos(th)*cos(th)*cos(th)) AS lat0,
       |    7790572732640e-13
       |      + 100273781191135448e-17 * (mjd_day - 515445e-1) AS turns
       |  FROM g3),
       |g5 AS (
       |  SELECT *,
       |    round(lat0 * 1e9) / 1e9 AS lat,
       |    round(((turns - floor(turns)) * (2e0 * pi()) + lon - 25e-2)
       |          * 1e9) / 1e9 AS ha
       |  FROM g4)
       |SELECT time_index, ant,
       |  ${r6Sql("atan2(cos(lat)*sin(ha), " +
           "sin(lat)*cos(-38e-2) - cos(lat)*sin(-38e-2)*cos(ha))")} AS pa
       |FROM g5""".stripMargin
  }

  /** Exact integer Hermite coefficient rows: H_n(x) = Σ_k c(n)(k)·x^k for
    * the physicists' polynomials H0 = 1, H1 = 2x,
    * H_n = 2x·H_{n−1} − 2(n−1)·H_{n−2} — the recursion the reference
    * evaluates per call (model/shape/shapelets.py:10-16). Computing the
    * COEFFICIENTS once (exact longs, |c| < 2^53 through n = 15) and
    * emitting one Horner form per order is the Zernike-generator idiom
    * (functions/Zernike.scala:71): arbitrary order with a fixed, shared
    * expression text both engines evaluate bit-identically. */
  def hermiteCoeffs(nmax: Int): IndexedSeq[IndexedSeq[Long]] = {
    require(nmax <= 15, s"Hermite coefficients exceed exact-long range: $nmax")
    val h = scala.collection.mutable.ArrayBuffer[IndexedSeq[Long]](
      IndexedSeq(1L), IndexedSeq(0L, 2L))
    for (n <- 2 to nmax) {
      val c = Array.fill[Long](n + 1)(0L)
      for (k <- h(n - 1).indices) c(k + 1) += 2L * h(n - 1)(k)
      for (k <- h(n - 2).indices) c(k) -= 2L * (n - 1) * h(n - 2)(k)
      h += c.toIndexedSeq
    }
    h.take(nmax + 1).toIndexedSeq
  }

  /** H_n(x) as SQL text: Horner in x² (H_n shares n's parity, so only
    * every other coefficient is nonzero), integer coefficients as
    * e-notation double literals. The same text feeds Spark and the
    * DuckDB oracle, so both engines run the identical IEEE op sequence. */
  def hermiteSql(n: Int, x: String): String = {
    val c = hermiteCoeffs(n)(n)
    val p = (n % 2 to n by 2).map(c(_)).reverse // leading coefficient first
    val x2 = s"($x * $x)"
    val horner = p.tail.foldLeft(s"${p.head}e0") { (acc, co) =>
      s"($acc * $x2 + ${co}e0)"
    }
    if (n % 2 == 1) s"($horner * $x)" else horner
  }

  /** Shared Spark-expr/oracle text for r17: the GENERAL-order 2-D
    * shapelet basis sum Σ_{n1<nmax1, n2<nmax2} c_{n1,n2} ·
    * φ_{n1}(u/βu) · φ_{n2}(v/βv) with the reference's real basis
    * normalization 1/√(2^n √π n! β) (model/shape/shapelets.py:29-33,
    * 2-D driver at 155-235) — upgrading r13's hard-coded order-≤2 table
    * to arbitrary (nmax1, nmax2) via the Hermite coefficient generator.
    * Coefficients are dyadic rationals of src_id (some exactly zero —
    * the reference's coeffs==0 skip path); βu, βv are the r13 per-source
    * scales. Determinism class: identical expression text both sides —
    * IEEE-exact rational arguments into exp (class b), polynomial/
    * product arithmetic bit-identical, r6-rounded output with the
    * DeterminismSpec-measured flip margin (class d, the r13 contract). */
  def shapeletGeneralSql(nmax1: Int, nmax2: Int): String = {
    val tu = "(u / (5e1 * (src_id + 1)))"
    val tv = "(v / (4e1 * (src_id + 2)))"
    def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
    // 1/√(2^n √π n! β): per-order constant × per-source dyadic β — the
    // sqrt/pi() chain is literal-rooted, so both engines agree bitwise
    def norm(n: Int, beta: String) =
      s"(1e0 / sqrt(${1L << n}e0 * sqrt(pi()) * ${fact(n)}e0 * $beta))"
    val terms = for (n1 <- 0 until nmax1; n2 <- 0 until nmax2) yield {
      val cNum = s"((src_id + ${3 * n1} + ${5 * n2}) % 9 - 4)"
      s"($cNum / 8e0) * ${norm(n1, "(5e1 * (src_id + 1))")} * " +
        s"${norm(n2, "(4e1 * (src_id + 2))")} * " +
        s"${hermiteSql(n1, tu)} * ${hermiteSql(n2, tv)}"
    }
    val envU = s"exp(-($tu*$tu) / 2e0)"
    val envV = s"exp(-($tv*$tv) / 2e0)"
    terms.mkString("(", " + ", s") * $envU * $envV")
  }

  /** Shared Spark-expr/oracle text for r13: 2-D Hermite-Gaussian shapelet
    * sum over orders (0,0),(1,0),(0,1),(1,1),(2,0),(0,2). */
  val shapelet2dSql: String = {
    val tu = "(u / (5e1 * (src_id + 1)))"
    val tv = "(v / (4e1 * (src_id + 2)))"
    val envU = s"exp(-($tu*$tu) / 2e0)"
    val envV = s"exp(-($tv*$tv) / 2e0)"
    def h(n: Int, x: String): String = n match {
      case 0 => "1e0"
      case 1 => s"(2e0 * $x)"
      case 2 => s"(4e0 * $x * $x - 2e0)"
    }
    val orders = Seq((0, 0, 3), (1, 0, 4), (0, 1, 5), (1, 1, 6), (2, 0, 7), (0, 2, 8))
    orders.map { case (n1, n2, m) =>
      s"((src_id % $m + 1) / 4e0) * ${h(n1, tu)} * ${h(n2, tv)}"
    }.mkString("(", " + ", s") * $envU * $envV")
  }

  val qs: Seq[Q] = Seq(

    // -- C2: lmn -> radec, inverse of C1
    //    (africanus/coordinates/coordinates.py:121-197).
    Q("c02_lmn_to_radec",
      s"""WITH src AS (${sourcesSql(25)}),
         |lmn AS (SELECT src_id, l, m,
         |  sqrt(1e0 - l*l - m*m) AS n FROM src)
         |SELECT src_id,
         |  ${r6Sql("25e-2 + atan2(l, n*cos(-38e-2) - m*sin(-38e-2))")} AS ra,
         |  ${r6Sql("asin(m*cos(-38e-2) + n*sin(-38e-2))")} AS dec
         |FROM lmn""".stripMargin) { (s, dir) =>
      val n = sqrt(lit(1e0) - col("l") * col("l") - col("m") * col("m"))
      sources(s, dir, 25).select(
        col("src_id"),
        Det.r6(lit(Ra0) + atan2(col("l"),
          n * cos(lit(Dec0)) - col("m") * sin(lit(Dec0)))).as("ra"),
        Det.r6(asin(col("m") * cos(lit(Dec0)) + n * sin(lit(Dec0)))).as("dec"))
    },

    // -- R4: parallactic angles, 'test' backend formula
    //    (africanus/rime/parangles.py:21-68): ha from a synthetic lst,
    //    antenna latitude from a dyadic position model.
    Q("r04_parallactic_angles",
      s"""WITH pat AS (${paTableSql()}),
         |geo AS (
         |  SELECT time_index, ant,
         |    1e-1 * time_index - 3e-1 AS ha,
         |    35e-2 + ant * 25e-3 AS lat,
         |    -38e-2 AS dec
         |  FROM pat)
         |SELECT time_index, ant,
         |  ${r6Sql("atan2(cos(lat)*sin(ha), sin(lat)*cos(dec) - cos(lat)*sin(dec)*cos(ha))")} AS pa
         |FROM geo""".stripMargin) { (s, dir) =>
      val ha = lit(1e-1) * col("time_index") - 3e-1
      val lat = lit(35e-2) + col("ant") * 25e-3
      val dec = lit(-38e-2)
      paTable(s, dir).select(
        col("time_index"), col("ant"),
        Det.r6(atan2(cos(lat) * sin(ha),
          sin(lat) * cos(dec) - cos(lat) * sin(dec) * cos(ha))).as("pa"))
    },

    // -- R4b: parallactic angles from a REAL time scale — Greenwich mean
    //    sidereal time via the IAU 1982 polynomial (public formula; the
    //    reference's casa/astropy backends resolve the same LST through
    //    their ephemeris stacks, rime/parangles_astropy.py). MJD epochs
    //    per time step, per-antenna longitude/latitude; hour angle =
    //    GMST + lon − ra; same pa formula as R4. The 360°-reduction is a
    //    floor expression (deterministic) and all trig arguments stay
    //    below ~2π.
    Q("r04b_parallactic_gmst", {
      val sql = RimeMore.paGmstSql
      s"""WITH pat AS (${paTableSql()})
         |SELECT time_index, ant, ${r6Sql(sql)} AS pa
         |FROM pat""".stripMargin
    }) { (s, dir) =>
      paTable(s, dir).select(col("time_index"), col("ant"),
        Det.r6(expr(RimeMore.paGmstSql)).as("pa"))
    },

    // -- R4c: the 'casa' backend calling convention
    //    (rime/parangles_casa.py:24-63 — the reference's DEFAULT): UTC
    //    MJD-second epochs + ITRF-metre antenna positions + J2000 field
    //    centre, through functions.ParAngles (Bowring geodetic inversion
    //    on WGS84 + IAU-1982 GMST + posangle). Fixture antennas are
    //    dyadic-integer ITRF coordinates near a real mid-latitude site;
    //    epochs are integer seconds, so every input is cross-engine
    //    exact and the r6 output is r04b's driver-green class
    //    (single atan2 chain, margins measured in CasaParanglesSpec).
    Q("r04c_parallactic_casa", RimeMore.paCasaOracleSql()) { (s, dir) =>
      import graft.functions.ParAngles
      val mjdSec = lit(5084553600e0) + col("time_index") * 5400e0
      val x = lit(-1601710e0) + col("ant") * 64e0
      val y = lit(-5042006e0) + col("ant") * 128e0
      val z = lit(3554880e0) + col("ant") * 32e0
      paTable(s, dir).select(col("time_index"), col("ant"),
        Det.r6(ParAngles.casaPa(mjdSec, x, y, z,
          lit(25e-2), lit(-38e-2))).as("pa"))
    },

    // -- R4d: the 'astropy' backend convention
    //    (rime/parangles_astropy.py:20-41) — same ITRF/MJD-second/J2000
    //    inputs as r04c, hour angle from the IAU-2000 Earth Rotation
    //    Angle (astropy's CIRS rotation) instead of GMST-1982. lat/ha
    //    r9-round before the posangle so the hashed r6 chain takes trig
    //    of bit-identical arguments (DeterminismSpec margins).
    Q("r04d_parallactic_era", RimeMore.paEraOracleSql()) { (s, dir) =>
      import graft.functions.ParAngles
      val mjdSec = lit(5084553600e0) + col("time_index") * 5400e0
      val x = lit(-1601710e0) + col("ant") * 64e0
      val y = lit(-5042006e0) + col("ant") * 128e0
      val z = lit(3554880e0) + col("ant") * 32e0
      paTable(s, dir).select(col("time_index"), col("ant"),
        Det.r6(ParAngles.astropyPa(mjdSec, x, y, z,
          lit(25e-2), lit(-38e-2))).as("pa"))
    },

    // -- R11b: 2-D Cartesian shapelet basis
    //    (africanus/model/shape/shapelets.py:57-153 shapelet_2d): the
    //    separable Hermite-windowed Gaussian φ_{n1}(u/βu)·φ_{n2}(v/βv),
    //    orders (0,0),(1,0),(0,1),(1,1),(2,0),(0,2), per-source scales and
    //    dyadic coefficients.
    Q("r13_shapelet_2d", {
      val sql = RimeMore.shapelet2dSql
      s"""WITH src AS (${sourcesSql(5)}), rws AS (${uvwRowsSql(64)})
         |SELECT src_id, row_id, ${r6Sql(sql)} AS sval
         |FROM src, rws""".stripMargin
    }) { (s, dir) =>
      sources(s, dir, 5).select("src_id")
        .crossJoin(uvwRows(s, dir, 64).select("row_id", "u", "v"))
        .select(col("src_id"), col("row_id"),
          Det.r6(expr(RimeMore.shapelet2dSql)).as("sval"))
    },

    // -- R11c: shapelet_with_w_term
    //    (africanus/model/shape/shapelets.py:104-150): the 2-D shapelet
    //    basis of r13 under phase_steer_and_w_correct's
    //    e^{i·(−2π/c)·ν·(u·l0 + v·m0 + w·(n0−1))} — the phase-steered,
    //    w-corrected visibility of an off-centre shapelet source.
    //    HASHED SURFACE (CLAUDE.md rule, learned from r01/r15/x09 reds):
    //    no per-row libm output — the round-3 r4-rounded basis·cos(phase)
    //    product flipped on the driver despite 100×-margin buckets. The
    //    surface is instead the two factors that pin the product exactly:
    //    the IEEE-exact steering phase (r01's driver-green class — pure
    //    arithmetic, both engines agree bit for bit) and the r6 basis
    //    (r13's driver-green class), as separate columns.
    Q("r15_shapelet_w", {
      val sql = RimeMore.shapelet2dSql
      val ph = SyntheticMs.phaseSql
      s"""WITH src AS (${sourcesSql(5)}), rws AS (${uvwRowsSql(64)}),
         |ch AS (${channelsSql(4)})
         |SELECT src_id, row_id, chan,
         |  $ph AS phase,
         |  ${r6Sql(sql)} AS sval
         |FROM src, rws, ch""".stripMargin
    }) { (s, dir) =>
      val basis = expr(RimeMore.shapelet2dSql)
      val ph = graft.functions.Phase.realPhase(col("l"), col("m"),
        col("u"), col("v"), col("w")) * col("freq")
      sources(s, dir, 5)
        .crossJoin(uvwRows(s, dir, 64).select("row_id", "u", "v", "w"))
        .crossJoin(broadcast(channels(s, dir, 4)))
        .select(col("src_id"), col("row_id"), col("chan"),
          ph.as("phase"),
          Det.r6(basis).as("sval"))
    },

    // -- R11 general order: the arbitrary-(nmax1, nmax2) shapelet basis
    //    via the iterative Hermite coefficient generator
    //    (model/shape/shapelets.py:10-55 recursion; 2-D evaluation at
    //    155-235) — orders up to (5, 4) here, far past r13's hard-coded
    //    ≤2 table, including the reference's real-basis normalization
    //    1/√(2^n √π n! β). One zero-shuffle projection over the src×row
    //    grid; the polynomial text is generated ONCE and shared with the
    //    oracle, so order growth never touches plan shape.
    Q("r17_shapelet_general", {
      val sql = RimeMore.shapeletGeneralSql(5, 4)
      s"""WITH src AS (${sourcesSql(5)}), rws AS (${uvwRowsSql(64)})
         |SELECT src_id, row_id, ${r6Sql(sql)} AS sval
         |FROM src, rws""".stripMargin
    }) { (s, dir) =>
      sources(s, dir, 5).select("src_id")
        .crossJoin(uvwRows(s, dir, 64).select("row_id", "u", "v"))
        .select(col("src_id"), col("row_id"),
          Det.r6(expr(RimeMore.shapeletGeneralSql(5, 4))).as("sval"))
    },

    // -- R6: transform_sources (africanus/rime/transform.py:12-99):
    //    rotate lm by the parallactic angle, add pointing errors, scale
    //    per antenna, append scaled frequency — over src x (time, ant) x chan.
    Q("r06_transform_sources",
      s"""WITH src AS (${sourcesSql(5)}), pat AS (${paTableSql(4, 3)}),
         |ch AS (${channelsSql(4)})
         |SELECT src_id, time_index, ant, chan,
         |  ${r6Sql("(1e0 + ant * 125e-3) * (l*cos(pa) - m*sin(pa) + (time_index - 1) * 25e-4)")} AS lt,
         |  ${r6Sql("(1e0 - ant * 625e-4) * (l*sin(pa) + m*cos(pa) + (ant - 1) * 125e-4)")} AS mt,
         |  freq / 14e8 AS ft
         |FROM src, pat, ch""".stripMargin) { (s, dir) =>
      val scaleL = lit(1e0) + col("ant") * 125e-3
      val scaleM = lit(1e0) - col("ant") * 625e-4
      val peL = (col("time_index") - 1) * 25e-4
      val peM = (col("ant") - 1) * 125e-4
      sources(s, dir, 5)
        .crossJoin(broadcast(paTable(s, dir, 4, 3)))
        .crossJoin(broadcast(channels(s, dir, 4)))
        .select(col("src_id"), col("time_index"), col("ant"), col("chan"),
          Det.r6(scaleL * (col("l") * cos(col("pa")) - col("m") * sin(col("pa")) + peL)).as("lt"),
          Det.r6(scaleM * (col("l") * sin(col("pa")) + col("m") * cos(col("pa")) + peM)).as("mt"),
          (col("freq") / 14e8).as("ft"))
    },

    // -- R11: 1-D shapelet visibility basis
    //    (africanus/model/shape/shapelets.py:57-153): Hermite-windowed
    //    Gaussian in u, orders 0-2, per-source scale beta and dyadic
    //    coefficients.
    Q("r11_shapelet", {
      val t = "(u / (5e1 * (src_id + 1)))"
      val env = s"exp(-($t*$t) / 2e0)"
      s"""WITH src AS (${sourcesSql(5)}), rws AS (${uvwRowsSql(64)})
         |SELECT src_id, row_id,
         |  ${r6Sql(
             s"((src_id % 3 + 1) / 4e0 * 1e0 + (src_id % 4 + 1) / 4e0 * (2e0 * $t) " +
             s"+ (src_id % 5 + 1) / 4e0 * (4e0 * $t * $t - 2e0)) * $env")} AS sval
         |FROM src, rws""".stripMargin
    }) { (s, dir) =>
      val t = col("u") / (lit(5e1) * (col("src_id") + 1))
      val env = exp(-(t * t) / 2e0)
      def cf(m: Int) = (col("src_id") % m + 1) / 4e0
      val sval = (cf(3) * lit(1e0) + cf(4) * (lit(2e0) * t)
        + cf(5) * (lit(4e0) * t * t - 2e0)) * env
      sources(s, dir, 5).select("src_id")
        .crossJoin(uvwRows(s, dir, 64).select("row_id", "u"))
        .select(col("src_id"), col("row_id"), Det.r6(sval).as("sval"))
    },

    // -- R10: Gaussian source shape taper
    //    (africanus/model/shape/gaussian_shape.py:11-66): rotate uv by the
    //    position angle, squash by the axis ratio, exp-decay with
    //    frequency-scaled extent. Rotation convention follows the
    //    reference exactly (el = sin ang, em = cos ang):
    //      u1 = (u·em − v·el)·er,  v1 = u·el + v·em
    Q("r10_gaussian_shape",
      s"""WITH src AS (${sourcesSql(5)}), rws AS (${uvwRowsSql(64)}),
         |ch AS (${channelsSql(4)}),
         |gp AS (
         |  SELECT src_id, l, m,
         |    1e-4 * (src_id + 2) AS emaj, 5e-5 * (src_id + 1) AS emin,
         |    3e-1 * src_id AS ang
         |  FROM src)
         |SELECT src_id, row_id, chan,
         |  ${r6Sql(
             "exp(-(pi()*pi()/(4e0*ln(2e0))) * ((freq/299792458e0)*(freq/299792458e0)) * " +
             "(((u*cos(ang) - v*sin(ang)) * (emin/emaj)) * ((u*cos(ang) - v*sin(ang)) * (emin/emaj)) " +
             "+ (u*sin(ang) + v*cos(ang)) * (u*sin(ang) + v*cos(ang))) * (emaj*emaj))")} AS shape
         |FROM gp, rws, ch""".stripMargin) { (s, dir) =>
      val gp = sources(s, dir, 5).select(col("src_id"),
        (lit(1e-4) * (col("src_id") + 2)).as("emaj"),
        (lit(5e-5) * (col("src_id") + 1)).as("emin"),
        (lit(3e-1) * col("src_id")).as("ang"))
      val u1 = (col("u") * cos(col("ang")) - col("v") * sin(col("ang"))) *
        (col("emin") / col("emaj"))
      val v1 = col("u") * sin(col("ang")) + col("v") * cos(col("ang"))
      val fsq = (col("freq") / 299792458e0) * (col("freq") / 299792458e0)
      val k = lit(-(math.Pi * math.Pi)) / (lit(4e0) * log(lit(2e0)))
      uvwRows(s, dir, 64)
        .crossJoin(broadcast(gp))
        .crossJoin(broadcast(channels(s, dir, 4)))
        .select(col("src_id"), col("row_id"), col("chan"),
          Det.r6(exp(k * fsq * (u1 * u1 + v1 * v1) * (col("emaj") * col("emaj"))))
            .as("shape"))
    })
}
