package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables

/** Image-domain deconvolution under the hash gate — SURVEY §2.8 I1.
  *
  * The full Hogbom CLEAN (africanus/deconv/hogbom/clean.py:122-198) runs
  * to a dynamic stopping rule, so the library face is the driver-side
  * `operators/Deconv.hogbomClean` plus the distributed per-facet
  * `operators/FacetClean` (both spec-verified). i01 puts the CLEAN
  * *update algebra* itself under the DuckDB hash gate the same way g08
  * did for Gauss-Newton: two unrolled minor cycles, SQL-expressible as
  * chained CTEs.
  *
  * Float determinism by construction (CLAUDE.md rules): the dirty image
  * is synthesized in exact integer micro-units (values × 2^14), the PSF
  * is dyadic (64ths with entries ≥ 8), and the loop gain is 1/2 — so
  * every flux and every PSF subtraction is an EXACTLY-divisible integer
  * operation (multiples of 2^10 survive cycle 1, 2^6 survive cycle 2) and
  * floor vs truncate division can never disagree. The peak search
  * tie-breaks on (|v| desc, x, y) identically in both engines. The only
  * doubles on the hashed surface are divisions of bit-identical longs by
  * the literal 2^14 — IEEE-exact class (a).
  */
object DeconvQ {

  val qs: Seq[Q] = Seq(
    // -- I2 restore under the gate: closed-form beam fit from the PSF
    //    lobe's second moments + sparse convolution of clean components
    //    + residual add (clean.py:40-70, 202-236). Determinism chain, by
    //    CLAUDE.md class: the synthetic PSF lobe is INTEGER-valued, so
    //    every moment is an exact integer sum (order-free); the central
    //    moments, truncation correction (literal 1−ln 2 — never an
    //    engine ln(2)), covariance inverse and per-offset quadratic form
    //    q = a·dx² + 2b·dx·dy + c·dy² (integer dx, dy) are single-chain
    //    arithmetic of bit-identical doubles; exp(−q) is then exp of a
    //    BIT-IDENTICAL argument — class (b), the driver-green x06
    //    regime; each pixel fsums flux·exp(−q) over its components —
    //    class (c) — and adds a dyadic residual. Scale shape: components
    //    × bounded beam support join pixels — output-linear, the
    //    reference's sparse-components convolution.
    Q("i02_restore", {
      val corr = "30685281944005469e-17" // 1 - ln 2, as a shared literal
      val term = "flux * exp(-(ba*(g.x-cx)*(g.x-cx)" +
        " + 2e0*bb*(g.x-cx)*(g.y-cy) + bc*(g.y-cy)*(g.y-cy)))"
      s"""WITH off AS (SELECT unnest(generate_series(-3, 3)) AS v),
        |psf AS (
        |  SELECT dx.v AS dx, dy.v AS dy,
        |    GREATEST(0, 4096 - 256*dx.v*dx.v - 512*dy.v*dy.v - 64*dx.v) AS w
        |  FROM off dx, off dy),
        |lobe AS (SELECT * FROM psf
        |         WHERE w * 2 >= (SELECT MAX(w) FROM psf)),
        |mom AS (
        |  SELECT CAST(SUM(w) AS BIGINT) AS sw,
        |    CAST(SUM(w*dx) AS BIGINT) AS swx, CAST(SUM(w*dy) AS BIGINT) AS swy,
        |    CAST(SUM(w*dx*dx) AS BIGINT) AS sxx,
        |    CAST(SUM(w*dx*dy) AS BIGINT) AS sxy,
        |    CAST(SUM(w*dy*dy) AS BIGINT) AS syy
        |  FROM lobe),
        |beam AS (
        |  SELECT cyy / (2e0 * det) AS ba, -cxy / (2e0 * det) AS bb,
        |         cxx / (2e0 * det) AS bc
        |  FROM (
        |    SELECT cxx, cxy, cyy, cxx * cyy - cxy * cxy AS det FROM (
        |      SELECT
        |        (CAST(sxx AS DOUBLE)/sw - (CAST(swx AS DOUBLE)/sw)*(CAST(swx AS DOUBLE)/sw)) / $corr AS cxx,
        |        (CAST(sxy AS DOUBLE)/sw - (CAST(swx AS DOUBLE)/sw)*(CAST(swy AS DOUBLE)/sw)) / $corr AS cxy,
        |        (CAST(syy AS DOUBLE)/sw - (CAST(swy AS DOUBLE)/sw)*(CAST(swy AS DOUBLE)/sw)) / $corr AS cyy
        |      FROM mom))),
        |px AS (SELECT unnest(generate_series(0, 15)) AS v),
        |grid AS (SELECT x.v AS x, y.v AS y FROM px x, px y),
        |comp AS (
        |  SELECT CAST(n_nationkey * 3 % 16 AS BIGINT) AS cx,
        |         CAST(n_nationkey * 7 % 16 AS BIGINT) AS cy,
        |         CAST(n_nationkey % 4 + 1 AS BIGINT) AS flux
        |  FROM nation WHERE n_nationkey < 5),
        |cnv AS (
        |  SELECT g.x, g.y, ${graft.core.Det.fsumSql(term)} AS cv
        |  FROM grid g
        |    LEFT JOIN comp ON abs(g.x - cx) <= 3 AND abs(g.y - cy) <= 3,
        |    beam
        |  GROUP BY g.x, g.y)
        |SELECT x, y, COALESCE(cv, 0e0) AS conv,
        |  COALESCE(cv, 0e0) + ((x*7 + y*3) % 9 - 4) / 256e0 AS restored
        |FROM cnv""".stripMargin
    }) { (s, dir) =>
      val corr = 0.30685281944005469 // 1 - ln 2 (shared literal)
      val off = s.range(-3, 4).select(col("id").as("v"))
      val psf = off.select(col("v").as("dx")).crossJoin(
          off.select(col("v").as("dy")))
        .select(col("dx"), col("dy"),
          greatest(lit(0L),
            lit(4096L) - lit(256L) * col("dx") * col("dx") -
              lit(512L) * col("dy") * col("dy") - lit(64L) * col("dx"))
            .as("w"))
      val mx = psf.agg(max(col("w"))).head.getLong(0)
      val mom = psf.filter(col("w") * 2 >= mx)
        .agg(sum(col("w")).as("sw"),
          sum(col("w") * col("dx")).as("swx"),
          sum(col("w") * col("dy")).as("swy"),
          sum(col("w") * col("dx") * col("dx")).as("sxx"),
          sum(col("w") * col("dx") * col("dy")).as("sxy"),
          sum(col("w") * col("dy") * col("dy")).as("syy"))
      val cen = mom.select(
        ((col("sxx").cast("double") / col("sw") -
          (col("swx").cast("double") / col("sw")) *
            (col("swx").cast("double") / col("sw"))) / corr).as("cxx"),
        ((col("sxy").cast("double") / col("sw") -
          (col("swx").cast("double") / col("sw")) *
            (col("swy").cast("double") / col("sw"))) / corr).as("cxy"),
        ((col("syy").cast("double") / col("sw") -
          (col("swy").cast("double") / col("sw")) *
            (col("swy").cast("double") / col("sw"))) / corr).as("cyy"))
      val beam = cen
        .withColumn("det", col("cxx") * col("cyy") - col("cxy") * col("cxy"))
        .select((col("cyy") / (lit(2.0) * col("det"))).as("ba"),
          (-col("cxy") / (lit(2.0) * col("det"))).as("bb"),
          (col("cxx") / (lit(2.0) * col("det"))).as("bc"))
      val px = s.range(0, 16).select(col("id").as("v"))
      val grid = px.select(col("v").as("x")).crossJoin(
        px.select(col("v").as("y")))
      val comp = Tables.nation(s, dir).filter(col("n_nationkey") < 5)
        .select(expr("cast(n_nationkey * 3 % 16 as bigint)").as("cx"),
          expr("cast(n_nationkey * 7 % 16 as bigint)").as("cy"),
          expr("cast(n_nationkey % 4 + 1 as bigint)").as("flux"))
      val q = col("ba") * (col("x") - col("cx")) * (col("x") - col("cx")) +
        lit(2.0) * col("bb") * (col("x") - col("cx")) * (col("y") - col("cy")) +
        col("bc") * (col("y") - col("cy")) * (col("y") - col("cy"))
      val cv = (sum(round(col("flux") * exp(-q) * 1e6).cast("long")) / 1e6)
      grid.join(broadcast(comp),
          abs(col("x") - col("cx")) <= 3 && abs(col("y") - col("cy")) <= 3,
          "left")
        .crossJoin(broadcast(beam))
        .groupBy("x", "y").agg(cv.as("cv"))
        .select(col("x"), col("y"),
          coalesce(col("cv"), lit(0.0)).as("conv"),
          (coalesce(col("cv"), lit(0.0)) +
            ((col("x") * 7 + col("y") * 3) % 9 - 4) / lit(256.0))
            .as("restored"))
    },

    Q("l01_kron_matvec",
      // naive statement: y_i = Σ_j (A⊗B)[i,j]·x_j with i = i1·4+i2,
      // j = j1·4+j2 — the oracle materializes the Kronecker product the
      // distributed plan must NEVER build
      """WITH idx AS (SELECT unnest(generate_series(0, 3)) AS v),
        |a AS (
        |  SELECT i.v AS i1, j.v AS j1,
        |    ((i.v * 3 + j.v * 5) % 7) - 3 AS av
        |  FROM idx i, idx j),
        |b AS (
        |  SELECT i.v AS i2, j.v AS j2,
        |    ((i.v * 2 + j.v * 3) % 5) - 2 AS bv
        |  FROM idx i, idx j),
        |x AS (
        |  SELECT j1.v AS j1, j2.v AS j2,
        |    ((j1.v * 4 + j2.v) % 5) - 2 AS xv
        |  FROM idx j1, idx j2)
        |SELECT CAST(a.i1 * 4 + b.i2 AS BIGINT) AS i,
        |  CAST(SUM(a.av * b.bv * x.xv) AS BIGINT) AS y
        |FROM a JOIN x ON a.j1 = x.j1
        |       JOIN b ON b.j2 = x.j2
        |GROUP BY a.i1 * 4 + b.i2""".stripMargin) { (s, dir) =>
      // distributed face of L1 kron_matvec (kronecker_tools.py:58-96):
      // y = (A⊗B)x as TWO grouped contractions — inner over j2 with B,
      // outer over j1 with A. The 16×16 product never exists; at scale
      // (A⊗B is n²×m² for n×m factors) that factoring is the operator.
      // Both factor tables are model-sized → broadcast; the data-sized
      // relation (x, then the inner contraction) is the only thing
      // shuffled, keyed by its own indices. Exact integer arithmetic on
      // both sides. The local-array variant (operators/Deconv.kronMatvec)
      // remains the facet-scale path, spec'd by KronSpec.
      val idx = s.range(0, 4).select(col("id").cast("long").as("v"))
      val a = idx.select(col("v").as("i1")).crossJoin(
          idx.select(col("v").as("j1")))
        .select(col("i1"), col("j1"),
          (((col("i1") * 3 + col("j1") * 5) % 7) - 3).as("av"))
      val b = idx.select(col("v").as("i2")).crossJoin(
          idx.select(col("v").as("j2")))
        .select(col("i2"), col("j2"),
          (((col("i2") * 2 + col("j2") * 3) % 5) - 2).as("bv"))
      val x = idx.select(col("v").as("xj1")).crossJoin(
          idx.select(col("v").as("xj2")))
        .select(col("xj1"), col("xj2"),
          (((col("xj1") * 4 + col("xj2")) % 5) - 2).as("xv"))
      val inner = x.join(broadcast(b), col("xj2") === col("j2"))
        .groupBy(col("i2"), col("xj1"))
        .agg(sum(col("bv") * col("xv")).as("t"))
      inner.join(broadcast(a), col("xj1") === col("j1"))
        .groupBy((col("i1") * 4 + col("i2")).as("i"))
        .agg(sum(col("av") * col("t")).as("y"))
    },

    Q("i01_hogbom_2iter",
      """WITH n AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation
        |  WHERE n_nationkey < 8),
        |img0 AS (
        |  SELECT a.k AS x, b.k AS y,
        |    ((a.k * 13 + b.k * 7) % 23 - 11) * 16384 AS v
        |  FROM n a, n b),
        |psf AS (
        |  SELECT CAST(dx AS BIGINT) AS dx, CAST(dy AS BIGINT) AS dy,
        |    CAST(p AS BIGINT) AS p
        |  FROM (VALUES (-1,-1,8),(-1,0,16),(-1,1,8),(0,-1,16),(0,0,64),
        |    (0,1,16),(1,-1,8),(1,0,16),(1,1,8)) t(dx, dy, p)),
        |pk1 AS (
        |  SELECT x AS px, y AS py, v AS pv FROM img0
        |  ORDER BY abs(v) DESC, x, y LIMIT 1),
        |img1 AS (
        |  SELECT i.x, i.y,
        |    i.v - COALESCE(((pk1.pv // 2) * psf.p) // 64, 0) AS v
        |  FROM img0 i CROSS JOIN pk1
        |  LEFT JOIN psf ON psf.dx = i.x - pk1.px AND psf.dy = i.y - pk1.py),
        |pk2 AS (
        |  SELECT x AS px, y AS py, v AS pv FROM img1
        |  ORDER BY abs(v) DESC, x, y LIMIT 1),
        |img2 AS (
        |  SELECT i.x, i.y,
        |    i.v - COALESCE(((pk2.pv // 2) * psf.p) // 64, 0) AS v
        |  FROM img1 i CROSS JOIN pk2
        |  LEFT JOIN psf ON psf.dx = i.x - pk2.px AND psf.dy = i.y - pk2.py)
        |SELECT i.x, i.y, i.v / 16384e0 AS resid,
        |  pk1.px AS c1_x, pk1.py AS c1_y, (pk1.pv // 2) / 16384e0 AS c1_flux,
        |  pk2.px AS c2_x, pk2.py AS c2_y, (pk2.pv // 2) / 16384e0 AS c2_flux
        |FROM img2 i CROSS JOIN pk1 CROSS JOIN pk2""".stripMargin) { (s, dir) =>
      import s.implicits._
      val n = Tables.nation(s, dir)
        .select(col("n_nationkey").cast("long").as("k"))
        .filter(col("k") < 8)
      val img0 = n.select(col("k").as("x"))
        .crossJoin(n.select(col("k").as("y")))
        .select(col("x"), col("y"),
          (((col("x") * 13 + col("y") * 7) % 23 - 11) * 16384L).as("v"))
      val psf = Seq((-1L, -1L, 8L), (-1L, 0L, 16L), (-1L, 1L, 8L),
          (0L, -1L, 16L), (0L, 0L, 64L), (0L, 1L, 16L),
          (1L, -1L, 8L), (1L, 0L, 16L), (1L, 1L, 8L))
        .toDF("dx", "dy", "p")
      // one minor cycle: peak (|v| desc, x, y), subtract gamma·peak·PSF
      def cycle(img: DataFrame): (DataFrame, DataFrame) = {
        val pk = img.orderBy(abs(col("v")).desc, col("x"), col("y")).limit(1)
          .select(col("x").as("px"), col("y").as("py"), col("v").as("pv"))
        val next = img.crossJoin(broadcast(pk))
          .join(broadcast(psf),
            col("dx") === col("x") - col("px") &&
              col("dy") === col("y") - col("py"), "left")
          .select(col("x"), col("y"),
            (col("v") - coalesce(
              expr("(pv div 2) * p div 64"), lit(0L))).as("v"))
        (next, pk)
      }
      val (img1, pk1) = cycle(img0)
      val (img2, pk2) = cycle(img1)
      img2
        .select(col("x"), col("y"), (col("v") / 16384e0).as("resid"))
        .crossJoin(broadcast(pk1.select(col("px").as("c1_x"),
          col("py").as("c1_y"),
          (expr("pv div 2") / 16384e0).as("c1_flux"))))
        .crossJoin(broadcast(pk2.select(col("px").as("c2_x"),
          col("py").as("c2_y"),
          (expr("pv div 2") / 16384e0).as("c2_flux"))))
    },

    // -- L2 under the gate: the REAL convex-hull machinery
    //    (operators/FacetGeometry — geometry.py:33-750) run over 20
    //    integer-coordinate facet point clouds whose hull is KNOWN by
    //    construction (an octagon: rectangle corners + strictly-protruding
    //    diamond tips, salted with interior points and duplicates in a
    //    scrambled order). The oracle states the closed-form octagon
    //    directly — vertex count, shoelace area, and an edge-rounded
    //    perimeter — so any monotone-chain bug (drop/keep/ordering)
    //    shifts the hash. Determinism: coordinates are exact ints, the
    //    shoelace is an exact-integer sum, and each edge length is
    //    rounded to 1e-6 BEFORE the sum (order-free long addition;
    //    hypot-vs-sqrt 1-ulp divergence is margin-checked in
    //    FacetGeometrySpec). Facet planning is driver-sized math (the
    //    reference's is too); the gate hashes its full output.
    Q("l02_hull_geometry", {
      // CCW octagon vertices in closed form
      def vx(i: Int): (String, String) = i match {
        case 0 => ("(cx + a)", "cy")
        case 1 => ("(cx + w)", "(cy + h)")
        case 2 => ("cx", "(cy + b)")
        case 3 => ("(cx - w)", "(cy + h)")
        case 4 => ("(cx - a)", "cy")
        case 5 => ("(cx - w)", "(cy - h)")
        case 6 => ("cx", "(cy - b)")
        case 7 => ("(cx + w)", "(cy - h)")
      }
      val shoelace = (0 until 8).map { i =>
        val (x1, y1) = vx(i); val (x2, y2) = vx((i + 1) % 8)
        s"($x1*$y2 - $x2*$y1)"
      }.mkString(" + ")
      val perim = (0 until 8).map { i =>
        val (x1, y1) = vx(i); val (x2, y2) = vx((i + 1) % 8)
        s"CAST(ROUND(sqrt(CAST(($x2-$x1)*($x2-$x1) + ($y2-$y1)*($y2-$y1) AS DOUBLE)) * 1e6) AS BIGINT)"
      }.mkString(" + ")
      s"""WITH f AS (
         |  SELECT CAST(n_nationkey AS BIGINT) AS k,
         |    n_nationkey * 3 % 7 AS cx, n_nationkey * 5 % 9 AS cy,
         |    n_nationkey % 5 + 2 AS w, n_nationkey % 3 + 1 AS h,
         |    (n_nationkey % 5 + 2) + 1 AS a,
         |    (n_nationkey % 3 + 1) + 1 AS b
         |  FROM nation WHERE n_nationkey < 20)
         |SELECT k AS facet_id, CAST(8 AS BIGINT) AS n_hull,
         |  5e-1 * abs(CAST($shoelace AS DOUBLE)) AS area,
         |  CAST($perim AS BIGINT) / 1e6 AS perim
         |FROM f""".stripMargin
    }) { (s, dir) =>
      import graft.operators.FacetGeometry
      import s.implicits._
      val rows = Tables.nation(s, dir).filter(col("n_nationkey") < 20)
        .select(col("n_nationkey").cast("long").as("k"))
        .collect().map(_.getLong(0)).sorted.map { k =>
        val cx = (k * 3 % 7).toDouble; val cy = (k * 5 % 9).toDouble
        val w = (k % 5 + 2).toDouble; val h = (k % 3 + 1).toDouble
        // a−w = b−h = 1: (a−w)(b−h) = 1 < w·h, so a tip can never be
        // collinear with its two neighbouring rect corners — all 8 stay hull
        val a = w + 1; val b = h + 1
        val pts0: Seq[(Double, Double)] = Seq(
          (cx + a, cy), (cx + w, cy + h), (cx, cy + b), (cx - w, cy + h),
          (cx - a, cy), (cx - w, cy - h), (cx, cy - b), (cx + w, cy - h),
          // interior salt + a duplicate vertex: the hull must shed these
          (cx, cy), (cx + (k % 3 - 1), cy + (k % 2)), (cx + a, cy))
        val pts = pts0.indices.sortBy(i => (i * 7) % 13).map(pts0)
        val hull = FacetGeometry.convexHull(pts)
        val area = FacetGeometry.area(hull)
        val perim = hull.indices.map { i =>
          val (x1, y1) = hull(i); val (x2, y2) = hull((i + 1) % hull.size)
          math.round(math.hypot(x2 - x1, y2 - y1) * 1e6)
        }.sum / 1e6
        (k, hull.size.toLong, area, perim)
      }.toSeq
      rows.toDF("facet_id", "n_hull", "area", "perim")
    })
}
