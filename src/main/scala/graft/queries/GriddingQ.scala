package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Det
import graft.operators.Gridder
import SyntheticMs._

/** Gridding queries — SURVEY §2.7 F6 (convolutional scatter) and F7
  * (degrid gather), on the sparse DataFrame path. The kernel taps and the
  * visibilities are dyadic, so grid sums are exact and order-independent;
  * the full grid→degrid pipeline hash-matches DuckDB with no rounding.
  */
object GriddingQ {

  /** Separable 5-tap triangle kernel (dyadic weights). */
  val Taps: Seq[(Int, Double)] =
    Seq(-2 -> 0.25, -1 -> 0.5, 0 -> 1.0, 1 -> 0.5, 2 -> 0.25)

  private val tapsSql =
    """taps AS (
      |  SELECT CAST(n_nationkey AS BIGINT) - 2 AS off,
      |    CASE n_nationkey WHEN 0 THEN 25e-2 WHEN 1 THEN 5e-1
      |      WHEN 2 THEN 1e0 WHEN 3 THEN 5e-1 ELSE 25e-2 END AS tap
      |  FROM nation WHERE n_nationkey < 5)""".stripMargin

  private val ptsSql =
    """pts AS (
      |  SELECT rws.row_id,
      |    CAST(ROUND(rws.u * 25e-2) AS BIGINT) AS pu,
      |    CAST(ROUND(rws.v * 25e-2) AS BIGINT) AS pv,
      |    cv.xx_re AS re, cv.xx_im AS im
      |  FROM rws JOIN cv ON rws.row_id = cv.row_id)""".stripMargin

  private val gridSelect =
    """SELECT pts.pu + ti.off AS gu, pts.pv + tj.off AS gv,
      |  SUM(pts.re * ti.tap * tj.tap) AS g_re,
      |  SUM(pts.im * ti.tap * tj.tap) AS g_im,
      |  CAST(COUNT(*) AS BIGINT) AS n_hits
      |FROM pts, taps ti, taps tj
      |GROUP BY pts.pu + ti.off, pts.pv + tj.off""".stripMargin

  private def pts(s: SparkSession, dir: String): DataFrame =
    uvwRows(s, dir, 16)
      .join(corrVis(s, dir, 16), "row_id")
      .select(col("row_id"),
        round(col("u") * 25e-2).cast("long").as("pu"),
        round(col("v") * 25e-2).cast("long").as("pv"),
        col("xx_re").as("re"), col("xx_im").as("im"))

  val qs: Seq[Q] = Seq(

    // -- F6: convolutional gridder — scatter each visibility over the 5x5
    //    stencil, sum per grid cell.
    Q("f06_grid_conv",
      s"""WITH rws AS (${uvwRowsSql(16)}), cv AS (${corrVisSql(16)}),
         |$tapsSql, $ptsSql
         |$gridSelect""".stripMargin) { (s, dir) =>
      Gridder.scatter(pts(s, dir), Taps)
    },

    // -- F7: degridder — gather the gridded result back at each uv point
    //    with the same (self-adjoint) stencil: one grid→degrid round trip.
    Q("f07_degrid",
      s"""WITH rws AS (${uvwRowsSql(16)}), cv AS (${corrVisSql(16)}),
         |$tapsSql, $ptsSql,
         |grid AS ($gridSelect)
         |SELECT p.row_id,
         |  SUM(grid.g_re * p.ti_tap * p.tj_tap) AS dg_re,
         |  SUM(grid.g_im * p.ti_tap * p.tj_tap) AS dg_im
         |FROM (SELECT pts.row_id, pts.pu + ti.off AS gu, pts.pv + tj.off AS gv,
         |        ti.tap AS ti_tap, tj.tap AS tj_tap
         |      FROM pts, taps ti, taps tj) p
         |JOIN grid ON grid.gu = p.gu AND grid.gv = p.gv
         |GROUP BY p.row_id""".stripMargin) { (s, dir) =>
      val p = pts(s, dir)
      Gridder.degrid(p, Gridder.scatter(p, Taps), Taps)
    },

    // -- F1-F5 (w-stacking layout): rows snap to their nearest w-plane,
    //    visibilities rotate by the residual-w phase, and each plane grids
    //    independently — ONE aggregation keyed by (plane, cell); the
    //    per-plane FFT stays a plane-parallel local step downstream (the
    //    part the reference delegates to ducc0's C++). 4 planes over
    //    w ∈ [-5, 5], η = 1e-2 keeps the residual phase in the libm-safe
    //    regime; grid sums are fixed-point (trig-bearing terms).
    Q("f09_wstack_grid", {
      val spacing = "(2e0 * 5e0 / 3e0)"
      val theta = "2e0 * pi() * 1e-2 * dw"
      s"""WITH rws AS (${uvwRowsSql(16)}), cv AS (${corrVisSql(16)}),
         |$tapsSql,
         |pts AS (
         |  SELECT rws.row_id, rws.w,
         |    CAST(ROUND(rws.u * 25e-2) AS BIGINT) AS pu,
         |    CAST(ROUND(rws.v * 25e-2) AS BIGINT) AS pv,
         |    cv.xx_re AS re, cv.xx_im AS im
         |  FROM rws JOIN cv ON rws.row_id = cv.row_id),
         |wp AS (
         |  SELECT *, LEAST(GREATEST(
         |      CAST(ROUND((w + 5e0) / $spacing) AS BIGINT), 0), 3) AS wplane
         |  FROM pts),
         |rt AS (
         |  SELECT *, w - (-5e0 + CAST(wplane AS DOUBLE) * $spacing) AS dw
         |  FROM wp),
         |c AS (
         |  SELECT *,
         |    re*cos($theta) - im*sin($theta) AS cre,
         |    re*sin($theta) + im*cos($theta) AS cim
         |  FROM rt)
         |SELECT wplane, pu + ti.off AS gu, pv + tj.off AS gv,
         |  ${Det.fsumSql("cre * ti.tap * tj.tap")} AS g_re,
         |  ${Det.fsumSql("cim * ti.tap * tj.tap")} AS g_im,
         |  CAST(COUNT(*) AS BIGINT) AS n_hits
         |FROM c, taps ti, taps tj
         |GROUP BY wplane, pu + ti.off, pv + tj.off""".stripMargin
    }) { (s, dir) =>
      val p = uvwRows(s, dir, 16)
        .join(corrVis(s, dir, 16), "row_id")
        .select(col("row_id"), col("w"),
          round(col("u") * 25e-2).cast("long").as("pu"),
          round(col("v") * 25e-2).cast("long").as("pv"),
          col("xx_re").as("re"), col("xx_im").as("im"))
      graft.operators.WStack.planeGrids(p, Taps, nPlanes = 4, wMax = 5.0,
        eta = 1e-2, fsum = c => Det.fsum(c))
    },

    // -- the adjoint of f09: degrid each row from its OWN w-plane's grid
    //    with the same stencil, then back-rotate by the residual-w phase
    //    conjugate — the full w-stacked vis → grid → vis round trip. The
    //    gather re-uses the fixed-point sum discipline (grid values are
    //    inexact doubles); the rotation is a single deterministic complex
    //    product, so no output rounding is needed.
    Q("f10_wstack_degrid", {
      val spacing = "(2e0 * 5e0 / 3e0)"
      val theta = "2e0 * pi() * 1e-2 * dw"
      s"""WITH rws AS (${uvwRowsSql(16)}), cv AS (${corrVisSql(16)}),
         |$tapsSql,
         |pts AS (
         |  SELECT rws.row_id, rws.w,
         |    CAST(ROUND(rws.u * 25e-2) AS BIGINT) AS pu,
         |    CAST(ROUND(rws.v * 25e-2) AS BIGINT) AS pv,
         |    cv.xx_re AS re, cv.xx_im AS im
         |  FROM rws JOIN cv ON rws.row_id = cv.row_id),
         |wp AS (
         |  SELECT *, LEAST(GREATEST(
         |      CAST(ROUND((w + 5e0) / $spacing) AS BIGINT), 0), 3) AS wplane
         |  FROM pts),
         |rt AS (
         |  SELECT *, w - (-5e0 + CAST(wplane AS DOUBLE) * $spacing) AS dw
         |  FROM wp),
         |c AS (
         |  SELECT *,
         |    re*cos($theta) - im*sin($theta) AS cre,
         |    re*sin($theta) + im*cos($theta) AS cim
         |  FROM rt),
         |grid AS (
         |  SELECT wplane, pu + ti.off AS gu, pv + tj.off AS gv,
         |    ${Det.fsumSql("cre * ti.tap * tj.tap")} AS g_re,
         |    ${Det.fsumSql("cim * ti.tap * tj.tap")} AS g_im
         |  FROM c, taps ti, taps tj
         |  GROUP BY wplane, pu + ti.off, pv + tj.off),
         |gath AS (
         |  SELECT p.row_id, p.dw,
         |    ${Det.fsumSql("grid.g_re * p.ti_tap * p.tj_tap")} AS s_re,
         |    ${Det.fsumSql("grid.g_im * p.ti_tap * p.tj_tap")} AS s_im
         |  FROM (SELECT rt.row_id, rt.dw, rt.wplane,
         |          rt.pu + ti.off AS gu, rt.pv + tj.off AS gv,
         |          ti.tap AS ti_tap, tj.tap AS tj_tap
         |        FROM rt, taps ti, taps tj) p
         |  JOIN grid ON grid.wplane = p.wplane
         |    AND grid.gu = p.gu AND grid.gv = p.gv
         |  GROUP BY p.row_id, p.dw)
         |SELECT row_id,
         |  s_re*cos($theta) - s_im*(-sin($theta)) AS dg_re,
         |  s_re*(-sin($theta)) + s_im*cos($theta) AS dg_im
         |FROM gath""".stripMargin
    }) { (s, dir) =>
      val p = uvwRows(s, dir, 16)
        .join(corrVis(s, dir, 16), "row_id")
        .select(col("row_id"), col("w"),
          round(col("u") * 25e-2).cast("long").as("pu"),
          round(col("v") * 25e-2).cast("long").as("pv"),
          col("xx_re").as("re"), col("xx_im").as("im"))
      val grids = graft.operators.WStack.planeGrids(p, Taps, nPlanes = 4,
        wMax = 5.0, eta = 1e-2, fsum = c => Det.fsum(c)).drop("n_hits")
      graft.operators.WStack.planeDegrid(p, grids, Taps, nPlanes = 4,
        wMax = 5.0, eta = 1e-2, fsum = c => Det.fsum(c))
    },

    // -- F1-F5 completed: the imaging back half. Per-plane sparse DFT of
    //    the w-stack grids at an 8x8 pixel set, image-domain per-plane
    //    w-correction e^{2πi·wp·η(l,m)} (η = −(l²+m²)/2), plane sum, and
    //    detaper by the kernel transform — vis → grid → dirty image end to
    //    end, every sum fixed-point, every trig argument ≲ 2π. The dense
    //    production path is the plane-parallel JVM FFT (graft.operators
    //    .Fft), proven equal to this DFT algebra in FftSpec.
    Q("f11_wstack_dirty", {
      val spacing = "(2e0 * 5e0 / 3e0)"
      val theta = "2e0 * pi() * 1e-2 * dw"
      val dftArg = "2e0 * pi() * (gu*lx + gv*my)"
      val ph = s"2e0 * pi() * (-5e0 + CAST(wplane AS DOUBLE) * $spacing) * (-(lx*lx + my*my)/2e0)"
      def taperSql(c: String) = Taps.map { case (off, tap) =>
        val t = if (tap == 1.0) "1e0" else if (tap == 0.5) "5e-1" else "25e-2"
        s"$t * cos(2e0*pi() * ${off.toDouble.toInt}e0 * $c)"
      }.mkString(" + ")
      s"""WITH rws AS (${uvwRowsSql(32)}), cv AS (${corrVisSql(32)}),
         |$tapsSql,
         |pts AS (
         |  SELECT rws.row_id, rws.w,
         |    CAST(ROUND(rws.u * 25e-2) AS BIGINT) AS pu,
         |    CAST(ROUND(rws.v * 25e-2) AS BIGINT) AS pv,
         |    cv.xx_re AS re, cv.xx_im AS im
         |  FROM rws JOIN cv ON rws.row_id = cv.row_id),
         |wp AS (
         |  SELECT *, LEAST(GREATEST(
         |      CAST(ROUND((w + 5e0) / $spacing) AS BIGINT), 0), 3) AS wplane
         |  FROM pts),
         |rt AS (
         |  SELECT *, w - (-5e0 + CAST(wplane AS DOUBLE) * $spacing) AS dw
         |  FROM wp),
         |c AS (
         |  SELECT *,
         |    re*cos($theta) - im*sin($theta) AS cre,
         |    re*sin($theta) + im*cos($theta) AS cim
         |  FROM rt),
         |grid AS (
         |  SELECT wplane, pu + ti.off AS gu, pv + tj.off AS gv,
         |    ${Det.fsumSql("cre * ti.tap * tj.tap")} AS g_re,
         |    ${Det.fsumSql("cim * ti.tap * tj.tap")} AS g_im
         |  FROM c, taps ti, taps tj
         |  GROUP BY wplane, pu + ti.off, pv + tj.off),
         |px AS (
         |  SELECT CAST(t.n_nationkey AS BIGINT) AS x,
         |    CAST(a.n_nationkey AS BIGINT) AS y,
         |    (CAST(t.n_nationkey AS DOUBLE) - 4e0)/1024e0 AS lx,
         |    (CAST(a.n_nationkey AS DOUBLE) - 4e0)/1024e0 AS my
         |  FROM nation t, nation a
         |  WHERE t.n_nationkey < 8 AND a.n_nationkey < 8),
         |pimg AS (
         |  SELECT wplane, x, y, lx, my,
         |    ${Det.fsumSql(s"g_re*cos($dftArg) - g_im*sin($dftArg)")} AS img_re,
         |    ${Det.fsumSql(s"g_re*sin($dftArg) + g_im*cos($dftArg)")} AS img_im
         |  FROM grid, px GROUP BY wplane, x, y, lx, my),
         |dirty AS (
         |  SELECT x, y, lx, my,
         |    ${Det.fsumSql(s"img_re*cos($ph) - img_im*sin($ph)")} AS dirty
         |  FROM pimg GROUP BY x, y, lx, my)
         |SELECT x, y, dirty,
         |  ${Det.r6Sql(s"dirty / ((${taperSql("lx")}) * (${taperSql("my")}))")} AS dirty_dt
         |FROM dirty""".stripMargin
    }) { (s, dir) =>
      val p = uvwRows(s, dir, 32)
        .join(corrVis(s, dir, 32), "row_id")
        .select(col("row_id"), col("w"),
          round(col("u") * 25e-2).cast("long").as("pu"),
          round(col("v") * 25e-2).cast("long").as("pv"),
          col("xx_re").as("re"), col("xx_im").as("im"))
      val grids = graft.operators.WStack.planeGrids(p, Taps, nPlanes = 4,
        wMax = 5.0, eta = 1e-2, fsum = c => Det.fsum(c)).drop("n_hits")
      val nat = graft.core.Tables.nation(s, dir).filter(col("n_nationkey") < 8)
      val px = nat.select(col("n_nationkey").cast("long").as("x"))
        .crossJoin(nat.select(col("n_nationkey").cast("long").as("y")))
        .withColumn("lx", (col("x").cast("double") - lit(4e0)) / 1024e0)
        .withColumn("my", (col("y").cast("double") - lit(4e0)) / 1024e0)
      graft.operators.WStack.dirtyImageDft(grids, px, Taps,
        nPlanes = 4, wMax = 5.0, fsum = c => Det.fsum(c), r6 = Det.r6)
    },

    // -- the ε-CONTROLLED (ES-kernel fractional) path wired through the
    //    HESSIAN round trip (gridding/wgridder/hessian.py:16-199's R·R†
    //    applied in the vis domain): grid every visibility at its EXACT
    //    fractional uv offset with the ES kernel (planeGridsFrac — no
    //    snap), then degrid each row back from its own w-plane
    //    (planeDegridFrac) — the f10 round trip on the kernel-corrected
    //    scheme. Determinism: the fractional offsets are IEEE-exact
    //    rationals (u·2⁻²), the ES weight is exp/sqrt of those
    //    bit-identical arguments (class (b), the x01 cos-of-exact-phase
    //    precedent), every product rides fsum, and the final back-rotation
    //    is the f10 exact-rational × class-(b) product. Accuracy of this
    //    path against the continuous DFT is CI-asserted in
    //    WGridderAccuracySpec; THIS query pins cross-engine execution.
    Q("f17_es_hessian_vis", {
      val spacing = "(2e0 * 5e0 / 3e0)"
      val theta = "2e0 * pi() * 1e-2 * dw"
      val beta = "((18e-1 * pi()) * 3)"
      def esW(x: String) =
        s"(CASE WHEN abs($x) >= 3 THEN 0e0 ELSE exp($beta * " +
          s"(sqrt(greatest(0e0, 1e0 - (($x) / 3) * (($x) / 3))) - 1e0)) END)"
      s"""WITH rws AS (${uvwRowsSql(16)}), cv AS (${corrVisSql(16)}),
         |pts AS (
         |  SELECT rws.row_id, rws.w,
         |    rws.u * 25e-2 AS cu, rws.v * 25e-2 AS cvv,
         |    cv.xx_re AS re, cv.xx_im AS im
         |  FROM rws JOIN cv ON rws.row_id = cv.row_id),
         |wp AS (
         |  SELECT *, LEAST(GREATEST(
         |      CAST(ROUND((w + 5e0) / $spacing) AS BIGINT), 0), 3) AS wplane
         |  FROM pts),
         |fr AS (
         |  SELECT *, w - (-5e0 + CAST(wplane AS DOUBLE) * $spacing) AS dw,
         |    CAST(ROUND(cu) AS BIGINT) AS pu,
         |    CAST(ROUND(cvv) AS BIGINT) AS pv,
         |    cu - CAST(ROUND(cu) AS BIGINT) AS fru,
         |    cvv - CAST(ROUND(cvv) AS BIGINT) AS frv
         |  FROM wp),
         |c AS (
         |  SELECT *,
         |    re*cos($theta) - im*sin($theta) AS cre,
         |    re*sin($theta) + im*cos($theta) AS cim
         |  FROM fr),
         |offs AS (SELECT unnest(generate_series(-3, 3)) AS o),
         |grid AS MATERIALIZED (
         |  SELECT wplane, pu + oi.o AS gu, pv + oj.o AS gv,
         |    ${Det.fsumSql(s"cre * (${esW("oi.o - fru")} * ${esW("oj.o - frv")})")} AS g_re,
         |    ${Det.fsumSql(s"cim * (${esW("oi.o - fru")} * ${esW("oj.o - frv")})")} AS g_im
         |  FROM c, offs oi, offs oj
         |  GROUP BY wplane, pu + oi.o, pv + oj.o),
         |gath AS (
         |  SELECT p.row_id, p.dw,
         |    ${Det.fsumSql("grid.g_re * (p.wti * p.wtj)")} AS s_re,
         |    ${Det.fsumSql("grid.g_im * (p.wti * p.wtj)")} AS s_im
         |  FROM (SELECT fr.row_id, fr.dw, fr.wplane,
         |          fr.pu + oi.o AS gu, fr.pv + oj.o AS gv,
         |          ${esW("oi.o - fru")} AS wti, ${esW("oj.o - frv")} AS wtj
         |        FROM fr, offs oi, offs oj) p
         |  JOIN grid ON grid.wplane = p.wplane
         |    AND grid.gu = p.gu AND grid.gv = p.gv
         |  GROUP BY p.row_id, p.dw)
         |SELECT row_id,
         |  s_re*cos($theta) - s_im*(-sin($theta)) AS dg_re,
         |  s_re*(-sin($theta)) + s_im*cos($theta) AS dg_im
         |FROM gath""".stripMargin
    }) { (s, dir) =>
      val W = 3
      val beta = graft.functions.Kernels.esBeta(W)
      val p = uvwRows(s, dir, 16)
        .join(corrVis(s, dir, 16), "row_id")
        .select(col("row_id"), col("w"),
          (col("u") * 25e-2).as("cu"), (col("v") * 25e-2).as("cv"),
          col("xx_re").as("re"), col("xx_im").as("im"))
      val grids = graft.operators.WStack.planeGridsFrac(p, W, beta,
        nPlanes = 4, wMax = 5.0, eta = 1e-2,
        fsum = c => Det.fsum(c)).drop("n_hits")
      graft.operators.WStack.planeDegridFrac(p, grids, W, beta,
        nPlanes = 4, wMax = 5.0, eta = 1e-2, fsum = c => Det.fsum(c))
    },

    // -- and through the RESIDUAL round trip
    //    (gridding/wgridder/im2residim.py:16-220 on the ε path): the
    //    residual visibility V − (R·R†)V scatters back to the image with
    //    the same ES fractional kernel — per-plane sparse DFT at the f11
    //    pixel set, image-domain w-correction, plane sum. The hashed
    //    surface is the detaper-free plane sum (an exact fsum rational);
    //    the ES detaper division is CI-asserted in WGridderAccuracySpec
    //    (it is a per-pixel constant, orthogonal to the distributed
    //    algebra verified here).
    Q("f18_es_residual_image", {
      val spacing = "(2e0 * 5e0 / 3e0)"
      val theta = "2e0 * pi() * 1e-2 * dw"
      val beta = "((18e-1 * pi()) * 3)"
      val dftArg = "2e0 * pi() * (gu*lx + gv*my)"
      val ph = s"2e0 * pi() * (-5e0 + CAST(wplane AS DOUBLE) * $spacing) * (-(lx*lx + my*my)/2e0)"
      def esW(x: String) =
        s"(CASE WHEN abs($x) >= 3 THEN 0e0 ELSE exp($beta * " +
          s"(sqrt(greatest(0e0, 1e0 - (($x) / 3) * (($x) / 3))) - 1e0)) END)"
      s"""WITH rws AS (${uvwRowsSql(16)}), cv AS (${corrVisSql(16)}),
         |pts AS (
         |  SELECT rws.row_id, rws.w,
         |    rws.u * 25e-2 AS cu, rws.v * 25e-2 AS cvv,
         |    cv.xx_re AS re, cv.xx_im AS im
         |  FROM rws JOIN cv ON rws.row_id = cv.row_id),
         |wp AS (
         |  SELECT *, LEAST(GREATEST(
         |      CAST(ROUND((w + 5e0) / $spacing) AS BIGINT), 0), 3) AS wplane
         |  FROM pts),
         |fr AS (
         |  SELECT *, w - (-5e0 + CAST(wplane AS DOUBLE) * $spacing) AS dw,
         |    CAST(ROUND(cu) AS BIGINT) AS pu,
         |    CAST(ROUND(cvv) AS BIGINT) AS pv,
         |    cu - CAST(ROUND(cu) AS BIGINT) AS fru,
         |    cvv - CAST(ROUND(cvv) AS BIGINT) AS frv
         |  FROM wp),
         |c AS (
         |  SELECT *,
         |    re*cos($theta) - im*sin($theta) AS cre,
         |    re*sin($theta) + im*cos($theta) AS cim
         |  FROM fr),
         |offs AS (SELECT unnest(generate_series(-3, 3)) AS o),
         |grid AS MATERIALIZED (
         |  SELECT wplane, pu + oi.o AS gu, pv + oj.o AS gv,
         |    ${Det.fsumSql(s"cre * (${esW("oi.o - fru")} * ${esW("oj.o - frv")})")} AS g_re,
         |    ${Det.fsumSql(s"cim * (${esW("oi.o - fru")} * ${esW("oj.o - frv")})")} AS g_im
         |  FROM c, offs oi, offs oj
         |  GROUP BY wplane, pu + oi.o, pv + oj.o),
         |gath AS (
         |  SELECT p.row_id, p.dw,
         |    ${Det.fsumSql("grid.g_re * (p.wti * p.wtj)")} AS s_re,
         |    ${Det.fsumSql("grid.g_im * (p.wti * p.wtj)")} AS s_im
         |  FROM (SELECT fr.row_id, fr.dw, fr.wplane,
         |          fr.pu + oi.o AS gu, fr.pv + oj.o AS gv,
         |          ${esW("oi.o - fru")} AS wti, ${esW("oj.o - frv")} AS wtj
         |        FROM fr, offs oi, offs oj) p
         |  JOIN grid ON grid.wplane = p.wplane
         |    AND grid.gu = p.gu AND grid.gv = p.gv
         |  GROUP BY p.row_id, p.dw),
         |hv AS (
         |  SELECT row_id,
         |    s_re*cos($theta) - s_im*(-sin($theta)) AS dg_re,
         |    s_re*(-sin($theta)) + s_im*cos($theta) AS dg_im
         |  FROM gath),
         |res AS (
         |  SELECT fr.row_id, fr.w, fr.cu, fr.cvv, fr.wplane, fr.dw,
         |    fr.pu, fr.pv, fr.fru, fr.frv,
         |    fr.re - hv.dg_re AS re, fr.im - hv.dg_im AS im
         |  FROM fr JOIN hv ON fr.row_id = hv.row_id),
         |c2 AS (
         |  SELECT *,
         |    re*cos($theta) - im*sin($theta) AS cre,
         |    re*sin($theta) + im*cos($theta) AS cim
         |  FROM res),
         |grid2 AS MATERIALIZED (
         |  SELECT wplane, pu + oi.o AS gu, pv + oj.o AS gv,
         |    ${Det.fsumSql(s"cre * (${esW("oi.o - fru")} * ${esW("oj.o - frv")})")} AS g_re,
         |    ${Det.fsumSql(s"cim * (${esW("oi.o - fru")} * ${esW("oj.o - frv")})")} AS g_im
         |  FROM c2, offs oi, offs oj
         |  GROUP BY wplane, pu + oi.o, pv + oj.o),
         |px AS (
         |  SELECT CAST(t.n_nationkey AS BIGINT) AS x,
         |    CAST(a.n_nationkey AS BIGINT) AS y,
         |    (CAST(t.n_nationkey AS DOUBLE) - 4e0)/1024e0 AS lx,
         |    (CAST(a.n_nationkey AS DOUBLE) - 4e0)/1024e0 AS my
         |  FROM nation t, nation a
         |  WHERE t.n_nationkey < 8 AND a.n_nationkey < 8),
         |pimg AS (
         |  SELECT wplane, x, y, lx, my,
         |    ${Det.fsumSql(s"g_re*cos($dftArg) - g_im*sin($dftArg)")} AS img_re,
         |    ${Det.fsumSql(s"g_re*sin($dftArg) + g_im*cos($dftArg)")} AS img_im
         |  FROM grid2, px GROUP BY wplane, x, y, lx, my)
         |SELECT x, y,
         |  ${Det.fsumSql(s"img_re*cos($ph) - img_im*sin($ph)")} AS dirty
         |FROM pimg GROUP BY x, y, lx, my""".stripMargin
    }) { (s, dir) =>
      val W = 3
      val beta = graft.functions.Kernels.esBeta(W)
      val p = uvwRows(s, dir, 16)
        .join(corrVis(s, dir, 16), "row_id")
        .select(col("row_id"), col("w"),
          (col("u") * 25e-2).as("cu"), (col("v") * 25e-2).as("cv"),
          col("xx_re").as("re"), col("xx_im").as("im"))
      val grids = graft.operators.WStack.planeGridsFrac(p, W, beta,
        nPlanes = 4, wMax = 5.0, eta = 1e-2,
        fsum = c => Det.fsum(c)).drop("n_hits")
      // the row payload rides the gather's grouping key (carry — round
      // 14): the residual subtraction then needs NO join-back against p,
      // which removes a recompute of the whole uvw⋈vis left side plus a
      // two-sided row_id exchange; groups and fsums are unchanged, so
      // every grid2 cell is bit-identical
      val hv = graft.operators.WStack.planeDegridFrac(p, grids, W, beta,
        nPlanes = 4, wMax = 5.0, eta = 1e-2, fsum = c => Det.fsum(c),
        carry = Seq("w", "cu", "cv", "re", "im"))
      val res = hv
        .select(col("row_id"), col("w"), col("cu"), col("cv"),
          (col("re") - col("dg_re")).as("re"),
          (col("im") - col("dg_im")).as("im"))
      val grids2 = graft.operators.WStack.planeGridsFrac(res, W, beta,
        nPlanes = 4, wMax = 5.0, eta = 1e-2,
        fsum = c => Det.fsum(c)).drop("n_hits")
      val nat = graft.core.Tables.nation(s, dir).filter(col("n_nationkey") < 8)
      val px = nat.select(col("n_nationkey").cast("long").as("x"))
        .crossJoin(nat.select(col("n_nationkey").cast("long").as("y")))
        .withColumn("lx", (col("x").cast("double") - lit(4e0)) / 1024e0)
        .withColumn("my", (col("y").cast("double") - lit(4e0)) / 1024e0)
      graft.operators.WStack.dirtyPlanesSum(grids2, px,
        nPlanes = 4, wMax = 5.0, fsum = c => Det.fsum(c))
        .select(col("x"), col("y"), col("dirty"))
    },

    // -- F3 analogue: grid-free residual image
    //    (gridding/wgridder/im2residim.py:16-220 semantics): forward-DFT
    //    the model image to vis (d01's casa-sign R), subtract from the
    //    observed vis, adjoint back to the image pixels with R† =
    //    Re[e^{-iψ}·], all in two fixed-point aggregations. The model
    //    vis entering the subtraction are fsum rationals, so the second
    //    aggregation stays deterministic.
    Q("f12_dft_residual", {
      import SyntheticMs.{phaseCasaSql, baseReSql, baseImSql}
      s"""WITH src AS (${sourcesSql(5)}), rws AS (${uvwRowsSql(16)}),
         |ch AS (${channelsSql(8)}),
         |mv AS (
         |  SELECT row_id, chan,
         |    ${Det.fsumSql(s"flux * cos($phaseCasaSql)")} AS mre,
         |    ${Det.fsumSql(s"flux * sin($phaseCasaSql)")} AS mim
         |  FROM rws, src, ch GROUP BY row_id, chan),
         |res AS (
         |  SELECT row_id, chan,
         |    ($baseReSql) - mre AS rre, ($baseImSql) - mim AS rim
         |  FROM mv)
         |SELECT src_id, ch.chan,
         |  ${Det.fsumSql(s"cos($phaseCasaSql) * rre + sin($phaseCasaSql) * rim")} AS residual
         |FROM rws, src, ch, res
         |WHERE res.row_id = rws.row_id AND res.chan = ch.chan
         |GROUP BY src_id, ch.chan""".stripMargin
    }) { (s, dir) =>
      val src = broadcast(sources(s, dir, 5))
      val rws = uvwRows(s, dir, 16)
      val ch = broadcast(channels(s, dir, 8))
      val ph = graft.functions.Phase.phaseDelay(col("l"), col("m"),
        col("u"), col("v"), col("w"), col("freq"), "casa")
      val mv = rws.crossJoin(src).crossJoin(ch)
        .groupBy("row_id", "chan")
        .agg(Det.fsum(col("flux") * ph.re).as("mre"),
          Det.fsum(col("flux") * ph.im).as("mim"))
      val res = mv.select(col("row_id").as("rid"), col("chan").as("rchan"),
        (baseRe(col("row_id"), col("chan")) - col("mre")).as("rre"),
        (baseIm(col("row_id"), col("chan")) - col("mim")).as("rim"))
      rws.crossJoin(src).crossJoin(ch)
        .join(res, col("rid") === col("row_id") && col("rchan") === col("chan"))
        .groupBy("src_id", "chan")
        .agg(Det.fsum(ph.re * col("rre") + ph.im * col("rim")).as("residual"))
    },

    // -- F4 analogue: the hessian application R†R x without touching a
    //    grid (gridding/wgridder/hessian.py:16-199 semantics): forward
    //    DFT of the image, adjoint straight back. HessianSpec checks the
    //    PSD identity <x, Hx> = Σ_rows |Rx|² per channel on this exact
    //    query output.
    Q("f13_dft_hessian", {
      import SyntheticMs.phaseCasaSql
      s"""WITH src AS (${sourcesSql(5)}), rws AS (${uvwRowsSql(16)}),
         |ch AS (${channelsSql(8)}),
         |mv AS (
         |  SELECT row_id, chan,
         |    ${Det.fsumSql(s"flux * cos($phaseCasaSql)")} AS mre,
         |    ${Det.fsumSql(s"flux * sin($phaseCasaSql)")} AS mim
         |  FROM rws, src, ch GROUP BY row_id, chan)
         |SELECT src_id, ch.chan,
         |  ${Det.fsumSql(s"cos($phaseCasaSql) * mre + sin($phaseCasaSql) * mim")} AS hx
         |FROM rws, src, ch, mv
         |WHERE mv.row_id = rws.row_id AND mv.chan = ch.chan
         |GROUP BY src_id, ch.chan""".stripMargin
    }) { (s, dir) =>
      val src = broadcast(sources(s, dir, 5))
      val rws = uvwRows(s, dir, 16)
      val ch = broadcast(channels(s, dir, 8))
      val ph = graft.functions.Phase.phaseDelay(col("l"), col("m"),
        col("u"), col("v"), col("w"), col("freq"), "casa")
      val mv = rws.crossJoin(src).crossJoin(ch)
        .groupBy("row_id", "chan")
        .agg(Det.fsum(col("flux") * ph.re).as("mre"),
          Det.fsum(col("flux") * ph.im).as("mim"))
        .select(col("row_id").as("rid"), col("chan").as("rchan"),
          col("mre"), col("mim"))
      rws.crossJoin(src).crossJoin(ch)
        .join(mv, col("rid") === col("row_id") && col("rchan") === col("chan"))
        .groupBy("src_id", "chan")
        .agg(Det.fsum(ph.re * col("mre") + ph.im * col("mim")).as("hx"))
    },

    // -- F9: the Perley-polyhedron policy families end to end on one row
    //    set — facet baseline transforms ("rotate" + "wlinapprox"), the
    //    facet phase rotation, and an imaginary-coefficient stokes policy
    //    round trip (U → RL/LR → U must be the identity on dyadic U). The
    //    facet offset is small (1e-4 rad) so every trig argument stays in
    //    the libm-safe regime; trig-bearing outputs are r6-rounded on both
    //    engines, the stokes round trip is exact.
    // -- gridding/util.py:4-103 estimate_cell_size: Nyquist cell size in
    //    arcseconds from the uv extent and the minimum wavelength, plus
    //    the reference's ny/nx fitness checks (stated multiplicatively so
    //    neither engine divides by a possibly-zero umin). Two scalar
    //    aggregates (max|u|, min λ) — partial-agg map-side combine, no
    //    data-sized shuffle at any scale. All-IEEE arithmetic: hashed
    //    unrounded.
    Q("f14_cell_size", {
      def cell(mx: String) = s"(1e0 / (2e0 * 3e0 * ($mx / wave_min)))"
      def fits(mx: String, mn: String) =
        s"NOT (${cell(mx)} * 64e0 * ($mn / wave_min) < 1e0)"
      s"""WITH rws AS (${uvwRowsSql(16)}), ch AS (${channelsSql(8)}),
         |uv AS (
         |  SELECT max(abs(u)) AS umax, min(abs(u)) AS umin,
         |    max(abs(v)) AS vmax, min(abs(v)) AS vmin FROM rws),
         |wv AS (SELECT min(299792458e0 / freq) AS wave_min FROM ch)
         |SELECT
         |  ${cell("umax")} * (180e0 / pi()) * 3600e0 AS u_cell_arcsec,
         |  ${cell("vmax")} * (180e0 / pi()) * 3600e0 AS v_cell_arcsec,
         |  ${fits("umax", "umin")} AS fits_ny,
         |  ${fits("vmax", "vmin")} AS fits_nx
         |FROM uv, wv""".stripMargin
    }) { (s, dir) =>
      val uv = uvwRows(s, dir, 16).agg(
        max(abs(col("u"))).as("umax"), min(abs(col("u"))).as("umin"),
        max(abs(col("v"))).as("vmax"), min(abs(col("v"))).as("vmin"))
      val wv = channels(s, dir, 8)
        .agg(min(lit(299792458e0) / col("freq")).as("wave_min"))
      def cell(mx: Column): Column =
        lit(1e0) / (lit(2e0) * lit(3e0) * (mx / col("wave_min")))
      def fits(mx: Column, mn: Column): Column =
        !(cell(mx) * lit(64e0) * (mn / col("wave_min")) < lit(1e0))
      uv.crossJoin(wv).select(
        (cell(col("umax")) * (lit(180e0) / lit(math.Pi)) * lit(3600e0)).as("u_cell_arcsec"),
        (cell(col("vmax")) * (lit(180e0) / lit(math.Pi)) * lit(3600e0)).as("v_cell_arcsec"),
        fits(col("umax"), col("umin")).as("fits_ny"),
        fits(col("vmax"), col("vmin")).as("fits_nx"))
    },

    Q("f08_facet_policies", {
      import SqlCx.CS
      import graft.core.Det.r6Sql
      val dra = "((25e-2 + 1e-4) - 25e-2)"
      val dec = "(-38e-2 - 5e-5)"
      val dec0 = "-38e-2"
      val (cDRa, sDRa) = (s"cos($dra)", s"sin($dra)")
      val (cNd, sNd) = (s"cos($dec)", s"sin($dec)")
      val (cOd, sOd) = (s"cos($dec0)", s"sin($dec0)")
      // "rotate" matrix, textually mirroring the Column tree
      val m11 = cDRa; val m12 = s"$sOd*$sDRa"; val m13 = s"(-$cOd)*$sDRa"
      val m21 = s"(-$sNd)*$sDRa"
      val m22 = s"$sNd*$sOd*$cDRa + $cNd*$cOd"
      val m23 = s"(-$cOd)*$sNd*$cDRa + $cNd*$sOd"
      val m31 = s"$cNd*$sDRa"
      val m32 = s"(-$cNd)*$sOd*$cDRa + $sNd*$cOd"
      val m33 = s"$cNd*$cOd*$cDRa + $sNd*$sOd"
      // wlinapprox
      val li0 = s"$cNd*$sDRa"
      val mi0 = s"$sNd*$cOd - $cNd*$sOd*$cDRa"
      val ni0 = s"$sNd*$sOd + $cNd*$cOd*$cDRa"
      // phase rotation
      val ll = s"$cNd*$sDRa"
      val mm = s"$sNd*$cOd - $cNd*$sOd*$cDRa"
      val nn = s"(-(1e0 - sqrt(1e0 - ($ll)*($ll) - ($mm)*($mm))))"
      val lam = "(299792458e0 / 14e8)"
      val x = s"1e0 * 2e0 * pi() * (u*($ll) + v*($mm) + w*($nn)) / $lam"
      val vis = CS("((row_id*13) % 19 - 9)/16e0", "((row_id*17) % 11 - 5)/16e0")
      val rot = vis * CS(s"cos($x)", s"sin($x)")
      // stokes policy round trip (exact)
      val uS = CS("((row_id*3) % 7 - 3)/8e0", "((row_id*5) % 9 - 4)/8e0")
      val csI = CS("0e0", "1e0")
      val rl = csI * uS
      val lr = (csI * uS).neg
      val uRt = csI.neg * (rl - lr).scale("5e-1")
      s"""WITH rws AS (${uvwRowsSql(32)})
         |SELECT row_id,
         |  ${r6Sql(s"$m11*u + ($m12)*v + ($m13)*w")} AS ru,
         |  ${r6Sql(s"($m21)*u + ($m22)*v + ($m23)*w")} AS rv,
         |  ${r6Sql(s"($m31)*u + ($m32)*v + ($m33)*w")} AS rw,
         |  ${r6Sql(s"u - w*($li0)/($ni0)")} AS wu,
         |  ${r6Sql(s"v - w*($mi0)/($ni0)")} AS wv,
         |  ${r6Sql(rot.re)} AS pv_re, ${r6Sql(rot.im)} AS pv_im,
         |  ${rl.re} AS rl_re, ${rl.im} AS rl_im,
         |  ${uRt.re} AS u_re, ${uRt.im} AS u_im
         |FROM rws""".stripMargin
    }) { (s, dir) =>
      import graft.functions.GridPolicies
      import graft.functions.GridPolicies.Uvw
      import graft.core.{Cx, CxCol, Det}
      val ra0 = lit(25e-2); val dec0 = lit(-38e-2)
      val ra = lit(25e-2) + 1e-4
      val dec = lit(-38e-2) - 5e-5
      val uvw = Uvw(col("u"), col("v"), col("w"))
      val rotU = GridPolicies.uvwTransform("rotate", uvw, ra0, dec0, ra, dec)
      val linU = GridPolicies.uvwTransform("wlinapprox", uvw, ra0, dec0, ra, dec)
      val lam = lit(299792458e0) / 14e8
      val pf = GridPolicies.phaseFactor("phase_rotate", uvw, lam,
        ra0, dec0, ra, dec)
      val vis = CxCol(((col("row_id") * 13) % 19 - 9) / 16e0,
        ((col("row_id") * 17) % 11 - 5) / 16e0)
      val rot = vis * pf
      val uS = CxCol(((col("row_id") * 3) % 7 - 3) / 8e0,
        ((col("row_id") * 5) % 9 - 4) / 8e0)
      val Seq(rl, lr) = GridPolicies.stokes2corr("RLLR_FROM_U", uS)
      val uRt = GridPolicies.corr2stokes("U_FROM_RLLR", Seq(rl, lr))
      uvwRows(s, dir, 32).select(col("row_id"),
        Det.r6(rotU.u).as("ru"), Det.r6(rotU.v).as("rv"), Det.r6(rotU.w).as("rw"),
        Det.r6(linU.u).as("wu"), Det.r6(linU.v).as("wv"),
        Det.r6(rot.re).as("pv_re"), Det.r6(rot.im).as("pv_im"),
        rl.re.as("rl_re"), rl.im.as("rl_im"),
        uRt.re.as("u_re"), uRt.im.as("u_im"))
    },

    // -- F8 under the gate: the oversampled sinc and Hanning-sinc AA
    //    kernels (functions/Kernels — kernels.py:17-95) hashed against
    //    the oracle's closed-form recompute over the identical
    //    half-support-7, oversample-5 index grid. Kernel construction is
    //    driver-side precompute (the reference's is too); hashing the
    //    full arrays gates the index→coordinate map, the zero-guard and
    //    the window product. Determinism: the argument (i−35)/5 is one
    //    exact IEEE division (bit-identical), sin/cos of a bit-identical
    //    argument is class (b), and the r4 output bucket carries the
    //    KernelsSpec-measured flip margins (class (d), the r13 recipe).
    //    The Kaiser-Bessel variant stays spec-only: its Bessel series
    //    has a data-dependent term count no fixed SQL tree restates.
    Q("f15_aa_kernels", {
      val x = "((CAST(i AS DOUBLE) - 35e0) / 5e0)"
      val sinc = s"CASE WHEN $x = 0e0 THEN 1e0 ELSE sin(pi()*$x)/(pi()*$x) END"
      val han = s"($sinc) * (5e-1 + 5e-1 * cos((pi() * (CAST(i AS DOUBLE) - 35e0)) / 36e0))"
      s"""WITH idx AS (
         |  SELECT CAST(a.n_nationkey * 3 + b.n_nationkey AS BIGINT) AS i
         |  FROM nation a, nation b
         |  WHERE b.n_nationkey < 3 AND a.n_nationkey * 3 + b.n_nationkey < 71)
         |SELECT i, ${Det.r4Sql(sinc)} AS sinc_tap, ${Det.r4Sql(han)} AS hanning_tap
         |FROM idx""".stripMargin
    }) { (s, dir) =>
      import graft.functions.Kernels
      import s.implicits._
      val sv = Kernels.sinc(7, 5)
      val hv = Kernels.hanningSinc(7, 5)
      sv.indices.map(i => (i.toLong, sv(i), hv(i))).toSeq
        .toDF("i", "s_raw", "h_raw")
        .select(col("i"), Det.r4(col("s_raw")).as("sinc_tap"),
          Det.r4(col("h_raw")).as("hanning_tap"))
    })
}
