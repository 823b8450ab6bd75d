package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
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
         |SELECT pts.row_id,
         |  SUM(grid.g_re * ti.tap * tj.tap) AS dg_re,
         |  SUM(grid.g_im * ti.tap * tj.tap) AS dg_im
         |FROM pts, taps ti, taps tj, grid
         |WHERE grid.gu = pts.pu + ti.off AND grid.gv = pts.pv + tj.off
         |GROUP BY pts.row_id""".stripMargin) { (s, dir) =>
      val p = pts(s, dir)
      Gridder.degrid(p, Gridder.scatter(p, Taps), Taps)
    })
}
