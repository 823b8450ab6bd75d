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
    })
}
