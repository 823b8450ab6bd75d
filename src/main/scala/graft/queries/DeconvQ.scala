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
    })
}
