package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Gridder
import graft.queries.GriddingQ

/** Sparse-scatter vs dense-treeAggregate equivalence and the gridder/
  * degridder adjointness dot-test (<R x, y> == <x, R† y>), the reference's
  * own invariant (africanus/gridding/wgridder/tests/test_wgridder.py:125-204). */
class GridderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mkPts() = {
    import spark.implicits._
    Seq(
      (0L, 1L, -2L, 2.0, -1.0),
      (1L, -3L, 0L, 1.5, 0.5),
      (2L, 1L, -2L, -0.25, 3.0),
      (3L, 4L, 4L, 1.0, 1.0))
      .toDF("row_id", "pu", "pv", "re", "im")
  }

  test("dense partial-grid path equals sparse scatter aggregation") {
    val pts = mkPts()
    val npix = 16
    val dense = Gridder.gridDense(pts, npix, GriddingQ.Taps)
    val sparse = Gridder.scatter(pts, GriddingQ.Taps).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    for (((gu, gv), (re, im)) <- sparse) {
      val idx = 2 * ((gu.toInt + npix / 2) * npix + (gv.toInt + npix / 2))
      assert(dense(idx) === re, s"re at ($gu,$gv)")
      assert(dense(idx + 1) === im, s"im at ($gu,$gv)")
    }
    assert(dense.map(math.abs).sum ===
      sparse.values.map { case (a, b) => math.abs(a) + math.abs(b) }.sum)
  }

  test("gridder and degridder are adjoint: <R x, y> == <x, R† y>") {
    import spark.implicits._
    val x = mkPts() // visibility-space vector
    // y: grid-space vector over the cells R x occupies (deterministic values)
    val y = Gridder.scatter(x, GriddingQ.Taps)
      .select(col("gu"), col("gv"),
        ((col("gu") * 3 + col("gv") * 7) % 5 / 4e0).as("y_re"),
        ((col("gu") * 5 - col("gv")) % 3 / 2e0).as("y_im"))
    val rx = Gridder.scatter(x, GriddingQ.Taps)
    val lhs = rx.join(y, Seq("gu", "gv"))
      .select(sum(col("g_re") * col("y_re") + col("g_im") * col("y_im")))
      .collect()(0).getDouble(0)
    val rty = Gridder.degrid(x,
      y.select(col("gu"), col("gv"), col("y_re").as("g_re"), col("y_im").as("g_im")),
      GriddingQ.Taps)
    val rhs = x.join(rty, "row_id")
      .select(sum(col("re") * col("dg_re") + col("im") * col("dg_im")))
      .collect()(0).getDouble(0)
    assert(lhs === rhs) // exact: all inputs dyadic
  }
}
