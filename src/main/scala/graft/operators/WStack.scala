package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{Cx, CxCol}

/** W-stacking layout — the Spark-native face of the wgridder family
  * (SURVEY §2.7 F1-F5; africanus/gridding/wgridder/vis2im.py:15-196
  * delegates the whole pipeline to ducc0's C++ kernel).
  *
  * The distributed part of a wgridder is exactly what Spark is good at:
  * (1) snap every row to its nearest w-plane, (2) rotate the visibility
  * by the RESIDUAL w phase e^{2πi·Δw·η} (η = the field-centre (n−1)
  * scale), (3) grid each plane independently — one aggregation keyed by
  * (plane, cell), shuffle volume = occupied cells × planes. The per-plane
  * FFT + image-domain accumulation that ducc0 performs stays a
  * plane-parallel driver/executor-local step downstream (each plane's
  * grid is independent), exactly like the reference's dask wrapper hands
  * each chunk to the C++ kernel.
  */
object WStack {

  /** Plane assignment: index p ∈ [0, nPlanes) of the nearest plane on the
    * uniform grid [-wMax, wMax]; returns (plane, wPlane, dw). */
  def planeCols(w: Column, nPlanes: Int, wMax: Double): (Column, Column, Column) = {
    val spacing = 2.0 * wMax / (nPlanes - 1)
    val p = least(greatest(round((w + wMax) / spacing).cast("long"), lit(0L)),
      lit(nPlanes - 1L))
    val wp = lit(-wMax) + p.cast("double") * spacing
    (p, wp, w - wp)
  }

  /** Residual-w phase rotation factor e^{i·2π·dw·eta}. */
  def residualFactor(dw: Column, eta: Double): CxCol =
    Cx.expi(lit(2.0 * math.Pi * eta) * dw)

  /** Per-plane convolutional grid of residual-corrected visibilities.
    * pts columns: pu, pv, re, im, w. Output: (wplane, gu, gv, sums). */
  def planeGrids(pts: DataFrame, taps: Seq[(Int, Double)],
                 nPlanes: Int, wMax: Double, eta: Double,
                 fsum: Column => Column): DataFrame = {
    val s = pts.sparkSession
    import s.implicits._
    val (p, _, dw) = planeCols(col("w"), nPlanes, wMax)
    val f = residualFactor(dw, eta)
    val v = CxCol(col("re"), col("im")) * f
    val t = taps.toDF("off", "tap")
    val ti = broadcast(t.select(col("off").as("oi"), col("tap").as("wi")))
    val tj = broadcast(t.select(col("off").as("oj"), col("tap").as("wj")))
    pts.withColumn("wplane", p)
      .withColumn("cre", v.re).withColumn("cim", v.im)
      .crossJoin(ti).crossJoin(tj)
      .withColumn("gu", col("pu") + col("oi"))
      .withColumn("gv", col("pv") + col("oj"))
      .groupBy("wplane", "gu", "gv")
      .agg(fsum(col("cre") * col("wi") * col("wj")).as("g_re"),
        fsum(col("cim") * col("wi") * col("wj")).as("g_im"),
        count(lit(1)).as("n_hits"))
  }

  /** Adjoint: sample each row's OWN w-plane grid with the stencil, then
    * back-rotate by the residual-w phase conjugate — the degrid half of
    * the w-stacked round trip. The gather uses the same fixed-point sum
    * discipline as the grid (grid values are inexact doubles; a raw sum
    * would be order-dependent). Output: (row_id, dg_re, dg_im). */
  def planeDegrid(pts: DataFrame, grids: DataFrame,
                  taps: Seq[(Int, Double)],
                  nPlanes: Int, wMax: Double, eta: Double,
                  fsum: Column => Column): DataFrame = {
    val s = pts.sparkSession
    import s.implicits._
    val (p, _, dw) = planeCols(col("w"), nPlanes, wMax)
    val t = taps.toDF("off", "tap")
    val ti = broadcast(t.select(col("off").as("oi"), col("tap").as("wi")))
    val tj = broadcast(t.select(col("off").as("oj"), col("tap").as("wj")))
    val gathered = pts.withColumn("wplane", p).withColumn("dw", dw)
      .crossJoin(ti).crossJoin(tj)
      .withColumn("gu", col("pu") + col("oi"))
      .withColumn("gv", col("pv") + col("oj"))
      .join(grids, Seq("wplane", "gu", "gv"))
      .groupBy("row_id", "dw")
      .agg(fsum(col("g_re") * col("wi") * col("wj")).as("s_re"),
        fsum(col("g_im") * col("wi") * col("wj")).as("s_im"))
    val f = residualFactor(col("dw"), eta).conj
    val v = CxCol(col("s_re"), col("s_im")) * f
    gathered.select(col("row_id"), v.re.as("dg_re"), v.im.as("dg_im"))
  }
}
