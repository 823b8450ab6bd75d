package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Det
import graft.queries.SyntheticMs._

/** Measures and DOCUMENTS the accuracy envelope of the w-stack gridder
  * against the exact per-visibility DFT — the honesty contract for
  * VERDICT's "ducc0-accuracy" gap: the reference wraps ducc0's
  * kernel-corrected w-gridder (gridding/wgridder/vis2im.py:15-196),
  * which guarantees a user-specified epsilon; our `WStack` is the
  * w-stacked educational class, whose error is the w-plane residual.
  * This spec pins that envelope with numbers instead of hand-waving:
  *
  *  - the taps+detaper round trip is EXACT for snapped coordinates
  *    (Σ_off tap·e^{2πi(pu+off)l} = e^{2πi·pu·l}·taper(l) identically),
  *    so (dirty_dt − exactSnapped) isolates the w-term error alone;
  *  - that error must CONVERGE as nPlanes grows (the ducc0 accuracy
  *    knob's analogue), measured here at 4/8/16 planes;
  *  - the pixel-snap error (exactSnapped − exactContinuous) is the
  *    fixed floor a finer uv grid (smaller cell) would shrink — reported
  *    for the record, not asserted against nPlanes.
  *
  * Production guidance encoded by these numbers (see SURVEY §8): for
  * ducc0-matching accuracy use the exact-DFT path (d01/d02, f12/f13) or
  * raise nPlanes/grid resolution; the w-stack path trades accuracy for
  * the FFT-shaped plan.
  */
class WGridderAccuracySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import graft.queries.GriddingQ.Taps

  test("w-stack dirty image: w-term error converges in nPlanes; snap floor on record") {
    val dir = TestSpark.sf
    val rows = uvwRows(spark, dir, 32)
      .join(corrVis(spark, dir, 32), "row_id")
      .select(col("row_id"), col("u"), col("v"), col("w"),
        col("xx_re"), col("xx_im"))
      .collect()
      .map(r => (r.getDouble(1) * 25e-2, r.getDouble(2) * 25e-2,
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val pix = for (x <- 0 until 8; y <- 0 until 8)
      yield (x, y, (x - 4) / 1024.0, (y - 4) / 1024.0)

    def exact(snap: Boolean): Map[(Int, Int), Double] =
      pix.map { case (x, y, lx, my) =>
        val eta = -(lx * lx + my * my) / 2.0
        var s = 0.0
        for ((uu, vv, w, re, im) <- rows) {
          val u = if (snap) math.rint(uu) else uu
          val v = if (snap) math.rint(vv) else vv
          val arg = 2.0 * math.Pi * (u * lx + v * my + w * eta)
          s += re * math.cos(arg) - im * math.sin(arg)
        }
        (x, y) -> s
      }.toMap

    val exSnap = exact(snap = true)
    val exCont = exact(snap = false)
    val scale = exCont.values.map(math.abs).max

    def wstack(nPlanes: Int): Map[(Int, Int), Double] = {
      val p = uvwRows(spark, dir, 32)
        .join(corrVis(spark, dir, 32), "row_id")
        .select(col("row_id"), col("w"),
          round(col("u") * 25e-2).cast("long").as("pu"),
          round(col("v") * 25e-2).cast("long").as("pv"),
          col("xx_re").as("re"), col("xx_im").as("im"))
      val grids = graft.operators.WStack.planeGrids(p, Taps,
        nPlanes = nPlanes, wMax = 5.0, eta = 0.0,
        fsum = c => Det.fsum(c, 1e9)).drop("n_hits")
      val px = spark.createDataFrame(pix.map { case (x, y, lx, my) =>
        (x.toLong, y.toLong, lx, my) })
        .toDF("x", "y", "lx", "my")
      graft.operators.WStack.dirtyImageDft(grids, px, Taps,
        nPlanes = nPlanes, wMax = 5.0,
        fsum = c => Det.fsum(c, 1e9), r6 = c => c)
        .collect()
        .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) ->
          r.getAs[Double]("dirty_dt")).toMap
    }

    val errs = Seq(4, 8, 16).map { np =>
      val ws = wstack(np)
      val e = pix.map { case (x, y, _, _) =>
        math.abs(ws((x, y)) - exSnap((x, y))) }.max / scale
      np -> e
    }
    val snapFloor = pix.map { case (x, y, _, _) =>
      math.abs(exSnap((x, y)) - exCont((x, y))) }.max / scale
    info(f"w-term relative error: " +
      errs.map { case (np, e) => f"$np planes → $e%.2e" }.mkString(", ") +
      f"; pixel-snap floor (uv-cell artifact, nPlanes-independent) = $snapFloor%.2e")
    // the envelope: small at the f11 operating point, and the nPlanes
    // knob must actually converge (each doubling strictly reduces error)
    // measured 6.7e-5 at 4 planes (deterministic inputs/ops) — 3x slack
    assert(errs.head._2 < 2e-4,
      s"4-plane w-term error ${errs.head._2} above the documented envelope")
    assert(errs(1)._2 < errs.head._2 && errs(2)._2 < errs(1)._2,
      s"w-term error must shrink with nPlanes: $errs")
  }

  test("ES-kernel fractional gridder: TOTAL error vs the exact continuous DFT < 2e-4 at 8 planes; support is the epsilon knob") {
    // the round-8 ε knob: no uv snap at all — visibilities scatter with
    // the ES kernel at their exact fractional offset and the image divides
    // by the kernel's continuous transform. Total error (w-term + kernel
    // aliasing) replaces the old 1.2e-3 pixel-snap floor.
    val dir = TestSpark.sf
    val rows = uvwRows(spark, dir, 32)
      .join(corrVis(spark, dir, 32), "row_id")
      .select(col("row_id"), col("u"), col("v"), col("w"),
        col("xx_re"), col("xx_im"))
      .collect()
      .map(r => (r.getDouble(1) * 25e-2, r.getDouble(2) * 25e-2,
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val pix = for (x <- 0 until 8; y <- 0 until 8)
      yield (x, y, (x - 4) / 1024.0, (y - 4) / 1024.0)
    val exCont = pix.map { case (x, y, lx, my) =>
      val eta = -(lx * lx + my * my) / 2.0
      var s = 0.0
      for ((u, v, w, re, im) <- rows) {
        val arg = 2.0 * math.Pi * (u * lx + v * my + w * eta)
        s += re * math.cos(arg) - im * math.sin(arg)
      }
      (x, y) -> s
    }.toMap
    val scale = exCont.values.map(math.abs).max

    def fracDirty(w: Int, beta: Double, nPlanes: Int): Map[(Int, Int), Double] = {
      val p = uvwRows(spark, dir, 32)
        .join(corrVis(spark, dir, 32), "row_id")
        .select(col("row_id"), col("w"),
          (col("u") * 25e-2).as("cu"), (col("v") * 25e-2).as("cv"),
          col("xx_re").as("re"), col("xx_im").as("im"))
      val grids = graft.operators.WStack.planeGridsFrac(p, w, beta,
        nPlanes = nPlanes, wMax = 5.0, eta = 0.0,
        fsum = c => Det.fsum(c, 1e9)).drop("n_hits")
      val px = spark.createDataFrame(pix.map { case (x, y, lx, my) =>
        (x.toLong, y.toLong, lx, my) })
        .toDF("x", "y", "lx", "my")
      graft.operators.WStack.dirtyPlanesSum(grids, px,
        nPlanes = nPlanes, wMax = 5.0, fsum = c => Det.fsum(c, 1e9))
        .collect()
        .map { r =>
          val lx = r.getAs[Double]("lx"); val my = r.getAs[Double]("my")
          val dt = graft.functions.Kernels.esTransform(w, beta, lx) *
            graft.functions.Kernels.esTransform(w, beta, my)
          (r.getLong(0).toInt, r.getLong(1).toInt) ->
            r.getAs[Double]("dirty") / dt
        }.toMap
    }

    def err(m: Map[(Int, Int), Double]): Double =
      pix.map { case (x, y, _, _) => math.abs(m((x, y)) - exCont((x, y))) }
        .max / scale

    // the support knob (ducc0's epsilon): each step must tighten until
    // the w-term residual dominates. β = Kernels.esBeta (1.8πw — the
    // measured optimum for aliases a full cycle out; see esSupportFor)
    import graft.functions.Kernels.esBeta
    val eW2 = err(fracDirty(2, esBeta(2), 8))
    val eW3 = err(fracDirty(3, esBeta(3), 8))
    info(f"ES-kernel total error at 8 planes: W=2 → $eW2%.2e, W=3 → $eW3%.2e " +
      f"(old pixel-snap floor was ~1.2e-3)")
    assert(eW3 < 2e-4, s"total error $eW3 misses the 2e-4 contract at 8 planes")
    assert(eW3 <= eW2, s"support knob not monotone: W=2 → $eW2, W=3 → $eW3")
  }

  test("deep-epsilon tier: W=4 at 32 planes reaches the 1e-5 class") {
    // the knob composed both ways at once — wider kernel support (alias
    // error 1.5e-9 at W=4) AND 4x the w-planes ((Δw)² residual → ~16x
    // down from the 8-plane operating point): the configuration a user
    // dials in for ducc0-class epsilon when the FFT-shaped plan must be
    // kept. Cost scales as W²·nPlanes — this is the accuracy end of the
    // trade, not the default.
    val dir = TestSpark.sf
    val rows = uvwRows(spark, dir, 32)
      .join(corrVis(spark, dir, 32), "row_id")
      .select(col("row_id"), col("u"), col("v"), col("w"),
        col("xx_re"), col("xx_im"))
      .collect()
      .map(r => (r.getDouble(1) * 25e-2, r.getDouble(2) * 25e-2,
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val pix = for (x <- 0 until 8; y <- 0 until 8)
      yield (x, y, (x - 4) / 1024.0, (y - 4) / 1024.0)
    val exCont = pix.map { case (x, y, lx, my) =>
      val eta = -(lx * lx + my * my) / 2.0
      var s = 0.0
      for ((u, v, w, re, im) <- rows) {
        val arg = 2.0 * math.Pi * (u * lx + v * my + w * eta)
        s += re * math.cos(arg) - im * math.sin(arg)
      }
      (x, y) -> s
    }.toMap
    val scale = exCont.values.map(math.abs).max
    import graft.functions.Kernels.esBeta
    val W = 4
    val p = uvwRows(spark, dir, 32)
      .join(corrVis(spark, dir, 32), "row_id")
      .select(col("row_id"), col("w"),
        (col("u") * 25e-2).as("cu"), (col("v") * 25e-2).as("cv"),
        col("xx_re").as("re"), col("xx_im").as("im"))
    val grids = graft.operators.WStack.planeGridsFrac(p, W, esBeta(W),
      nPlanes = 32, wMax = 5.0, eta = 0.0,
      fsum = c => Det.fsum(c, 1e9)).drop("n_hits")
    val px = spark.createDataFrame(pix.map { case (x, y, lx, my) =>
      (x.toLong, y.toLong, lx, my) })
      .toDF("x", "y", "lx", "my")
    val got = graft.operators.WStack.dirtyPlanesSum(grids, px,
      nPlanes = 32, wMax = 5.0, fsum = c => Det.fsum(c, 1e9))
      .collect()
      .map { r =>
        val lx = r.getAs[Double]("lx"); val my = r.getAs[Double]("my")
        val dt = graft.functions.Kernels.esTransform(W, esBeta(W), lx) *
          graft.functions.Kernels.esTransform(W, esBeta(W), my)
        (r.getLong(0).toInt, r.getLong(1).toInt) ->
          r.getAs[Double]("dirty") / dt
      }.toMap
    val e = pix.map { case (x, y, _, _) =>
      math.abs(got((x, y)) - exCont((x, y))) }.max / scale
    info(f"deep-epsilon total error (W=4, 32 planes): $e%.2e")
    assert(e < 1e-5, s"deep tier error $e above the 1e-5 class")
  }

  test("deep-epsilon tier 2: esTierFor(1e-6) = (W=5, 32 planes) + w-interp breaks 1e-6 total error") {
    // the round-9 tier: W=5's aliasing floor is 3.2e-12, and the two-plane
    // linear w-interpolation scatter (planeGridsFracW2) replaces the
    // snap's first-order truncation (measured LINEAR in Δw: 2.9e-5 →
    // 1.9e-6 over 8 → 128 planes — brute plane count is a dense-data
    // shuffle tax) with a second-order (Δw)² residual — the 1e-9 class at
    // 32 planes. Occupied (plane, cell) groups stay bounded by 2x the row
    // count (the scale contract stated on esTierFor).
    val dir = TestSpark.sf
    val (wSup, nPlanes) = graft.functions.Kernels.esTierFor(1e-6)
    assert(wSup === 5 && nPlanes === 32)
    val rows = uvwRows(spark, dir, 32)
      .join(corrVis(spark, dir, 32), "row_id")
      .select(col("row_id"), col("u"), col("v"), col("w"),
        col("xx_re"), col("xx_im"))
      .collect()
      .map(r => (r.getDouble(1) * 25e-2, r.getDouble(2) * 25e-2,
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val pix = for (x <- 0 until 8; y <- 0 until 8)
      yield (x, y, (x - 4) / 1024.0, (y - 4) / 1024.0)
    val exCont = pix.map { case (x, y, lx, my) =>
      val eta = -(lx * lx + my * my) / 2.0
      var s = 0.0
      for ((u, v, w, re, im) <- rows) {
        val arg = 2.0 * math.Pi * (u * lx + v * my + w * eta)
        s += re * math.cos(arg) - im * math.sin(arg)
      }
      (x, y) -> s
    }.toMap
    val scale = exCont.values.map(math.abs).max
    import graft.functions.Kernels.esBeta
    val p = uvwRows(spark, dir, 32)
      .join(corrVis(spark, dir, 32), "row_id")
      .select(col("row_id"), col("w"),
        (col("u") * 25e-2).as("cu"), (col("v") * 25e-2).as("cv"),
        col("xx_re").as("re"), col("xx_im").as("im"))
    val grids = graft.operators.WStack.planeGridsFracW2(p, wSup, esBeta(wSup),
      nPlanes = nPlanes, wMax = 5.0,
      fsum = c => Det.fsum(c, 1e9)).drop("n_hits")
    val px = spark.createDataFrame(pix.map { case (x, y, lx, my) =>
      (x.toLong, y.toLong, lx, my) })
      .toDF("x", "y", "lx", "my")
    val got = graft.operators.WStack.dirtyPlanesSum(grids, px,
      nPlanes = nPlanes, wMax = 5.0, fsum = c => Det.fsum(c, 1e9))
      .collect()
      .map { r =>
        val lx = r.getAs[Double]("lx"); val my = r.getAs[Double]("my")
        val dt = graft.functions.Kernels.esTransform(wSup, esBeta(wSup), lx) *
          graft.functions.Kernels.esTransform(wSup, esBeta(wSup), my)
        (r.getLong(0).toInt, r.getLong(1).toInt) ->
          r.getAs[Double]("dirty") / dt
      }.toMap
    val e = pix.map { case (x, y, _, _) =>
      math.abs(got((x, y)) - exCont((x, y))) }.max / scale
    info(f"deep-epsilon tier-2 total error (W=5, 32 planes, w-interp): $e%.2e")
    assert(e < 1e-6, s"tier-2 error $e above the 1e-6 contract")
  }

  test("ES-kernel fractional DEGRID: image -> continuous-coordinate vis matches the direct DFT") {
    // the adjoint side of the ε contract (im2vis): detaper the image by
    // K̂, DFT it onto the integer grid, then gather each visibility at its
    // EXACT fractional offset with the ES kernel — the reconstructed vis
    // must match the direct image DFT at the continuous coordinates to
    // the kernel's aliasing ε (no w-term here: η = 0 isolates the kernel)
    import graft.functions.Kernels
    val dir = TestSpark.sf
    val W = 3; val beta = Kernels.esBeta(W)
    val pix = for (x <- 0 until 8; y <- 0 until 8)
      yield ((x - 4) / 1024.0, (y - 4) / 1024.0,
        ((x * 5 + y * 3) % 9 - 4) / 8.0) // dyadic image values
    val vis = uvwRows(spark, dir, 32)
      .select(col("row_id"), (col("u") * 25e-2).as("cu"),
        (col("v") * 25e-2).as("cv"))
      .filter(abs(col("cu")) <= 20 && abs(col("cv")) <= 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(vis.nonEmpty)

    // dense grid of the detapered image over the needed cell range
    val cells = for {
      gu <- -(20 + W) to (20 + W); gv <- -(20 + W) to (20 + W)
    } yield {
      var re = 0.0; var im = 0.0
      for ((lx, my, v) <- pix) {
        val vd = v / (Kernels.esTransform(W, beta, lx) *
          Kernels.esTransform(W, beta, my))
        val arg = -2.0 * math.Pi * (gu * lx + gv * my)
        re += vd * math.cos(arg); im += vd * math.sin(arg)
      }
      (1L, gu.toLong, gv.toLong, re, im) // plane index of w=0 at nPlanes=2
    }
    val grids = spark.createDataFrame(cells)
      .toDF("wplane", "gu", "gv", "g_re", "g_im")
    val pts = spark.createDataFrame(vis.map { case (id, cu, cv) =>
      (id, cu, cv, 0.0) }).toDF("row_id", "cu", "cv", "w")
    // nPlanes = 2 so the plane spacing is finite; w = 0 rows land on the
    // wp = 0 plane (index 1) with dw = 0
    val got = graft.operators.WStack.planeDegridFrac(pts, grids,
        W, beta, nPlanes = 2, wMax = 1.0, eta = 0.0,
        fsum = c => Det.fsum(c, 1e9))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val exact = vis.map { case (id, cu, cv) =>
      var re = 0.0; var im = 0.0
      for ((lx, my, v) <- pix) {
        val arg = -2.0 * math.Pi * (cu * lx + cv * my)
        re += v * math.cos(arg); im += v * math.sin(arg)
      }
      id -> (re, im)
    }.toMap
    val scale = exact.values.map(p => math.hypot(p._1, p._2)).max
    val err = vis.map { case (id, _, _) =>
      math.hypot(got(id)._1 - exact(id)._1, got(id)._2 - exact(id)._2)
    }.max / scale
    info(f"ES-kernel degrid relative error at W=$W: $err%.2e")
    assert(err < 2e-4, s"degrid error $err misses the 2e-4 contract")
  }
}
