package graft.rime

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.core.{Cx, CxCol, Det}
import graft.functions.Feeds.Jones2x2
import graft.io.{BeamFixture, Fits}

/** The real FITS beam-cube DDE as a fused-RIME term — the Spark analogue
  * of the reference's flagship `BeamCubeDDE`
  * (africanus/experimental/rime/fused/terms/cube_dde.py:19-333), with the
  * sampling semantics of `beam_cube_dde` (africanus/rime/
  * fast_beam_cubes.py:10-54 freq_grid_interp, 110-238 trilinear gather +
  * amplitude renormalization):
  *
  *   - the complex cube is ingested from a REAL FITS file pair through the
  *     `$(corr)`/`$(reim)` filename schema (util/beams.py:212-313) by the
  *     pure-JVM [[graft.io.Fits]] reader; geometry (CRPIX/CDELT/CUNIT) and
  *     the irregular GFREQ1..N frequency grid come from the parsed header;
  *   - data frequencies interpolate BETWEEN beam freq planes; frequencies
  *     outside the grid clamp to the boundary plane and SCALE the (l, m)
  *     coordinates by f/f_boundary (the reference's extrapolation);
  *   - spatial coordinates snap-clamp to the grid edge, then an 8-corner
  *     trilinear gather blends the corner voxels;
  *   - the complex blend is rescaled so its modulus equals the blended
  *     modulus of the corners (amplitude renormalization).
  *
  * Term-protocol mapping (terms/core.py:28-197): `stage` is the setup pass
  * — it derives the per-(source, chan) sampling coordinates and performs
  * the corner gather as BROADCAST joins against the voxel dimension table
  * (the cube is executor-memory sized at any data scale, like the
  * reference's in-memory beam array); `jones` is the sampler — a diagonal
  * complex Jones from the staged blend columns. The cube is identical for
  * both antennas of a baseline (one physical beam), so the staged columns
  * are side-independent and staging is idempotent.
  *
  * Determinism (per CLAUDE.md): voxel values are r4-rounded shared
  * rationals (the r16-proven bucket for the fixture's compound-libm
  * generating model); every coordinate/weight/blend op downstream is
  * IEEE-exact arithmetic of bit-identical inputs (class (a)), so the
  * sampled Jones needs no output rounding before the fsum source sum.
  *
  * `lmZoom` maps the source direction-cosines onto the beam extent (the
  * reference's beam_lm_extents scaling).
  */
final case class BeamCubeTerm(schema: String, lmZoom: Double,
                              regenerate: Boolean = true)
    extends RimeCompiler.DdeTerm {

  override def stage(df: DataFrame, side: String): DataFrame = {
    if (df.columns.contains("bce_re")) return df // one beam, both sides
    // regenerate=true is the oracle-fixture discipline (never trust a
    // stale /tmp cube); regenerate=false consumes EXISTING cubes — e.g.
    // a BeamFactory-written MeqTrees pair — exactly as the reference's
    // loader reads whatever the schema names
    val (reP, imP) =
      if (regenerate) BeamFixture.ensurePair(schema)
      else {
        val Seq((_, pair)) = Fits.beamFilenames(schema, Seq(9))
        pair
      }
    // measured NOTE: the full-Jones term's dimension-staging shape was
    // A/B'd here too and LOST (2.5 → 2.9 s at sf0.1) — the diagonal
    // blend is one cheap codegen'd element_at chain per row and its
    // sandwich references it only twice, so the distinct + checkpoint +
    // join overhead exceeds the saving. Inline per-row staging stays.
    val out = BeamCubeTerm.stageCoords(df, reP, lmZoom)
    BeamCubeTerm.gatherBlend(out, reP, imP, "bce")
  }

  /** Round 14: when the compiler offers the dimension product, the
    * diagonal blend is computed ON THE DRIVER (the FullBeamCubeTerm
    * path — coordsLocal/blendLocal, BeamBlendLocalSpec-pinned
    * bit-identical) and broadcast-joined back. The r13 dimension-staging
    * loss came from the distinct + checkpoint Catalyst pipeline, which
    * the driver computation removes. */
  override def stageWithDims(df: DataFrame, side: String,
                             dims: () => DataFrame): DataFrame = {
    if (df.columns.contains("bce_re")) return df
    val (reP, imP) =
      if (regenerate) BeamFixture.ensurePair(schema)
      else {
        val Seq((_, pair)) = Fits.beamFilenames(schema, Seq(9))
        pair
      }
    val keys = Seq("src_id", "chan") ++
      (if (df.columns.contains("ddid")) Seq("ddid") else Nil)
    val dim = dims().select((keys ++ Seq("l", "m", "freq")).map(col): _*)
    val spark = df.sparkSession
    val hdu = Fits.read(reP)
    val reC = Fits.beamCube(reP); val imC = Fits.beamCube(imP)
    val out = dim.collect().map { r =>
      val co = BeamCubeTerm.coordsLocal(
        r.getDouble(keys.size), r.getDouble(keys.size + 1),
        r.getDouble(keys.size + 2), hdu, reC, lmZoom)
      val (re, im) = BeamCubeTerm.blendLocal(co, reC, imC)
      Row.fromSeq((0 until keys.size).map(r.get) ++ Seq(re, im))
    }
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val pinnedSchema = StructType(
      keys.map(k => dim.schema(k)) :+
        StructField("bce_re", DoubleType) :+ StructField("bce_im", DoubleType))
    val pinned = spark.createDataFrame(
      java.util.Arrays.asList(out.toIndexedSeq: _*), pinnedSchema)
    df.join(broadcast(pinned), keys)
  }

  def jones(src: Column, time: Column, ant: Column, side: String): Jones2x2 = {
    val e = CxCol(col("bce_re"), col("bce_im"))
    Jones2x2(e, Cx.zero, Cx.zero, e)
  }
}

/** FULL-Jones beam term: the four E-matrix ELEMENT cubes of a MeqTrees
  * beamset (xx/xy/yx/yy, each a re/im file pair via the filename schema)
  * sampled independently with the same trilinear-gather + per-element
  * amplitude renormalization as [[BeamCubeTerm]], assembled into the
  * full 2×2 Jones the compiler sandwiches as E·B·Eᴴ — off-diagonal
  * leakage included, where the single-pair term was diagonal. Geometry
  * staging is shared; the only addition is three more gather/blend
  * passes over three more broadcast-constant voxel arrays (all
  * model-sized at any data scale). */
final case class FullBeamCubeTerm(schema: String, lmZoom: Double,
                                  regenerate: Boolean = true)
    extends RimeCompiler.DdeTerm {

  override def stage(df: DataFrame, side: String): DataFrame =
    stageFrom(df,
      df.select((dimKeys(df) ++ Seq("l", "m", "freq")).map(col): _*)
        .distinct())

  /** Round 14: the staged blends depend only on the (src, chan[, ddid])
    * dimension keys, so when the compiler offers the dimension product
    * the staging table comes straight from it — unique per key by the
    * join-back contract, no distinct, and crucially NO scan of the
    * data-sized expanded frame inside the plan build (the old distinct
    * ran a full MAIN pass per staging). Extra product rows whose keys
    * never appear in the data are dropped by the inner join-back. */
  override def stageWithDims(df: DataFrame, side: String,
                             dims: () => DataFrame): DataFrame =
    stageFrom(df,
      dims().select((dimKeys(df) ++ Seq("l", "m", "freq")).map(col): _*))

  // grouped MS (x17): the same chan NUMBER carries a different freq per
  // DATA_DESC_ID, so the dimension key must include ddid or the
  // join-back would cross-match SPWs (and duplicate rows)
  private def dimKeys(df: DataFrame): Seq[String] =
    Seq("src_id", "chan") ++
      (if (df.columns.contains("ddid")) Seq("ddid") else Nil)

  private def stageFrom(df: DataFrame, dim: DataFrame): DataFrame = {
    if (df.columns.contains("bce_xx_re")) return df // one beam, both sides
    val quad =
      if (regenerate) BeamFixture.ensureQuad(schema)
      else Fits.beamFilenames(schema, Seq(9, 10, 11, 12))
    // the beam E depends on (source, chan) ONLY — stage the four
    // renormalized blends on the DIMENSION frame (nsrc × nchan rows) and
    // broadcast-join them back, so the expensive gather/renorm
    // expressions evaluate 45 times instead of once per expanded
    // (row × src × chan) row AND the sandwich downstream references
    // plain join ATTRIBUTES — without this, CollapseProject inlines each
    // blend ~6× into the 2×2 E·B·Eᴴ and the generated method passes the
    // 8 KB JIT threshold (measured 16.1 s vs 1.9 s at sf0.1; the
    // AuditSpec catch that motivated this shape).
    //
    // Round 14: the blends are computed ON THE DRIVER
    // (BeamCubeTerm.blendLocal) instead of through a localCheckpointed
    // Catalyst pipeline — the old pin job alone cost ~2.6 s WARM per
    // plan build, dominated by optimizer/CSE walks over blend trees
    // embedding eight 405-double array literals (every subtree equality
    // compares whole arrays). Every mirrored operation is IEEE-exact
    // (+,−,×,/, sqrt, compares, floor/cast — class (a)), so the staged
    // doubles are bit-identical to the Column pipeline by IEEE
    // semantics; BeamBlendLocalSpec pins the equality over the live
    // fixture, and x14/x17 keep their strict hash gates.
    val keys = dimKeys(df)
    val spark = df.sparkSession
    val dimRows = dim.collect() // dimension product: model-sized
    val cubes = quad.map { case (corr, (reP, imP)) =>
      (corr, Fits.beamCube(reP), Fits.beamCube(imP))
    }
    val hdu = Fits.read(quad.head._2._1)
    val out = dimRows.map { r =>
      val co = BeamCubeTerm.coordsLocal(
        r.getDouble(keys.size), r.getDouble(keys.size + 1),
        r.getDouble(keys.size + 2), hdu, cubes.head._2, lmZoom)
      val blends = cubes.flatMap { case (_, reC, imC) =>
        val (re, im) = BeamCubeTerm.blendLocal(co, reC, imC)
        Seq(re, im)
      }
      Row.fromSeq((0 until keys.size).map(r.get) ++ blends)
    }
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val pinnedSchema = StructType(
      keys.map(k => dim.schema(k)) ++ quad.flatMap { case (c, _) =>
        Seq(StructField(s"bce_${c}_re", DoubleType),
          StructField(s"bce_${c}_im", DoubleType)) })
    val pinned = spark.createDataFrame(
      java.util.Arrays.asList(out.toIndexedSeq: _*), pinnedSchema)
    df.join(broadcast(pinned), keys)
  }

  def jones(src: Column, time: Column, ant: Column, side: String): Jones2x2 =
    Jones2x2(
      CxCol(col("bce_xx_re"), col("bce_xx_im")),
      CxCol(col("bce_xy_re"), col("bce_xy_im")),
      CxCol(col("bce_yx_re"), col("bce_yx_im")),
      CxCol(col("bce_yy_re"), col("bce_yy_im")))
}

object BeamCubeTerm {
  /** Corner enumeration shared with the oracle-SQL generator — the order
    * fixes the blend's expression tree on both engines. */
  val corners: Seq[(String, Int, Int, Int)] =
    for (a <- 0 to 1; b <- 0 to 1; c <- 0 to 1) yield (s"bc$a$b$c", a, b, c)

  /** Sampling coordinates of one (l, m, freq) point — the DRIVER mirror
    * of [[stageCoords]], operation for operation. Every op is IEEE-exact
    * (compares, +,−,×,/, floor, long cast), so the values are
    * bit-identical to the Column pipeline by IEEE semantics;
    * BeamBlendLocalSpec pins the equality over the live fixture. */
  private[graft] final case class LocalCoords(f0: Int, fw: Double,
      l0: Int, dl: Double, m0: Int, dm: Double)

  private[graft] def coordsLocal(l: Double, m: Double, freq: Double,
                                hdu: Fits.Hdu, cube: Fits.BeamCube,
                                lmZoom: Double): LocalCoords = {
    require(hdu.num("CRVAL1").getOrElse(0.0) == 0.0 &&
      hdu.num("CRVAL2").getOrElse(0.0) == 0.0,
      "beam term assumes a zero-centred CRVAL (fixture layout)")
    val crpix1 = hdu.num("CRPIX1").getOrElse(1.0) - 1.0
    val crpix2 = hdu.num("CRPIX2").getOrElse(1.0) - 1.0
    val cdelt1 = hdu.num("CDELT1").getOrElse(1.0)
    val cdelt2 = hdu.num("CDELT2").getOrElse(1.0)
    val nx = cube.npixX; val ny = cube.npixY
    val freqs = cube.freqs
    val fmin = freqs.head; val fmax = freqs.last
    val fscale = if (freq < fmin) freq / fmin
      else if (freq > fmax) freq / fmax else 1e0
    val fc = if (freq < fmin) fmin else if (freq > fmax) fmax else freq
    var f0 = 0L
    var k = 1
    while (k < freqs.length - 1) { if (fc >= freqs(k)) f0 += 1L; k += 1 }
    val fw = (fc - freqs(f0.toInt)) /
      (freqs(f0.toInt + 1) - freqs(f0.toInt))
    def pix(lm: Double, crpix: Double, cdeltDeg: Double, n: Int)
        : (Int, Double) = {
      val raw = crpix +
        (lm * lmZoom * fscale) / (cdeltDeg * (math.Pi / 180e0))
      val cc = math.max(0e0, math.min(raw, (n - 1).toDouble))
      val c0 = math.min(math.floor(cc).toLong, (n - 2).toLong)
      (c0.toInt, cc - c0.toDouble)
    }
    val (l0, dl) = pix(l, crpix1, cdelt1, nx)
    val (m0, dm) = pix(m, crpix2, cdelt2, ny)
    LocalCoords(f0.toInt, fw, l0, dl, m0, dm)
  }

  /** One renormalized trilinear blend — the DRIVER mirror of
    * [[gatherBlend]]'s expression tree (same corner order, same
    * left-associated sums and products, same r4-rounded voxels). */
  private[graft] def blendLocal(co: LocalCoords,
                               reC: Fits.BeamCube, imC: Fits.BeamCube)
      : (Double, Double) = {
    def w(a: Int, b: Int, c: Int): Double =
      (if (a == 0) 1e0 - co.dl else co.dl) *
        (if (b == 0) 1e0 - co.dm else co.dm) *
        (if (c == 0) 1e0 - co.fw else co.fw)
    def at(cube: Fits.BeamCube, a: Int, b: Int, c: Int): Double =
      Det.r4Local(cube.value(co.l0 + a, co.m0 + b, co.f0 + c))
    def blend(f: (Int, Int, Int) => Double): Double =
      corners.map { case (_, a, b, c) => w(a, b, c) * f(a, b, c) }
        .reduce(_ + _)
    val wre = blend((a, b, c) => at(reC, a, b, c))
    val wim = blend((a, b, c) => at(imC, a, b, c))
    val wabs = blend { (a, b, c) =>
      val re = at(reC, a, b, c); val im = at(imC, a, b, c)
      math.sqrt(re * re + im * im)
    }
    val den = math.sqrt(wre * wre + wim * wim)
    if (den == 0e0) (wre, wim)
    else (wre * (wabs / den), wim * (wabs / den))
  }

  /** Shared geometry staging: derive the per-(source, chan) sampling
    * coordinates (frequency bracket + weight, snap-clamped pixel cells +
    * fractions) from the cube header — freq_grid_interp
    * (fast_beam_cubes.py:10-54) plus the reference's edge handling. */
  private[graft] def stageCoords(df: DataFrame, reP: String,
                                lmZoom: Double): DataFrame = {
    val hdu = Fits.read(reP)
    val reCube = Fits.beamCube(reP)
    require(hdu.num("CRVAL1").getOrElse(0.0) == 0.0 &&
      hdu.num("CRVAL2").getOrElse(0.0) == 0.0,
      "beam term assumes a zero-centred CRVAL (fixture layout)")
    val crpix1 = hdu.num("CRPIX1").getOrElse(1.0) - 1.0
    val crpix2 = hdu.num("CRPIX2").getOrElse(1.0) - 1.0
    val cdelt1 = hdu.num("CDELT1").getOrElse(1.0)
    val cdelt2 = hdu.num("CDELT2").getOrElse(1.0)
    val nx = reCube.npixX; val ny = reCube.npixY
    val freqs = reCube.freqs

    val fmin = freqs.head; val fmax = freqs.last
    val fscale = when(col("freq") < fmin, col("freq") / fmin)
      .when(col("freq") > fmax, col("freq") / fmax).otherwise(lit(1e0))
    val fc = when(col("freq") < fmin, lit(fmin))
      .when(col("freq") > fmax, lit(fmax)).otherwise(col("freq"))
    val f0 = (1 until freqs.length - 1)
      .map(k => when(col("bcfc") >= freqs(k), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    def planeAt(i: Column, off: Int): Column =
      freqs.indices.init.foldLeft(lit(freqs(off)).cast("double")) {
        (acc, k) => when(i === k.toLong, lit(freqs(k + off))).otherwise(acc)
      }
    // spatial map: pix = (crpix-1) + zoom·l·fscale / (cdelt·π/180),
    // snap-clamped to the grid (the reference's edge handling).
    // NOTE (round 14, measured): keep the step-by-step withColumn form —
    // each derived column stays its OWN projection slot that per-row
    // codegen evaluates once. A collapsed single-select variant (corner
    // lookups inlined into the blends) ran x12's DATA-sized inline
    // staging 3× SLOWER: CollapseProject does NOT re-inline multi-use
    // non-cheap columns, so the separate slots are load-bearing.
    def pixCols(lm: Column, crpix: Double, cdeltDeg: Double, n: Int,
                p: String): DataFrame => DataFrame = { d =>
      val raw = lit(crpix) +
        (lm * lit(lmZoom) * col("bcfscale")) /
          (lit(cdeltDeg) * (lit(math.Pi) / lit(180e0)))
      d.withColumn(s"bc${p}cc",
          greatest(lit(0e0), least(raw, lit((n - 1).toDouble))))
        .withColumn(s"bc${p}0",
          least(floor(col(s"bc${p}cc")).cast("long"), lit((n - 2).toLong)))
        .withColumn(s"bcd$p",
          col(s"bc${p}cc") - col(s"bc${p}0").cast("double"))
    }
    var out = df
      .withColumn("bcfscale", fscale)
      .withColumn("bcfc", fc)
      .withColumn("bcf0", f0)
    out = out.withColumn("bcfw",
      (col("bcfc") - planeAt(col("bcf0"), 0)) /
        (planeAt(col("bcf0"), 1) - planeAt(col("bcf0"), 0)))
    out = pixCols(col("l"), crpix1, cdelt1, nx, "l")(out)
    out = pixCols(col("m"), crpix2, cdelt2, ny, "m")(out)
    out
  }

  /** Shared 8-corner gather + trilinear blend + amplitude
    * renormalization for ONE complex cube pair, appending
    * `<prefix>_re`/`<prefix>_im`. The voxel table is a dense
    * (nx, ny, nFreq) grid, so each corner is a direct flat-index
    * lookup — ship the cube as two literal arrays (executor-constant,
    * like the reference's in-memory beam) and gather with codegen'd
    * element_at instead of 8 broadcast hash joins. The values are
    * COLLECTED from the same Spark-side r4-rounding pipeline the join
    * version read, so every double on the hashed surface is
    * bit-identical to the join plan; the collect is cube-sized (405
    * voxels per file) — dimension-table bounded at any data scale. */
  private[graft] def gatherBlend(df: DataFrame, reP: String, imP: String,
                                prefix: String): DataFrame = {
    val reCube = Fits.beamCube(reP)
    val imCube = Fits.beamCube(imP)
    require(reCube.nFreq == imCube.nFreq && reCube.npixX == imCube.npixX &&
      reCube.npixY == imCube.npixY, "re/im cube geometry mismatch")
    val nx = reCube.npixX; val ny = reCube.npixY
    // r4 shared rationals — the r16-proven bucket for file-vs-closed-form.
    // The voxels are ALREADY driver-resident JVM arrays (Fits.beamCube),
    // so the rounding runs on the driver (Det.r4Local — the bit-identical
    // mirror of the Column form, DeterminismSpec-pinned) instead of
    // shipping 405 values through a toDF + collect Spark JOB per cube
    // pair; plan builds that stage 1-4 cubes (x12/x14/x17/p01) lose 1-4
    // serial jobs each (round 14, guide §5 — the driver should do
    // model-sized work itself, not schedule it).
    val reArr = Array.ofDim[Double](nx * ny * reCube.nFreq)
    val imArr = Array.ofDim[Double](nx * ny * reCube.nFreq)
    for (f <- 0 until reCube.nFreq; y <- 0 until ny; x <- 0 until nx) {
      val i = (f * ny + y) * nx + x
      reArr(i) = Det.r4Local(reCube.value(x, y, f))
      imArr(i) = Det.r4Local(imCube.value(x, y, f))
    }
    val (reLit, imLit) = (typedLit(reArr.toSeq), typedLit(imArr.toSeq))
    // step-by-step projection slots, NOT a collapsed single select — see
    // the pixCols note (measured 3× on x12's data-sized inline staging)
    var out = df
    for ((nm, a, b, c) <- corners) {
      val idx = (((col("bcf0") + c) * ny + (col("bcm0") + b)) * nx +
        (col("bcl0") + a)).cast("int") + 1
      out = out.withColumn(s"${prefix}_${nm}_re", element_at(reLit, idx))
        .withColumn(s"${prefix}_${nm}_im", element_at(imLit, idx))
    }
    def w(a: Int, b: Int, c: Int): Column =
      (if (a == 0) lit(1e0) - col("bcdl") else col("bcdl")) *
        (if (b == 0) lit(1e0) - col("bcdm") else col("bcdm")) *
        (if (c == 0) lit(1e0) - col("bcfw") else col("bcfw"))
    def blend(f: String => Column): Column =
      corners.map { case (nm, a, b, c) => w(a, b, c) * f(nm) }
        .reduce(_ + _)
    val wre = blend(nm => col(s"${prefix}_${nm}_re"))
    val wim = blend(nm => col(s"${prefix}_${nm}_im"))
    val wabs = blend(nm => sqrt(
      col(s"${prefix}_${nm}_re") * col(s"${prefix}_${nm}_re") +
        col(s"${prefix}_${nm}_im") * col(s"${prefix}_${nm}_im")))
    val den = sqrt(wre * wre + wim * wim)
    out
      .withColumn(s"${prefix}_re",
        when(den === 0e0, wre).otherwise(wre * (wabs / den)))
      .withColumn(s"${prefix}_im",
        when(den === 0e0, wim).otherwise(wim * (wabs / den)))
      .drop(corners.flatMap { case (nm, _, _, _) =>
        Seq(s"${prefix}_${nm}_re", s"${prefix}_${nm}_im") }: _*)
  }
}
