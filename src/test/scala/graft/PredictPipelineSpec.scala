package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipelines.PredictPipeline

/** End-to-end: sky-model file → predict → MODEL_DATA parquet → read back.
  * A single zenith point source has unit |V| at every uv point; a known
  * two-source model is cross-checked against a direct computation. */
class PredictPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeModel(text: String): String = {
    val f = java.nio.file.Files.createTempFile("skymodel", ".txt")
    java.nio.file.Files.writeString(f, text)
    f.toString
  }

  test("point source at the phase centre predicts |V| = flux everywhere") {
    import spark.implicits._
    // phase centre ra0 = 3h = 45deg, dec0 = 0
    val model = writeModel(
      """Format = Name, Type, Ra, Dec, I, SpectralIndex, LogarithmicSI, ReferenceFrequency='1.4e9', MajorAxis, MinorAxis, Orientation
        |centre,POINT,03:00:00,00.00.00,2.0,[],false,,,,
        |""".stripMargin)
    val uvw = Seq((0L, 100.0, -50.0, 2.0), (1L, -30.0, 75.0, -1.0))
      .toDF("row_id", "u", "v", "w")
    val chans = Seq((0L, 1.4e9), (1L, 1.5e9)).toDF("chan", "freq")
    val out = java.nio.file.Files.createTempDirectory("model_data").toString
    PredictPipeline.run(spark, model, uvw, chans, math.Pi / 4, 0.0, out)
    val back = spark.read.parquet(out)
    assert(back.count() === 4)
    // l = m = 0 -> phase = 0 -> V = flux exactly (fsum-rounded)
    back.collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("vre") - 2.0) < 1e-5)
      assert(math.abs(r.getAs[Double]("vim")) < 1e-5)
    }
  }

  test("two-source model matches a direct computation") {
    import spark.implicits._
    val model = writeModel(
      """Format = Name, Type, Ra, Dec, I, SpectralIndex, LogarithmicSI, ReferenceFrequency='1.4e9', MajorAxis, MinorAxis, Orientation
        |a,POINT,03:00:00,00.00.00,1.0,[],false,,,,
        |b,POINT,03:02:00,00.30.00,0.5,[0.2],false,,,,
        |""".stripMargin)
    val uvw = Seq((0L, 1000.0, 500.0, 10.0)).toDF("row_id", "u", "v", "w")
    val chans = Seq((0L, 1.4e9)).toDF("chan", "freq")
    val got = PredictPipeline
      .modelData(spark, model, uvw, chans, math.Pi / 4, 0.0)
      .collect()(0)
    // direct: source a at centre contributes (1, 0); source b at its lm
    val ra = 3.0 * math.Pi / 12 + 2.0 / 60 * math.Pi / 12
    val dec = 0.5 * math.Pi / 180
    val l = math.cos(dec) * math.sin(ra - math.Pi / 4)
    val m = math.sin(dec)
    val n = math.sqrt(1 - l * l - m * m)
    val spec = 0.5 + 0.2 * (1.4e9 / 1.4e9 - 1.0) // = 0.5
    val ph = -2 * math.Pi / 299792458.0 *
      (1000.0 * l + 500.0 * m + 10.0 * (n - 1)) * 1.4e9
    val expRe = 1.0 + spec * math.cos(ph)
    val expIm = 0.0 + spec * math.sin(ph)
    assert(math.abs(got.getAs[Double]("vre") - expRe) < 1e-5)
    assert(math.abs(got.getAs[Double]("vim") - expIm) < 1e-5)
  }

  test("predict from a FITS model image matches a direct computation") {
    // dft/examples/predict_from_fits.py: write an 8x8 image with two
    // non-zero pixels through the pure-JVM FITS writer, predict, and
    // cross-check against the same DFT computed directly
    import spark.implicits._
    val nx = 8; val ny = 8
    val data = new Array[Double](nx * ny)
    val pix = Seq((2, 3, 1.5), (6, 5, -0.5)) // (x, y, flux)
    for ((x, y, f) <- pix) data(y * nx + x) = f
    val cards = Seq(
      "SIMPLE" -> "T", "BITPIX" -> "-64", "NAXIS" -> "2",
      "NAXIS1" -> nx.toString, "NAXIS2" -> ny.toString,
      "CRPIX1" -> "5.0", "CRVAL1" -> "0.0", "CDELT1" -> "-2.777778e-3",
      "CRPIX2" -> "5.0", "CRVAL2" -> "0.0", "CDELT2" -> "2.777778e-3")
    val f = java.nio.file.Files.createTempFile("model_img", ".fits")
    graft.io.Fits.write(f.toString, cards, data)
    val uvw = Seq((0L, 1000.0, 500.0, 10.0), (1L, -250.0, 125.0, 2.0))
      .toDF("row_id", "u", "v", "w")
    val chans = Seq((0L, 1.4e9)).toDF("chan", "freq")
    val got = PredictPipeline.predictFromFits(spark, f.toString, uvw, chans)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("vre"), r.getAs[Double]("vim"))).toMap
    val degRad = math.Pi / 180.0
    for ((rowId, u, v, w) <- Seq((0L, 1000.0, 500.0, 10.0),
        (1L, -250.0, 125.0, 2.0))) {
      var re = 0.0; var im = 0.0
      for ((x, y, flux) <- pix) {
        val l = ((x + 1 - 5.0) * -2.777778e-3) * degRad
        val m = ((y + 1 - 5.0) * 2.777778e-3) * degRad
        val n = math.sqrt(1 - l * l - m * m)
        val ph = -2 * math.Pi / 299792458.0 *
          (u * l + v * m + w * (n - 1)) * 1.4e9
        re += flux * math.cos(ph); im += flux * math.sin(ph)
      }
      assert(math.abs(got(rowId)._1 - re) < 1e-5, s"row $rowId re")
      assert(math.abs(got(rowId)._2 - im) < 1e-5, s"row $rowId im")
    }
  }

  test("fused projection modelDataFused ≡ groupBy modelData bit-for-bit") {
    import spark.implicits._
    // spectral + log-poly + plain sources, many rows/chans: the fused
    // rime_source_sum contraction must reproduce the groupBy fsum path
    // EXACTLY (same rounding, integer sum association-free)
    val model = writeModel(
      """Format = Name, Type, Ra, Dec, I, SpectralIndex, LogarithmicSI, ReferenceFrequency='1.4e9', MajorAxis, MinorAxis, Orientation
        |a,POINT,03:00:00,00.00.00,1.0,[],false,,,,
        |b,POINT,03:02:00,00.30.00,0.5,[0.2],false,,,,
        |c,POINT,02:58:40,-00.20.00,0.75,[0.1,-0.05],true,,,,
        |""".stripMargin)
    val uvw = (0L until 300L).map(r => (r,
      ((r * 7) % 2001 - 1000) / 2.0, ((r * 3) % 2001 - 1000) / 2.0,
      ((r * 11) % 201 - 100) / 20.0)).toDF("row_id", "u", "v", "w")
    val chans = Seq((0L, 1.4e9), (1L, 1.5e9), (2L, 1.6e9))
      .toDF("chan", "freq")
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Double]("vre"), r.getAs[Double]("vim"))).toMap
    val grouped = asMap(PredictPipeline
      .modelData(spark, model, uvw, chans, math.Pi / 4, 0.0))
    val fused = asMap(PredictPipeline
      .modelDataFused(spark, model, uvw, chans, math.Pi / 4, 0.0))
    assert(fused.size === 900)
    assert(fused === grouped) // exact ==, not tolerance
  }

  test("MS-format dataset → MODEL_DATA end to end (the dask-ms entry path)") {
    // the reference's flagship entry reads a CASA MS
    // (rime/examples/predict.py:548-586); here the same pipeline runs
    // from the on-disk MS dataset layout ms2parquet.py produces: open
    // MAIN/SPECTRAL_WINDOW/FIELD, take uvw + chans + phase centre from
    // the TABLES (not from caller-built DataFrames), predict, and match
    // the direct modelData computation bit for bit
    import graft.io.MsDataset
    val msDir = java.nio.file.Files.createTempDirectory("synth_ms").toString
    MsDataset.writeSynthetic(spark, msDir, nrow = 256, nchan = 4, nant = 7,
      ra0 = math.Pi / 4, dec0 = 0.0)
    val model = writeModel(
      """Format = Name, Type, Ra, Dec, I, SpectralIndex, LogarithmicSI, ReferenceFrequency='1.4e9', MajorAxis, MinorAxis, Orientation
        |a,POINT,03:00:00,00.00.00,1.0,[],false,,,,
        |b,POINT,03:02:00,00.30.00,0.5,[0.2],false,,,,
        |""".stripMargin)
    val got = MsDataset.predictModelData(spark, msDir, model)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Double]("vre"), r.getAs[Double]("vim"))).toMap
    assert(got.size === 256 * 4)
    // the same prediction from caller-built uvw/chans must agree exactly
    // (identical fsum fixed-point path — file mediation adds nothing)
    val ms = MsDataset.read(spark, msDir)
    val expect = PredictPipeline.modelData(spark, model,
        MsDataset.uvw(ms), MsDataset.chans(ms), math.Pi / 4, 0.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Double]("vre"), r.getAs[Double]("vim"))).toMap
    assert(got === expect)
    // subtables carry the MSv2 shapes the reference example consumes
    assert(ms.antenna.count() === 7)
    assert(MsDataset.chans(ms).collect().map(_.getDouble(1)).toSeq ===
      (0 until 4).map(k => 856e6 + k * 107e6))
    assert(MsDataset.phaseCentre(spark, ms) === ((math.Pi / 4, 0.0)))
    // the closing write-back (predict.py:580-586): MODEL_DATA joins the
    // dataset as a member table and reads back exactly
    MsDataset.writeModelData(
      MsDataset.predictModelData(spark, msDir, model), msDir)
    val back = MsDataset.readModelData(spark, msDir)
      .collect()
      .map(r => (r.getAs[Long]("row_id"), r.getAs[Long]("chan")) ->
        (r.getAs[Double]("vre"), r.getAs[Double]("vim"))).toMap
    assert(back === got)
  }

  test("predict.py --beam end to end: MS + sky model + FITS beam cube → full-Jones MODEL_DATA") {
    // the dde_factory wiring (rime/examples/predict.py:404-471): feed
    // basis from CORR_TYPE, real parallactic angles from distinct TIME x
    // ANTENNA.POSITION x PHASE_DIR, beam E from the MeqTrees quad cube,
    // DDE = E·L. Pin: for a 1 Jy source AT the phase centre on the
    // chan-0 beam plane, lm = (0,0) so K = 1 and E = identity (the
    // Westerbork argument is 0 at the cube centre), leaving V =
    // L_p·B·L_qᴴ — a pure rotation by (pa_p − pa_q) of diag(1, 1),
    // restated here through an INDEPENDENT scala transcription of the
    // casa PA chain (IAU-1982 GMST + Bowring geodetic inversion).
    import graft.io.{BeamFixture, MsDataset}
    val msDir = java.nio.file.Files.createTempDirectory("synth_ms_fj").toString
    MsDataset.writeSynthetic(spark, msDir, nrow = 128, nchan = 2, nant = 5,
      ra0 = math.Pi / 4, dec0 = 0.0)
    val model = writeModel(
      """Format = Name, Type, Ra, Dec, I, SpectralIndex, LogarithmicSI, ReferenceFrequency='1.4e9', MajorAxis, MinorAxis, Orientation
        |a,POINT,03:00:00,00.00.00,1.0,[],false,,,,
        |""".stripMargin)
    val schema = java.nio.file.Files.createTempDirectory("fj_beam").toString +
      "/beam_$(corr)_$(reim).fits"
    BeamFixture.ensureQuad(schema)
    val got = graft.pipelines.PredictPipeline.modelDataFullJones(
        spark, msDir, model, schema)
      .collect()
      .map(r => (r.getAs[Long]("row_id"), r.getAs[Long]("chan")) -> r)
      .toMap
    assert(got.size === 128 * 2)
    val corrs = Seq("xx", "xy", "yx", "yy")
    got.values.foreach { r =>
      corrs.foreach { c =>
        assert(!r.getAs[Double](s"${c}_re").isNaN &&
          !r.getAs[Double](s"${c}_im").isNaN)
      }
    }

    // independent PA transcription (same public formulas, separate code)
    def paOf(mjdSec: Double, x: Double, y: Double, z: Double,
             ra: Double, dec: Double): Double = {
      val a = 6378137.0; val f = 1.0 / 298.257223563
      val b = a * (1 - f); val e2 = f * (2 - f); val ep2 = e2 / (1 - e2)
      val lon = math.atan2(y, x)
      val p = math.sqrt(x * x + y * y)
      val th = math.atan2(z * a, p * b)
      val lat = math.atan2(z + ep2 * b * math.pow(math.sin(th), 3),
        p - e2 * a * math.pow(math.cos(th), 3))
      val d = mjdSec / 86400.0 - 51544.5
      val t = d / 36525.0
      val deg0 = 280.46061837 + 360.98564736629 * d +
        0.000387933 * t * t - t * t * t / 38710000.0
      val gmst = (deg0 - 360.0 * math.floor(deg0 / 360.0)) * (math.Pi / 180)
      val ha = gmst + lon - ra
      math.atan2(math.cos(lat) * math.sin(ha),
        math.sin(lat) * math.cos(dec) - math.cos(lat) * math.sin(dec) * math.cos(ha))
    }
    def pos(ant: Int): (Double, Double, Double) =
      (-1601710.0 + ant * 64, -5042006.0 + ant * 128, 3554880.0 + ant * 32)
    // r6 rounding mirrors the pipeline's hashed-surface discipline
    def r6(v: Double): Double = math.round(v * 1e6) / 1e6
    var worst = 0.0
    for (r <- 0 until 128; chan <- 0 until 2) {
      val a1 = r % 5; val a2 = (r / 5) % 5
      val mjd = 5084553600.0 + (r / 25) * 8.0
      val (x1, y1, z1) = pos(a1); val (x2, y2, z2) = pos(a2)
      val pap = r6(paOf(mjd, x1, y1, z1, math.Pi / 4, 0.0))
      val paq = r6(paOf(mjd, x2, y2, z2, math.Pi / 4, 0.0))
      // V = L(pap)·I·L(paq)ᵀ = rotation by (pap − paq), all-real
      val c = math.cos(pap - paq); val s = math.sin(pap - paq)
      val exp = Map("xx" -> c, "xy" -> s, "yx" -> -s, "yy" -> c)
      val row = got((r.toLong, chan.toLong))
      for (cc <- corrs) {
        worst = math.max(worst,
          math.abs(row.getAs[Double](s"${cc}_re") - exp(cc)))
        worst = math.max(worst, math.abs(row.getAs[Double](s"${cc}_im")))
      }
    }
    assert(worst < 1e-9, s"centre-source full-Jones predict off by $worst")
  }

  test("ms2parquet.py --synthetic produces the layout MsDataset reads (schema pin)") {
    // the python converter and the JVM writer must emit the SAME dataset:
    // run the tool (pyarrow is in the sandbox; casacore mode is for real
    // MSes on user machines) and compare content table by table
    import scala.sys.process._
    import graft.io.MsDataset
    val py = java.nio.file.Paths.get("tools/ms2parquet.py").toAbsolutePath
    assume(java.nio.file.Files.exists(py), "converter tool present")
    val okPython = (try Process(Seq("python3", "-c", "import pyarrow")).! == 0
      catch { case _: Throwable => false })
    assume(okPython, "python3 + pyarrow available")
    val pyDir = java.nio.file.Files.createTempDirectory("py_ms").toString
    val rc = Process(Seq("python3", py.toString, "--synthetic", "256", pyDir)).!
    assert(rc === 0, "converter exited nonzero")
    val jvmDir = java.nio.file.Files.createTempDirectory("jvm_ms").toString
    MsDataset.writeSynthetic(spark, jvmDir, nrow = 256, nchan = 8, nant = 7,
      ra0 = math.Pi / 4, dec0 = 0.0)
    val a = MsDataset.read(spark, pyDir)
    val b = MsDataset.read(spark, jvmDir)
    // dtype-exact pin: the integer width per MSv2 column is part of the
    // contract (int32 antenna/field/ddid ids, int64 row_id) — no casts
    // here, so a future width divergence between the twins fails loudly
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
    assert(shape(a.main) === shape(b.main),
      s"MAIN schema diverges: ${shape(a.main)} vs ${shape(b.main)}")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("row_id"), col("TIME"), col("ANTENNA1"),
          col("ANTENNA2"),
          element_at(col("UVW"), 1), element_at(col("UVW"), 2),
          element_at(col("UVW"), 3))
        .collect().map(_.toSeq).toSeq
    assert(key(a.main) === key(b.main), "MAIN content diverges")
    assert(MsDataset.chans(a).collect().toSeq.map(_.getDouble(1)) ===
      MsDataset.chans(b).collect().toSeq.map(_.getDouble(1)))
    assert(MsDataset.phaseCentre(spark, a) === MsDataset.phaseCentre(spark, b))
  }

  test("modelDataFullJones must not leak its 'E' override into later " +
      "default-'E' plans (round-11 x08 poisoning regression)") {
    import graft.io.{BeamFixture, MsDataset}
    // x08 relies on the compiler's PRE-registered dyadic test beam
    val x08 = graft.SparkEntry.queries("x08_fused_rime_dde")
    def snap() = x08(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(4)) -> r.toSeq).toMap
    val before = snap()
    val msDir = java.nio.file.Files.createTempDirectory("synth_ms_lk").toString
    MsDataset.writeSynthetic(spark, msDir, nrow = 32, nchan = 2, nant = 5,
      ra0 = math.Pi / 4, dec0 = 0.0)
    val model = writeModel(
      """Format = Name, Type, Ra, Dec, I, SpectralIndex, LogarithmicSI, ReferenceFrequency='1.4e9', MajorAxis, MinorAxis, Orientation
        |a,POINT,03:00:00,00.00.00,1.0,[],false,,,,
        |""".stripMargin)
    val schema = java.nio.file.Files.createTempDirectory("lk_beam").toString +
      "/beam_$(corr)_$(reim).fits"
    BeamFixture.ensureQuad(schema)
    graft.pipelines.PredictPipeline
      .modelDataFullJones(spark, msDir, model, schema).collect()
    // bit-identical: the pipeline's FITS beam must not have replaced x08's
    // default term in the session registry
    assert(snap() === before,
      "the pipeline's scoped 'E' override leaked into the default registry")
  }
}
