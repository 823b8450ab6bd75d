package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.TiggerReader
import graft.pipelines.PredictPipeline

/** Tigger ASCII sky-model parsing + the predict pipeline fed from it. */
class TiggerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val fixture =
    """# a comment line
      |#format: name ra_d dec_d i q u v spi freq0 emaj_s emin_s pa_d
      |pt0  14.25 -21.75 1.5 0.125 0 0 -0.7  1.4e9 0  0  0
      |# another comment
      |gs0  14.30 -21.80 2.0 0     0 0 -0.65 1.4e9 30 20 45
      |short 14.40 -21.90 0.5
      |""".stripMargin

  test("parses units, defaults, and morphology inference") {
    val srcs = TiggerReader.parse(fixture.linesIterator, defaultFreq0 = 1.4e9)
    assert(srcs.map(_.name) === Seq("pt0", "gs0", "short"))
    assert(srcs.map(_.typecode) === Seq("pnt", "gau", "pnt"))
    val pt = srcs.head
    assert(math.abs(pt.ra - 14.25 * math.Pi / 180.0) < 1e-15)
    assert(math.abs(pt.dec + 21.75 * math.Pi / 180.0) < 1e-15)
    assert(pt.i === 1.5 && pt.q === 0.125 && pt.spi === -0.7)
    val g = srcs(1)
    assert(math.abs(g.emaj - 30.0 * math.Pi / (180.0 * 3600.0)) < 1e-18)
    assert(math.abs(g.pa - 45.0 * math.Pi / 180.0) < 1e-15)
    // truncated row: flux parsed, spectral/shape fields default
    val s = srcs(2)
    assert(s.i === 0.5 && s.spi === 0.0 && s.freq0 === 1.4e9 && s.emaj === 0.0)
  }

  test("hour-unit RA and explicit type column") {
    val srcs = TiggerReader.parse(
      """#format: name ra_h dec_d i type
        |a 1.0 0.0 1.0 pnt
        |""".stripMargin.linesIterator)
    assert(math.abs(srcs.head.ra - math.Pi / 12.0) < 1e-15)
    assertThrows[IllegalArgumentException](TiggerReader.parse(
      """#format: name ra_d dec_d i type
        |a 1.0 0.0 1.0 comet
        |""".stripMargin.linesIterator))
    assertThrows[IllegalArgumentException](
      TiggerReader.parse(Iterator("no header", "1 2 3")))
  }

  test("explicit 'gau' with zero extents degrades to the point response, not NaN") {
    import spark.implicits._
    val f = java.io.File.createTempFile("tigger0", ".lsm.txt")
    java.nio.file.Files.writeString(f.toPath,
      """#format: name ra_d dec_d i spi freq0 emaj_s emin_s pa_d type
        |degenerate 14.3 -21.8 1.0 0.0 1.4e9 0 0 0 gau
        |""".stripMargin)
    val uvw = Seq((0L, 10.0, -5.0, 0.5)).toDF("row_id", "u", "v", "w")
    val chans = Seq((0L, 1.4e9)).toDF("chan", "freq")
    val got = PredictPipeline.modelDataFromTigger(spark, f.getAbsolutePath,
        uvw, chans, 14.3 * math.Pi / 180.0, -21.8 * math.Pi / 180.0)
      .collect()
    assert(got.length === 1)
    assert(!got(0).getDouble(2).isNaN && !got(0).getDouble(3).isNaN,
      "degenerate gaussian extents leaked NaN into the visibility sum")
    // at the phase centre with unit flux the visibility is exactly (1, 0)
    assert(math.abs(got(0).getDouble(2) - 1.0) < 1e-5)
    f.delete()
  }

  test("predict pipeline runs from an LSM fixture: point + tapered gaussian") {
    import spark.implicits._
    val f = java.io.File.createTempFile("tigger", ".lsm.txt")
    java.nio.file.Files.writeString(f.toPath, fixture)
    val uvw = Seq((0L, 10.0, -5.0, 0.5), (1L, 120.0, 40.0, -1.0))
      .toDF("row_id", "u", "v", "w")
    val chans = Seq((0L, 1.4e9), (1L, 1.5e9)).toDF("chan", "freq")
    val ra0 = 14.3 * math.Pi / 180.0; val dec0 = -21.8 * math.Pi / 180.0
    val got = PredictPipeline.modelDataFromTigger(spark, f.getAbsolutePath,
        uvw, chans, ra0, dec0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(got.size === 4)
    // independent recomputation in plain Scala
    val srcs = TiggerReader.parse(fixture.linesIterator)
    for (((rid, ch), (gre, gim)) <- got) {
      val (u, v, w) = Seq((0L, 10.0, -5.0, 0.5), (1L, 120.0, 40.0, -1.0))
        .collectFirst { case (id, a, b, c) if id == rid => (a, b, c) }.get
      val freq = if (ch == 0) 1.4e9 else 1.5e9
      var re = 0.0; var im = 0.0
      for (s <- srcs) {
        val l = math.cos(s.dec) * math.sin(s.ra - ra0)
        val m = math.sin(s.dec) * math.cos(dec0) -
          math.cos(s.dec) * math.sin(dec0) * math.cos(s.ra - ra0)
        val n = math.sqrt(math.max(0.0, 1 - l * l - m * m)) - 1.0
        val phase = -2.0 * math.Pi / 299792458.0 * (u * l + v * m + w * n) * freq
        val spec = s.i * math.pow(freq / s.freq0, s.spi)
        val taper = if (s.typecode == "gau") {
          // gaussian_shape.py:46-56: u1 = (u·cos − v·sin)·er, v1 = u·sin + v·cos
          val u1 = (u * math.cos(s.pa) - v * math.sin(s.pa)) * (s.emin / s.emaj)
          val v1 = u * math.sin(s.pa) + v * math.cos(s.pa)
          val fsq = (freq / 299792458.0) * (freq / 299792458.0)
          math.exp(-(math.Pi * math.Pi) / (4 * math.log(2.0)) * fsq *
            (u1 * u1 + v1 * v1) * (s.emaj * s.emaj))
        } else 1.0
        re += spec * taper * math.cos(phase)
        im += spec * taper * math.sin(phase)
      }
      assert(math.abs(gre - re) < 1e-5, s"($rid,$ch) re: $gre vs $re")
      assert(math.abs(gim - im) < 1e-5, s"($rid,$ch) im: $gim vs $im")
    }
    f.delete()
  }
}
