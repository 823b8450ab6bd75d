package graft.io

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MeqTrees-compliant beam-cube factory — the Spark-native port of the
  * reference's `beam_factory` (africanus/testing/beam_factory.py:37-165):
  * for every correlation of the polarisation type and each of re/im, one
  * FITS primary-HDU cube written THROUGH the `format("fits")` DataSource
  * sink (the `cards` write option carries the WCS/GFREQ metadata), named
  * by the `$(corr)`/`$(reim)` filename schema of util/beams.py.
  *
  * Factory fidelity notes:
  *   - npix must be ODD (the reference's ValueError);
  *   - X/Y axes are DEG-unit, centred on CRPIX = 1 + npix/2 over a
  *     3-degree extent;
  *   - the FREQ axis is regular in the header (CRVAL3/CDELT3) but
  *     OVERRIDDEN by an irregular GFREQ1..N grid — jittered like the
  *     reference's np.random draw but DETERMINISTIC here (endpoints
  *     pinned, monotonicity asserted) so tests and oracles can restate
  *     every value in closed form;
  *   - every file carries the same Westerbork model
  *     cos³(min(65 · ν_GHz · r, 1.0881)) — exactly as beam_factory
  *     writes the one `beam` array to all correlations and both re/im;
  *   - OBSERVER/ORIGIN/TELESCOP/OBJECT/EQUINOX metadata ride along.
  */
object BeamFactory {

  /** casacore Stokes enumerations, as in the reference. */
  val LinearCorrelations: Seq[Int] = Seq(9, 10, 11, 12)
  val CircularCorrelations: Seq[Int] = Seq(5, 6, 7, 8)

  final case class Geometry(npix: Int, nfreq: Int,
                            f0: Double = 0.856e9, f1: Double = 1.712e9) {
    require(npix % 2 == 1, s"npix '$npix' must be odd")
    val extentDeg = 3.0
    val crpix: Int = 1 + npix / 2
    val cdeltDeg: Double = extentDeg / (npix - 1)
    val bandDelta: Double = (f1 - f0) / (nfreq - 1)

    /** Deterministic stand-in for the reference's ±0.05·Δ random jitter:
      * endpoints pinned at zero, interior points on a fixed pattern. */
    def jitter(k: Int): Double =
      if (k == 0 || k == nfreq - 1) 0.0
      else (((k * 3) % 7) - 3) / 70.0 * bandDelta

    def gfreq(k: Int): Double = f0 + k * bandDelta + jitter(k)

    def lDeg(x: Int): Double = (x - (crpix - 1)) * cdeltDeg

    /** The Westerbork beam model (beam_factory.py:152-156). */
    def beamValue(x: Int, y: Int, f: Int): Double = {
      val l = math.toRadians(lDeg(x)); val m = math.toRadians(lDeg(y))
      val r = math.sqrt(l * l + m * m)
      val c = math.cos(math.min(65e0 * gfreq(f) * 1e-9 * r, 1.0881))
      c * c * c
    }

    def headerCards: Seq[(String, String)] = Seq(
      "CTYPE1" -> "'X'", "CUNIT1" -> "'DEG'",
      "CRPIX1" -> crpix.toString, "CRVAL1" -> "0.0",
      "CDELT1" -> cdeltDeg.toString,
      "CTYPE2" -> "'Y'", "CUNIT2" -> "'DEG'",
      "CRPIX2" -> crpix.toString, "CRVAL2" -> "0.0",
      "CDELT2" -> cdeltDeg.toString,
      "CTYPE3" -> "'FREQ'", "CRPIX3" -> "1",
      "CRVAL3" -> f0.toString, "CDELT3" -> bandDelta.toString,
      "OBSERVER" -> "'Astronomer McAstronomerFace'",
      "ORIGIN" -> "'Artificial'",
      "TELESCOP" -> "'Telescope'",
      "OBJECT" -> "'beam'",
      "EQUINOX" -> "2000.0") ++
      (1 to nfreq).map(k => s"GFREQ$k" -> gfreq(k - 1).toString)
  }

  /** Generate the cube files for `schema` (a path containing `$(corr)`
    * and `$(reim)`). Returns (corrName → (rePath, imPath)). The pixel
    * grid goes through the DataFrame write path: a (plane, y, x, value)
    * frame per file, one partition → one primary HDU, metadata via the
    * `cards` option, then the single part file moves to the schema name. */
  def write(spark: SparkSession, schema: String,
            polarisationType: String = "linear",
            npix: Int = 257, nfreq: Int = 33): Seq[(String, (String, String))] = {
    val corrs = polarisationType match {
      case "linear" => LinearCorrelations
      case "circular" => CircularCorrelations
      case p => throw new IllegalArgumentException(
        s"Invalid polarisation_type $p")
    }
    val g = Geometry(npix, nfreq)
    // monotonicity, as the reference asserts after jittering
    require((1 until nfreq).forall(k => g.gfreq(k) >= g.gfreq(k - 1)),
      "GFREQ grid must be monotonically increasing")
    import spark.implicits._
    val cube = (for {
      f <- 0 until nfreq; y <- 0 until npix; x <- 0 until npix
    } yield (f.toLong, y.toLong, x.toLong, g.beamValue(x, y, f)))
      .toDF("plane", "y", "x", "value")
      .coalesce(1)
    val cards = g.headerCards.map { case (k, v) => s"$k=$v" }.mkString("\n")
    val names = Fits.beamFilenames(schema, corrs)
    // the reference writes ONE beam array to all correlations and both
    // re/im — so run the Spark write job once and copy the part file to
    // each schema target, then clean the staging directory up
    val stage = java.nio.file.Files
      .createTempDirectory("graft_beam_factory").toFile
    try {
      cube.write.mode("overwrite").option("cards", cards)
        .format("fits").save(stage.toString)
      val parts = stage.listFiles().filter(_.getName.endsWith(".fits"))
      require(parts.length == 1,
        s"factory cube must land in ONE part file, got ${parts.length}")
      for ((_, (reP, imP)) <- names; target <- Seq(reP, imP))
        java.nio.file.Files.copy(parts.head.toPath, new File(target).toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally {
      // recursive, deepest-first: a failed write can leave a non-empty
      // _temporary subtree that a one-level listFiles().delete() would
      // silently skip, leaking the staging dir on exactly the error path
      // this finally exists for
      val walk = java.nio.file.Files.walk(stage.toPath)
      try {
        walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      } finally walk.close()
    }
    names
  }
}
