package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{BeamFixture, Fits}
import graft.rime.BeamCubeTerm

/** Round 14: FullBeamCubeTerm computes its staging blends on the DRIVER
  * (coordsLocal + blendLocal). This spec pins the driver mirror
  * BIT-identical to the Column pipeline (stageCoords + gatherBlend) over
  * the live fixture cubes, including the clamp/extrapolation branches —
  * the guarantee the x14/x17/p01 hash gates rest on. */
class BeamBlendLocalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("driver blend mirror is bit-identical to the Column pipeline") {
    import spark.implicits._
    val quad = BeamFixture.ensureQuad(BeamFixture.defaultQuadSchema)
    val (reP, imP) = quad.head._2
    val hdu = Fits.read(reP)
    val reC = Fits.beamCube(reP); val imC = Fits.beamCube(imP)
    val fmin = reC.freqs.head; val fmax = reC.freqs.last
    val lmZoom = 2048.0
    // points across the footprint: interior, edges, below/above the
    // freq grid (the fscale extrapolation), exact plane hits
    val pts = for {
      i <- 0 until 9; j <- 0 until 5
    } yield (
      (i - 4) * 3.4e-6 * (j + 1),
      (4 - i) * 2.1e-6 * (j + 1),
      Seq(fmin * 0.8, fmin, (fmin + fmax) / 2, fmax, fmax * 1.3)(j))
    val dim = pts.zipWithIndex.map { case ((l, m, f), id) =>
      (id.toLong, id.toLong % 4, l, m, f)
    }.toDF("src_id", "chan", "l", "m", "freq")
    val viaColumns = BeamCubeTerm.gatherBlend(
      BeamCubeTerm.stageCoords(dim, reP, lmZoom), reP, imP, "bce")
      .select(col("src_id"), col("bce_re"), col("bce_im"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    pts.zipWithIndex.foreach { case ((l, m, f), id) =>
      val co = BeamCubeTerm.coordsLocal(l, m, f, hdu, reC, lmZoom)
      val (re, im) = BeamCubeTerm.blendLocal(co, reC, imC)
      val (cre, cim) = viaColumns(id.toLong)
      assert(java.lang.Double.doubleToRawLongBits(re) ===
        java.lang.Double.doubleToRawLongBits(cre),
        s"re mismatch at ($l, $m, $f): $re vs $cre")
      assert(java.lang.Double.doubleToRawLongBits(im) ===
        java.lang.Double.doubleToRawLongBits(cim),
        s"im mismatch at ($l, $m, $f): $im vs $cim")
    }
  }
}
