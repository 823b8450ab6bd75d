package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.SyntheticMs

/** The grid-free hessian is R†R: its quadratic form must equal the vis-
  * space energy, <x, Hx> = Σ_rows |Rx|², per channel — checked on the
  * exact f13 query output (the same identity the reference's hessian
  * tests use, gridding/wgridder/hessian.py). */
class HessianSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("per-channel <x, Hx> equals the model-vis energy") {
    val dir = TestSpark.sf
    val hx = SparkEntry.queries("f13_dft_hessian")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // model vis energy per channel from the same synthetic inputs
    val src = SyntheticMs.sources(spark, dir, 5)
      .select("src_id", "flux", "l", "m").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val rows = SyntheticMs.uvwRows(spark, dir, 16)
      .select("row_id", "u", "v", "w").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val chans = SyntheticMs.channels(spark, dir, 8)
      .select("chan", "freq").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    for ((chan, freq) <- chans) {
      var energy = 0.0
      for ((_, u, v, w) <- rows) {
        var re = 0.0; var im = 0.0
        for ((_, flux, l, m) <- src) {
          val n = math.sqrt(math.max(0.0, 1 - l * l - m * m)) - 1.0
          val ph = 2.0 * math.Pi / 299792458.0 * (u * l + v * m + w * n) * freq
          re += flux * math.cos(ph); im += flux * math.sin(ph)
        }
        energy += re * re + im * im
      }
      val quad = src.map { case (sid, flux, _, _) => flux * hx((sid, chan)) }.sum
      assert(quad >= 0.0, s"chan $chan: quadratic form negative ($quad)")
      assert(math.abs(quad - energy) / energy < 1e-3,
        s"chan $chan: <x,Hx>=$quad but |Rx|^2=$energy")
    }
  }
}
