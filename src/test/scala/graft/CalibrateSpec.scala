package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.CxCol
import graft.operators.Calibrate

/** Gauss-Newton phase-only solver recovers gains that reproduce the
  * observed visibilities (gauge-invariant check: residual, not phases). */
class CalibrateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("solver drives the residual to ~0 on noiseless data") {
    import spark.implicits._
    // 4 times x 5 antennas, all baselines p<q, known phases
    val rows = for {
      t <- 0L until 4L
      p <- 0L until 5L
      q <- (p + 1) until 5L
    } yield {
      val phiP = ((t * 7 + p * 3) % 11) * 0.05
      val phiQ = ((t * 7 + q * 3) % 11) * 0.05
      val mRe = 1.0 + 0.25 * ((t + p + q) % 3)
      val mIm = 0.25 * ((t + 2 * p + q) % 4) - 0.375
      // v = e^{i phiP} m e^{-i phiQ}
      val c = math.cos(phiP - phiQ); val s = math.sin(phiP - phiQ)
      (t, p, q, mRe, mIm, mRe * c - mIm * s, mRe * s + mIm * c, 1.0)
    }
    val in = rows.toDF("time_index", "ant1", "ant2",
      "m_re", "m_im", "v_re", "v_im", "w")
    val solved = Calibrate.gaussNewtonPhaseOnly(in, maxIter = 30, tol = 1e-14)

    val ph = solved.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val maxResid = rows.map { case (t, p, q, mRe, mIm, vRe, vIm, _) =>
      val d = ph((t, p)) - ph((t, q))
      val c = math.cos(d); val s = math.sin(d)
      val fitRe = mRe * c - mIm * s
      val fitIm = mRe * s + mIm * c
      math.hypot(vRe - fitRe, vIm - fitIm)
    }.max
    assert(maxResid < 1e-6, s"max residual $maxResid")
  }
}
