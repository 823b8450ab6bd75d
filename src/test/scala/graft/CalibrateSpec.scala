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

  test("chan-resolved solve: shuffle-degraded path (threshold -1) matches the broadcast path") {
    import spark.implicits._
    // 3 times x 4 antennas x 2 chans, chan-dependent known phases
    val rows = for {
      t <- 0L until 3L
      p <- 0L until 4L
      q <- (p + 1) until 4L
      c <- 0L until 2L
    } yield {
      val phiP = ((t * 7 + p * 3 + c * 5) % 11) * 0.05
      val phiQ = ((t * 7 + q * 3 + c * 5) % 11) * 0.05
      val mRe = 1.0 + 0.25 * ((t + p + q + c) % 3)
      val mIm = 0.25 * ((t + 2 * p + q) % 4) - 0.375
      val cs = math.cos(phiP - phiQ); val sn = math.sin(phiP - phiQ)
      (t, p, q, c, mRe, mIm, mRe * cs - mIm * sn, mRe * sn + mIm * cs, 1.0)
    }
    val in = rows.toDF("time_index", "ant1", "ant2", "chan",
      "m_re", "m_im", "v_re", "v_im", "w")
    def solve(): Map[(Long, Long, Long), Double] =
      Calibrate.gaussNewtonPhaseOnly(in, maxIter = 25, tol = 1e-14,
          extraKeys = Seq("chan"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3))
        .toMap
    val bcastRun = solve()
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val shuffleRun = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      solve()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert(bcastRun.keySet === shuffleRun.keySet)
    // identical iteration algebra either way — values agree to fp noise
    val maxDiff = bcastRun.map { case (k, v) =>
      math.abs(v - shuffleRun(k))
    }.max
    assert(maxDiff < 1e-9, s"paths diverge by $maxDiff")
    // and the solved phases reproduce the observations (gauge-invariant)
    val maxResid = rows.map { case (t, p, q, c, mRe, mIm, vRe, vIm, _) =>
      val d = bcastRun((t, p, c)) - bcastRun((t, q, c))
      val cs = math.cos(d); val sn = math.sin(d)
      math.hypot(vRe - (mRe * cs - mIm * sn), vIm - (mRe * sn + mIm * cs))
    }.max
    assert(maxResid < 1e-6, s"max residual $maxResid")
  }
}
