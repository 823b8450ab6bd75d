package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bda

/** The reference Binner.add_row close rule (bda_mapping.py:111-186):
  * motion-triggered sinc closes, edge-to-edge time spans, the auto-corr
  * fast path — the cases the constant-uvw oracle of a08/a09 cannot reach —
  * plus channel factor snapping. */
class BdaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // fringeScale = maxChanFreq·sin(maxLm)·π/c = π/10 with these values, so
  // Ψ = π·|Δuvw|/10; decorrelation D=0.175 puts the sinc(πD) close
  // threshold at ≈0.95 — the bin closes once |Δuvw| exceeds ~1.76
  private def cfg(timeBinSecs: Double) = Bda.Config(
    decorrelation = 0.175, maxLm = math.Pi / 2,
    maxChanFreq = Bda.C / 10.0, timeBinSecs = timeBinSecs,
    maxUvwDist = 10.0, chanTol = 0.95, nchan = 4, fracBw = 0.2)

  test("uvw drift beyond the decorrelation tolerance closes the bin") {
    import spark.implicits._
    val rows = Seq(
      (0L, 0L, 1L, 0.0, 1.0, 0.0, 0.0, 0.0), // opens bin 0 (uvw ref 0,0,0)
      (1L, 0L, 1L, 1.0, 1.0, 1.0, 0.0, 0.0), // sin(Ψ)/Ψ=0.984 -> stays
      (2L, 0L, 1L, 2.0, 1.0, 2.0, 0.0, 0.0), // 0.936 < 0.95 -> bin 1
      (3L, 0L, 1L, 3.0, 1.0, 2.5, 0.0, 0.0)) // d=0.5 from new ref -> stays
      .toDF("row_id", "ant1", "ant2", "time", "ivl", "u", "v", "w")
    val got = Bda.mapper(rows, cfg(100.0))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("time close uses the edge-to-edge span, not accumulated intervals") {
    import spark.implicits._
    // row 1's upper edge is 1.6 s past row 0's lower edge although the
    // interval SUM is only 1.2 — the reference's dt rule closes, the old
    // accumulator rule would not
    val rows = Seq(
      (0L, 0L, 1L, 0.0, 1.0, 0.0, 0.0, 0.0),
      (1L, 0L, 1L, 1.0, 0.2, 0.0, 0.0, 0.0))
      .toDF("row_id", "ant1", "ant2", "time", "ivl", "u", "v", "w")
    val got = Bda.mapper(rows, cfg(1.5))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(0L -> 0L, 1L -> 1L))
  }

  test("auto-correlated baselines never close (reference fast path)") {
    import spark.implicits._
    val rows = (0L until 6L).map(i =>
        (i, 2L, 2L, i * 100.0, 1.0, 0.0, 0.0, 0.0)) // huge time gaps
      .toDF("row_id", "ant1", "ant2", "time", "ivl", "u", "v", "w")
    val got = Bda.mapper(rows, cfg(1.0))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.values.toSet === Set(0L), s"auto-corr bins fragmented: $got")
  }

  test("channel factor grows with baseline length") {
    import spark.implicits._
    val rows = Seq(
      (0L, 0L, 0L, 0.0, 1.0, 0.0, 0.0, 0.0),  // |uvw|=0  -> full averaging (1)
      (1L, 1L, 2L, 0.0, 1.0, 9.0, 0.0, 0.0))  // |uvw|=9  -> finer channels
      .toDF("row_id", "ant1", "ant2", "time", "ivl", "u", "v", "w")
    val got = Bda.mapper(rows, cfg(100.0))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    // blLen=9: psi = pi*9/10*0.2 = 0.565; sinc(2*psi)=0.796 < 0.95,
    // sinc(psi)=0.947 < 0.95 -> falls to 4. blLen=0 -> 1.
    assert(got === Map(0L -> 1L, 1L -> 4L))
  }

  test("min_nchan floors the channel factor at the next nchan divisor") {
    import spark.implicits._
    val rows = Seq(
      (0L, 0L, 0L, 0.0, 1.0, 0.0, 0.0, 0.0)) // |uvw|=0 would give 1
      .toDF("row_id", "ant1", "ant2", "time", "ivl", "u", "v", "w")
    val got = Bda.mapper(rows, cfg(100.0).copy(minNchan = 2))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got === Map(0L -> 2L))
  }
}
