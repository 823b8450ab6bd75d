package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bda

/** Motion-triggered bin closes + channel factor snapping — the cases the
  * constant-uvw oracle of a08/a09 cannot reach. */
class BdaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("uvw drift beyond the decorrelation tolerance closes the bin") {
    import spark.implicits._
    // maxUvwDist=10, tol=0.95 -> close when sinc(pi*d/10) < 0.95,
    // i.e. |Δuvw| > ~1.76. Time cap is loose (100 s).
    val rows = Seq(
      (0L, 0L, 1L, 0.0, 1.0, 0.0, 0.0, 0.0), // opens bin 0 (uvw ref 0,0,0)
      (1L, 0L, 1L, 1.0, 1.0, 1.0, 0.0, 0.0), // d=1.0   -> stays
      (2L, 0L, 1L, 2.0, 1.0, 2.0, 0.0, 0.0), // d=2.0   -> closes, bin 1
      (3L, 0L, 1L, 3.0, 1.0, 2.5, 0.0, 0.0)) // d=0.5 from new ref -> stays
      .toDF("row_id", "ant1", "ant2", "time", "ivl", "u", "v", "w")
    val got = Bda.mapper(rows, 10.0, 0.95, 100.0, 4, 0.2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("channel factor grows with baseline length") {
    import spark.implicits._
    val rows = Seq(
      (0L, 0L, 0L, 0.0, 1.0, 0.0, 0.0, 0.0),  // |uvw|=0  -> full averaging (1)
      (1L, 1L, 2L, 0.0, 1.0, 9.0, 0.0, 0.0))  // |uvw|=9  -> finer channels
      .toDF("row_id", "ant1", "ant2", "time", "ivl", "u", "v", "w")
    val got = Bda.mapper(rows, 10.0, 0.95, 100.0, 4, 0.2)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    // blLen=9: psi = pi*9/10*0.2 = 0.565; sinc(2*psi)=0.796 < 0.95,
    // sinc(psi)=0.947 < 0.95 -> falls to 4. blLen=0 -> 1.
    assert(got === Map(0L -> 1L, 1L -> 4L))
  }
}
