package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the codegen'd `chan_bin_avg` expression BIT-FOR-BIT against the
  * aggregate()-lambda fold it replaced in a11 — same two-tier flag
  * consensus, same weight hierarchy, same accumulation order — so any
  * transcription slip fails here before it can flip the a11 oracle. */
class ChanBinAvgSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("chan_bin_avg equals the aggregate() lambda fold bit-for-bit") {
    graft.expr.GraftFunctions.register(spark)
    val nBin = queries.ArrayMsQ.NChan / 2
    val lambdaBins =
      s"""transform(sequence(0, ${nBin - 1}), b ->
         |  aggregate(slice(arrays_zip(vis, wspec, flag), 2*b + 1, 2),
         |    named_struct('n_ok', 0L, 'w_u', 0e0, 're_u', 0e0, 'im_u', 0e0,
         |                 'w_f', 0e0, 're_f', 0e0, 'im_f', 0e0),
         |    (a, e) -> named_struct(
         |      'n_ok', a.n_ok + if(e.flag, 0L, 1L),
         |      'w_u',  a.w_u  + if(e.flag, 0e0, coalesce(e.wspec, w_row, 1e0)),
         |      're_u', a.re_u + if(e.flag, 0e0, coalesce(e.wspec, w_row, 1e0) * e.vis.re),
         |      'im_u', a.im_u + if(e.flag, 0e0, coalesce(e.wspec, w_row, 1e0) * e.vis.im),
         |      'w_f',  a.w_f  + if(e.flag, coalesce(e.wspec, w_row, 1e0), 0e0),
         |      're_f', a.re_f + if(e.flag, coalesce(e.wspec, w_row, 1e0) * e.vis.re, 0e0),
         |      'im_f', a.im_f + if(e.flag, coalesce(e.wspec, w_row, 1e0) * e.vis.im, 0e0)),
         |    a -> named_struct(
         |      'n_used', if(a.n_ok > 0, a.n_ok, 2L),
         |      'oflag',  a.n_ok = 0,
         |      'wsum',   if(a.n_ok > 0, a.w_u, a.w_f),
         |      'ore',    if(a.n_ok > 0, a.re_u / a.w_u, a.re_f / a.w_f),
         |      'oim',    if(a.n_ok > 0, a.im_u / a.w_u, a.im_f / a.w_f))))""".stripMargin
    // the fixture includes null wspec elements, null w_row rows, and
    // entirely-flagged bins (~1/7) — every branch of the hierarchy and
    // the consensus fallback is exercised
    val rows = queries.ArrayMsQ.msArray(spark, TestSpark.sf)
      .select(col("row_id"),
        expr(lambdaBins).as("lb"),
        call_function("chan_bin_avg",
          col("vis"), col("wspec"), col("flag"), col("w_row"), lit(2)).as("eb"))
      .collect()
    assert(rows.nonEmpty)
    var flaggedBins = 0
    rows.foreach { r =>
      val lb = r.getSeq[org.apache.spark.sql.Row](1)
      val eb = r.getSeq[org.apache.spark.sql.Row](2)
      assert(lb.size === eb.size)
      lb.zip(eb).foreach { case (a, b) =>
        assert(a.getLong(0) === b.getLong(0), s"n_used diverges at ${r.getLong(0)}")
        assert(a.getBoolean(1) === b.getBoolean(1))
        // bit-level equality of the doubles, not numeric tolerance
        assert(java.lang.Double.doubleToRawLongBits(a.getDouble(2)) ===
          java.lang.Double.doubleToRawLongBits(b.getDouble(2)))
        assert(java.lang.Double.doubleToRawLongBits(a.getDouble(3)) ===
          java.lang.Double.doubleToRawLongBits(b.getDouble(3)))
        assert(java.lang.Double.doubleToRawLongBits(a.getDouble(4)) ===
          java.lang.Double.doubleToRawLongBits(b.getDouble(4)))
        if (b.getBoolean(1)) flaggedBins += 1
      }
    }
    assert(flaggedBins > 0, "fixture must exercise the all-flagged fallback")
  }

  test("ragged final bin: trailing channels emit a partial bin, not data loss") {
    graft.expr.GraftFunctions.register(spark)
    // 5 channels, binSize 2 → bins [0,1], [2,3], [4] — the last bin has
    // width 1 and its all-flagged n_used must report 1 (true width), not
    // the nominal binSize
    val rows = spark.sql(
      """SELECT chan_bin_avg(
        |  array(named_struct('re', 1e0, 'im', 0e0),
        |        named_struct('re', 3e0, 'im', 0e0),
        |        named_struct('re', 5e0, 'im', 2e0),
        |        named_struct('re', 7e0, 'im', 4e0),
        |        named_struct('re', 9e0, 'im', 8e0)),
        |  array(1e0, 1e0, 1e0, 3e0, 2e0),
        |  array(false, false, false, false, true),
        |  CAST(NULL AS DOUBLE), 2) AS bins""".stripMargin).collect()
    val bins = rows(0).getSeq[org.apache.spark.sql.Row](0)
    assert(bins.size === 3, "5 channels / binSize 2 must yield 3 bins")
    // full bins unchanged
    assert(bins(0).getLong(0) === 2L && bins(0).getDouble(3) === 2.0)
    assert(bins(1).getLong(0) === 2L && bins(1).getDouble(3) === 6.5)
    // ragged all-flagged bin: width-1 count, flagged, averages its sample
    assert(bins(2).getLong(0) === 1L)
    assert(bins(2).getBoolean(1) === true)
    assert(bins(2).getDouble(2) === 2.0)
    assert(bins(2).getDouble(3) === 9.0 && bins(2).getDouble(4) === 8.0)
  }
}
