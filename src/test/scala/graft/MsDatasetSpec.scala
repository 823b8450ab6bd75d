package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.MsDataset

/** Pins the two contracts the p01 pipeline row rests on (round-12
  * ADVICE): (1) `writeSyntheticScaled`'s Catalyst restatement of the
  * `writeSynthetic` driver-loop formulas is row-for-row identical — any
  * drift in the div/pmod arithmetic would silently change p01's geometry
  * under its rows-only check; (2) the p01 registry row itself has the
  * schema and cardinality the pipeline contract promises. */
class MsDatasetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("writeSyntheticScaled MAIN is row-identical to writeSynthetic") {
    import spark.implicits._
    val n = 193 // odd, > nant², exercises every pmod/div branch
    val a = java.nio.file.Files.createTempDirectory("ms_loop").toString
    val b = java.nio.file.Files.createTempDirectory("ms_scaled").toString
    MsDataset.writeSynthetic(spark, a, nrow = n, nchan = 3, nant = 7,
      ra0 = 0.25, dec0 = -0.38)
    MsDataset.writeSyntheticScaled(spark, b,
      spark.range(n).select(col("id").as("row_id")), nchan = 3, nant = 7,
      ra0 = 0.25, dec0 = -0.38)
    def mainRows(dir: String) =
      spark.read.parquet(s"$dir/MAIN.parquet")
        .select(col("row_id"), col("TIME"), col("ANTENNA1"), col("ANTENNA2"),
          col("UVW"), col("FIELD_ID"), col("DATA_DESC_ID"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2),
          r.getInt(3), r.getSeq[Double](4).toList, r.getInt(5), r.getInt(6)))
        .sortBy(_._1)
    val loop = mainRows(a)
    val scaled = mainRows(b)
    assert(loop.length === n && scaled.length === n)
    // bitwise equality: the doubles are exact dyadic arithmetic on both
    // paths, so ANY difference is a formula drift, not float noise
    loop.zip(scaled).foreach { case (l, s) => assert(l === s) }
    // subtables identical too (both write the same driver-side literals)
    for (t <- Seq("ANTENNA", "SPECTRAL_WINDOW", "FIELD", "POLARIZATION")) {
      val da = spark.read.parquet(s"$a/$t.parquet")
      val db = spark.read.parquet(s"$b/$t.parquet")
      assert(da.collect().map(_.toString).sorted
        === db.collect().map(_.toString).sorted, s"subtable $t differs")
    }
  }

  test("p01_predict_pipeline: schema and cardinality contract") {
    val out = SparkEntry.queries("p01_predict_pipeline")(spark, TestSpark.sf)
    assert(out.columns.sorted === Array("chan", "row_id",
      "xx_im", "xx_re", "xy_im", "xy_re",
      "yx_im", "yx_re", "yy_im", "yy_re"))
    import graft.core.Tables
    val nEvents = Tables.events(spark, TestSpark.sf).count()
    // one output row per (MS row, chan): MAIN has one row per event id
    // (ensureMs derives row_id from event_id) and the MS fixes nchan = 2
    assert(out.count() === nEvents * 2)
    // key surface is dense and unique: every (row_id, chan) exactly once
    assert(out.select("row_id", "chan").distinct().count() === nEvents * 2)
    // the MODEL_DATA surface is non-degenerate: some non-zero visibility
    assert(out.filter(col("xx_re") =!= 0.0).count() > 0)
  }
}
