package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.CxCol

/** MODEL_DATA-style write-back (SURVEY §2.12 sinks): predict output to
  * partitioned parquet and back, bit-identical. */
class SinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("predict output round-trips through a chan-partitioned parquet sink") {
    val out = java.nio.file.Files.createTempDirectory("model_data").toString
    val vis = SparkEntry.queries("r02_predict_vis")(spark, TestSpark.sf)
    vis.write.mode("overwrite").partitionBy("chan").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() === vis.count())
    // partition pruning: selecting one chan reads one directory
    val one = back.filter(col("chan") === 3)
    val scanned = one.queryExecution.executedPlan.toString
    assert(one.count() === vis.filter(col("chan") === 3).count())
    assert(scanned.contains("PartitionFilters") || scanned.contains("chan"))
    // values identical (exact dyadic arithmetic -> bitwise)
    val joined = vis.select(col("row_id"), col("chan"),
        col("vre").as("a_re"), col("vim").as("a_im"))
      .join(back, Seq("row_id", "chan"))
    val mismatched = joined
      .filter(col("a_re") =!= col("vre") || col("a_im") =!= col("vim"))
      .count()
    assert(mismatched === 0)
  }

  test("complex struct packing survives a parquet round trip") {
    val out = java.nio.file.Files.createTempDirectory("cx_pack").toString
    import spark.implicits._
    val df = Seq((1L, 0.5, -0.25), (2L, -1.5, 2.0)).toDF("id", "re", "im")
      .select(col("id"), CxCol(col("re"), col("im")).struct_().as("vis"))
    df.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
      .select(col("id"), col("vis.re"), col("vis.im")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(back === Set((1L, 0.5, -0.25), (2L, -1.5, 2.0)))
  }
}
