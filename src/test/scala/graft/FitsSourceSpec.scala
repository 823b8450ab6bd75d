package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.{BeamFixture, Fits}

/** The DataSource V2 face of the FITS reader: `spark.read.format("fits")`
  * must surface exactly the pixels `Fits.read` parses, one partition per
  * file, with column pruning pushed into the reader.
  */
class FitsSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("format(\"fits\") reads the beam fixture pixel-exactly") {
    val path = BeamFixture.ensure(BeamFixture.defaultPath)
    val df = spark.read.format("fits").load(path)
    assert(df.columns.toSeq === Seq("path", "plane", "y", "x", "value"))
    assert(df.count() === BeamFixture.NFreq.toLong *
      BeamFixture.NPix * BeamFixture.NPix)
    val hdu = Fits.read(path)
    val got = df.orderBy("plane", "y", "x").collect()
    for (idx <- Seq(0, 1, 40, got.length - 1)) {
      val r = got(idx)
      val i = (r.getLong(1) * BeamFixture.NPix + r.getLong(2)) *
        BeamFixture.NPix + r.getLong(3)
      assert(r.getDouble(4) === hdu.data(i.toInt),
        s"pixel $idx diverges from the direct parse")
    }
  }

  test("the scan runs COLUMNAR: batches feed the pipeline, values unchanged") {
    val path = BeamFixture.ensure(BeamFixture.defaultPath)
    val df = spark.read.format("fits").load(path)
    val plan = df.queryExecution.executedPlan.toString
    // vectorized reader engaged: Spark inserts ColumnarToRow above the
    // BatchScan exactly as it does for parquet
    assert(plan.contains("ColumnarToRow"), plan)
    val s = df.agg(org.apache.spark.sql.functions.sum("value")).collect()
      .head.getDouble(0)
    val direct = Fits.read(path).data.sum
    assert(s === direct)
  }

  test("column pruning reaches the FITS reader") {
    val path = BeamFixture.ensure(BeamFixture.defaultPath)
    val leaf = spark.read.format("fits").load(path).select("value")
      .queryExecution.executedPlan.collectLeaves().head
    assert(leaf.output.map(_.name) === Seq("value"),
      "the scan must materialize only the pruned column")
  }

  test("write face round-trips: df.write.format(\"fits\") -> read back pixel-exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fits_sink").toString
    // a 2-plane 4x3 image with a value that encodes its own coordinates
    val img = (for (p <- 0 until 2; y <- 0 until 3; x <- 0 until 4)
      yield (p.toLong, y.toLong, x.toLong, p * 100.0 + y * 10.0 + x + 0.25))
      .toDF("plane", "y", "x", "value")
    img.repartition(1).write.format("fits").mode("overwrite").save(dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".fits"))
    assert(files.length === 1)
    // direct parse: dims in the header, C-order data
    val hdu = Fits.read(files.head.getPath)
    assert(hdu.naxis === Seq(4, 3, 2))
    assert(hdu.data((1 * 3 + 2) * 4 + 3) === 123.25)
    // V2 reader round-trip
    val back = spark.read.format("fits").load(files.head.getPath)
      .select("plane", "y", "x", "value")
    assert(back.count() === 24)
    assert(back.except(img).isEmpty && img.except(back).isEmpty)
  }

  test("multi-file load: one partition per file, union of pixels") {
    val (re, im) = BeamFixture.ensurePair(BeamFixture.defaultSchema)
    val df = spark.read.format("fits").load(re, im)
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() === 2L * BeamFixture.NFreq *
      BeamFixture.NPix * BeamFixture.NPix)
    assert(df.select("path").distinct().count() === 2)
  }
}
