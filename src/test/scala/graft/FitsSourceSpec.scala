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

  test("column pruning reaches the FITS reader") {
    val path = BeamFixture.ensure(BeamFixture.defaultPath)
    val leaf = spark.read.format("fits").load(path).select("value")
      .queryExecution.executedPlan.collectLeaves().head
    assert(leaf.output.map(_.name) === Seq("value"),
      "the scan must materialize only the pruned column")
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
