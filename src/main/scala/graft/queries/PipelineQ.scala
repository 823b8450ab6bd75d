package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q

/** End-to-end USER pipeline bench rows — the closest thing in the
  * registry to timing the reference's CLI runs rather than an operator.
  *
  * p01 is `rime/examples/predict.py --beam` wired exactly as a user would
  * run it (SURVEY §3.2): an MS-layout parquet dataset on disk → feed
  * basis from POLARIZATION.CORR_TYPE → casa parallactic angles from the
  * real geometry → full-Jones FITS beam cube → grouped fused-RIME
  * predict → MODEL_DATA written back INTO the dataset as a member table
  * (the predict.py:580-586 sink) → read back. Every stage is the
  * REGISTERED implementation (`pipelines.PredictPipeline
  * .modelDataFullJones`, `io.MsDataset.writeModelData`); this row exists
  * to time the composition INCLUDING its parquet I/O, which the x-family
  * hash gates deliberately exclude.
  *
  * The MS scales with the data: MAIN is derived engine-side from the
  * events table's ids (`MsDataset.writeSyntheticScaled` — a distributed
  * projection, built once per sf directory and reused), so a k× replica
  * means a k× visibility table through the whole chain. Correctness is
  * carried by the constituent gates (x12/x14/x17 hash the beam-DDE
  * algebra; PredictPipelineSpec pins modelDataFullJones against an
  * independent PA/beam transcription; MsDatasetSpec pins the sink
  * round-trip), so the row is a designed rows-only check like g06 —
  * an oracle here would duplicate the x17 SQL against a /tmp dataset
  * DuckDB cannot see.
  */
object PipelineQ {

  private val NAnt = 7
  private val NChan = 2
  private val Ra0 = math.Pi / 4
  private val Dec0 = 0.0

  /** Build-once MS dataset derived from the sf directory's events ids.
    * The marker file pins a CONTENT fingerprint — count plus min/max/sum
    * of event_id — so both a replica swap at the same path (sf0.1 vs a
    * 50x replica dir) AND a same-cardinality regeneration with different
    * ids rebuild instead of silently reusing a stale MS (round-12 ADVICE:
    * count alone missed the second case). One aggregate job, read with
    * Files.readString (no leaked handle). */
  private[queries] def ensureMs(spark: SparkSession, dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val msDir = s"/tmp/graft_p01_ms_$tag"
    val marker = java.nio.file.Paths.get(s"$msDir/_GRAFT_MS_ROWS")
    val ids = graft.core.Tables.events(spark, dir)
      .select(col("event_id").as("row_id"))
    val f = ids.agg(count(lit(1)), min(col("row_id")), max(col("row_id")),
      sum(col("row_id"))).head()
    val fingerprint = if (f.getLong(0) == 0L) "0,,,"
      else s"${f.getLong(0)},${f.getLong(1)},${f.getLong(2)},${f.getLong(3)}"
    val stale = !java.nio.file.Files.exists(marker) ||
      scala.util.Try(java.nio.file.Files.readString(marker).trim)
        .toOption.forall(_ != fingerprint)
    if (stale) {
      graft.io.MsDataset.writeSyntheticScaled(
        spark, msDir, ids, NChan, NAnt, Ra0, Dec0)
      java.nio.file.Files.writeString(marker, fingerprint)
    }
    msDir
  }

  /** Fixed broadcast-sized sky model: three WSClean point components
    * inside the beam cube's footprint (the fixture spans ±1.5 deg). */
  private[queries] def ensureSkyModel(): String = {
    val f = new java.io.File("/tmp/graft_p01_sky.txt")
    if (!f.exists()) {
      val w = new java.io.PrintWriter(f)
      w.print(
        """Format = Name, Type, Ra, Dec, I, SpectralIndex, LogarithmicSI, ReferenceFrequency='1.4e9', MajorAxis, MinorAxis, Orientation
          |a,POINT,03:00:00,00.00.00,1.0,[],false,,,,
          |b,POINT,03:00:40,00.15.00,0.5,[],false,,,,
          |c,POINT,02:59:20,-00.12.00,0.25,[],false,,,,
          |""".stripMargin)
      w.close()
    }
    f.getAbsolutePath
  }

  private[queries] def ensureBeam(): String = {
    new java.io.File("/tmp/graft_p01_beam").mkdirs()
    val schema = "/tmp/graft_p01_beam/beam_$(corr)_$(reim).fits"
    graft.io.BeamFixture.ensureQuad(schema)
    schema
  }

  val qs: Seq[Q] = Seq(
    Q.noOracle("p01_predict_pipeline") { (s, dir) =>
      val msDir = ensureMs(s, dir)
      val md = graft.pipelines.PredictPipeline.modelDataFullJones(
        s, msDir, ensureSkyModel(), ensureBeam())
      graft.io.MsDataset.writeModelData(md, msDir)
      graft.io.MsDataset.readModelData(s, msDir)
    })
}
