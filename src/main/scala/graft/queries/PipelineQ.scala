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
    * Files.readString (no leaked handle). Returns (msDir, MAIN row count)
    * — the count is already in the fingerprint, so callers thread it into
    * the pipelines instead of re-counting MAIN (round-13: one scan job
    * saved per pipeline invocation). */
  private[graft] def ensureMs(spark: SparkSession, dir: String): (String, Long) = {
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
    (msDir, f.getLong(0))
  }

  /** Fixed broadcast-sized sky model: three WSClean point components
    * inside the beam cube's footprint (the fixture spans ±1.5 deg). */
  private[graft] def ensureSkyModel(): String = {
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

  private[graft] def ensureBeam(): String = {
    new java.io.File("/tmp/graft_p01_beam").mkdirs()
    val schema = "/tmp/graft_p01_beam/beam_$(corr)_$(reim).fits"
    graft.io.BeamFixture.ensureQuad(schema)
    schema
  }

  /** p02 imaging geometry: a 48×48 pixel field, 4 w-planes, 4×4 facets.
    * Image/PSF work is dimension-sized (pixels × grid cells, constant in
    * data); only the vis table scales. */
  private[graft] val ImgCfg = graft.pipelines.ImagingPipeline.Config(
    nx = 48, ny = 48, cell = 1.0 / 48,
    taps = graft.queries.GriddingQ.Taps,
    nPlanes = 4, wMax = 0.5, eta = 1e-2,
    facets = 4, gamma = 0.5, threshold = 1e-3, maxIter = 300, psfHalf = 3)

  /** Three point sources at interior facet pixels (facet borders at
    * multiples of 12). */
  private[graft] val ImgSources = Seq((33, 15, 3.0), (9, 38, 2.0),
    (22, 22, 1.0))

  /** Data-scaled visibility table for the imaging cycle, derived from the
    * events ids ENGINE-side (the p01 writeSyntheticScaled idiom): uv
    * cycles over the full 48×48 integer cell grid (a k× replica covers
    * every cell ~k·n/2304 times — the grid agg collapses it, and the PSF
    * normalization divides the replication factor back out), w is a
    * dyadic spread in [−0.5, 0.5], and re/im are the exact DFT of the
    * three sources. One zero-shuffle projection of the events scan. */
  private[graft] def imagingVis(spark: SparkSession, dir: String)
      : DataFrame = {
    val ids0 = graft.core.Tables.events(spark, dir)
      .select(col("event_id").as("row_id"))
    // t44 class, scan side (round 14): the single-column event_id scan
    // compresses to one or two splits, and EVERYTHING downstream — the
    // source-DFT trig here, the 25× stencil expansion and grid partial
    // agg in the cycle — inherits that width. One explicit shuffle of
    // the 8-byte ids to a DATA-SCALED width (the p01/p04 idiom; explicit
    // count so AQE cannot re-coalesce the small-byte exchange) buys
    // full-width execution for the whole cycle. The count is one
    // metadata-cheap parquet job.
    val width = graft.core.Env.scaledWidth(spark, ids0.count(), 8192L)
    val ids = ids0.repartition(width, col("row_id"))
    val base = ids.select(
      col("row_id"),
      (pmod(col("row_id"), lit(48L)).cast("double") - 24.0).as("pu"),
      (pmod(expr("row_id div 48"), lit(48L)).cast("double") - 24.0).as("pv"),
      ((pmod(col("row_id") * 11L, lit(129L)).cast("double") - 64.0) / 128.0)
        .as("w"))
    val cfg = ImgCfg
    val terms = ImgSources.map { case (sx, sy, f) =>
      val lx = (sx - cfg.nx / 2.0) * cfg.cell
      val my = (sy - cfg.ny / 2.0) * cfg.cell
      val th = lit(2.0 * math.Pi) * (col("pu") * lx + col("pv") * my)
      (lit(f) * cos(th), lit(-f) * sin(th))
    }
    base.select(col("row_id"), col("pu"), col("pv"), col("w"),
      terms.map(_._1).reduce(_ + _).as("re"),
      terms.map(_._2).reduce(_ + _).as("im"))
  }

  val qs: Seq[Q] = Seq(
    Q.noOracle("p01_predict_pipeline") { (s, dir) =>
      val (msDir, nMain) = ensureMs(s, dir)
      val md = graft.pipelines.PredictPipeline.modelDataFullJones(
        s, msDir, ensureSkyModel(), ensureBeam(), mainRows = Some(nMain))
      // rowHint = nMain × nchan (known from the ensureMs fingerprint):
      // below the member-sink threshold the sink skips the per-chan
      // dynamic-partition layout (round 14, MsDataset.writeMember)
      graft.io.MsDataset.writeModelData(md, msDir, Some(nMain * NChan))
      graft.io.MsDataset.readModelData(s, msDir)
    },

    // -- the reference's imaging MAJOR CYCLE as one benched end-to-end
    //    row (round 12, VERDICT item 1): w-stacked gridding → per-plane
    //    DFT image + w-correction + detaper → facet-parallel Hogbom CLEAN
    //    → model DFT → residual visibilities — the vis2im/hogbom/
    //    im2residim chain (gridding/wgridder/im2residim.py:16-220,
    //    deconv/hogbom/clean.py:122-198) composed from the f09–f13/i01/
    //    i02-gated operators. Rows-only check like p01/g06: the algebra
    //    is hash-gated by its constituents and spec-pinned end to end
    //    (ImagingPipelineSpec: exact source recovery + residual collapse
    //    on full coverage, plus this row's shape, cardinality, and
    //    residual-power reduction on the real sf fixture), and the
    //    input vis is a /tmp-free engine-side derivation DuckDB could
    //    only restate by duplicating the pipeline itself. Scale shape:
    //    the vis table is touched exactly three times (PSF grid agg,
    //    dirty grid agg, broadcast-join subtraction), image/facet/PSF
    //    work is dimension-bounded, and the only driver materialization
    //    is the 49-scalar PSF patch.
    Q.noOracle("p02_imaging_pipeline") { (s, dir) =>
      graft.pipelines.ImagingPipeline
        .majorCycle(imagingVis(s, dir), ImgCfg).residualVis
    },

    // -- the LLM-data curation funnel as one benched end-to-end row
    //    (round 12; round 13: HASH-GATED): language gate → Gopher rules →
    //    exact dedup → MinHash signature collapse → SemDeDup → sequence
    //    packing → source-partitioned parquet sink → read-back. The
    //    oracle composes the six stage oracles (t03/t32/t01/t07/t29/t25)
    //    as MATERIALIZED CTEs over the SAME documents/embeddings tables
    //    the engine reads (the t51/t11 precedent): exact dedup is
    //    algebraically subsumed by the full-signature collapse
    //    (CurationPipelineSpec proves the survivor-set equality), the
    //    SemDeDup prune rule is t29's non-iterative formulation (a doc is
    //    pruned iff ANY lower surviving cluster-mate has cos >= tau —
    //    including mates that are themselves pruned, the documented
    //    chain contract — so no recursion defeats SQL), per-pair dots go
    //    through `list_dot_product` (P rows, exact under the 2^53 bound
    //    DeterminismSpec asserts), and every window/HUGEINT-derived
    //    integer is CAST to BIGINT per the TYPE RULE. The sink + readback
    //    stay inside the timed Spark body (p01's MODEL_DATA idiom); the
    //    hashed surface is the read-back packed shard itself.
    Q("p03_curation_pipeline",
      """WITH l AS MATERIALIZED (
        |  SELECT doc_id, source, lang, text FROM (
        |    SELECT doc_id, source, lang, text,
        |      (length(text) - length(replace(text, ' the ', ''))) / 5
        |        + (length(text) - length(replace(text, ' and ', ''))) / 5 AS s_en,
        |      (length(text) - length(replace(text, ' der ', ''))) / 5
        |        + (length(text) - length(replace(text, ' und ', ''))) / 5 AS s_de,
        |      (length(text) - length(replace(text, ' el ', ''))) / 4
        |        + (length(text) - length(replace(text, ' los ', ''))) / 5 AS s_es,
        |      (length(text) - length(replace(text, ' le ', ''))) / 4
        |        + (length(text) - length(replace(text, ' et ', ''))) / 4 AS s_fr
        |    FROM documents WHERE length(text) > 0)
        |  WHERE lang = CASE
        |    WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
        |    WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
        |    WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END),
        |h AS (
        |  SELECT doc_id, tok, COUNT(*) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM l)
        |  GROUP BY doc_id, tok),
        |f AS (
        |  SELECT doc_id,
        |    CAST(SUM(c) AS BIGINT) AS n_tok,
        |    CAST(COUNT(*) AS BIGINT) AS n_typ,
        |    CAST(MAX(c) AS BIGINT) AS max_cnt,
        |    CAST(SUM(CASE WHEN tok = 'a' OR tok = 'the' THEN c ELSE 0 END)
        |      AS BIGINT) AS n_stop,
        |    CAST(SUM(length(tok) * c) AS BIGINT) AS n_chars_ns
        |  FROM h GROUP BY doc_id),
        |g AS MATERIALIZED (
        |  SELECT l.doc_id, l.source, l.lang, l.text, f.n_tok
        |  FROM l JOIN f ON f.doc_id = l.doc_id
        |  WHERE f.n_tok BETWEEN 20 AND 400
        |    AND 3 * f.n_tok <= f.n_chars_ns AND f.n_chars_ns <= 10 * f.n_tok
        |    AND f.n_stop >= 2
        |    AND 5 * (f.n_tok - f.n_typ) <= 3 * f.n_tok
        |    AND 5 * f.max_cnt <= f.n_tok),
        |sig AS (
        |  SELECT doc_id,
        |    MIN(md5('a' || tok)) AS h1, MIN(md5('b' || tok)) AS h2,
        |    MIN(md5('c' || tok)) AS h3, MIN(md5('d' || tok)) AS h4
        |  FROM (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM g)
        |  GROUP BY doc_id),
        |keepers AS MATERIALIZED (
        |  SELECT MIN(doc_id) AS doc_id FROM sig GROUP BY h1, h2, h3, h4),
        |surv AS MATERIALIZED (
        |  SELECT g.* FROM g JOIN keepers ON keepers.doc_id = g.doc_id),
        |kk AS (SELECT GREATEST(8, COUNT(*) // 512) AS k FROM embeddings),
        |ce AS MATERIALIZED (
        |  SELECT e.cid, e.pos, e.qv FROM (
        |    SELECT vec_id AS cid,
        |      unnest(generate_series(1, len(embedding))) AS pos,
        |      CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS qv
        |    FROM embeddings) e
        |  JOIN surv ON surv.doc_id = e.cid),
        |n2t AS MATERIALIZED (SELECT cid, SUM(qv * qv) AS n2 FROM ce GROUP BY cid),
        |scid AS MATERIALIZED (
        |  SELECT cid FROM (
        |    SELECT cid, ROW_NUMBER() OVER (ORDER BY cid) AS rn FROM n2t)
        |  WHERE rn <= (SELECT k FROM kk)),
        |seed AS MATERIALIZED (
        |  SELECT ce.cid AS k, ce.pos, ce.qv AS cq
        |  FROM ce JOIN scid ON scid.cid = ce.cid),
        |dk AS (
        |  SELECT ce.cid, s.k, SUM((ce.qv - s.cq) * (ce.qv - s.cq)) AS d2
        |  FROM ce JOIN seed s ON ce.pos = s.pos
        |  GROUP BY ce.cid, s.k),
        |asg AS MATERIALIZED (
        |  SELECT cid, k FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY cid ORDER BY d2, k) AS rk
        |    FROM dk) WHERE rk = 1),
        |cl AS MATERIALIZED (
        |  SELECT cid, list(CAST(qv AS DOUBLE) ORDER BY pos) AS v
        |  FROM ce GROUP BY cid),
        |pruned AS MATERIALIZED (
        |  SELECT DISTINCT y.cid AS doc_id
        |  FROM asg x JOIN asg y ON x.k = y.k AND x.cid < y.cid
        |  JOIN cl a ON a.cid = x.cid JOIN cl b ON b.cid = y.cid
        |  JOIN n2t na ON na.cid = x.cid JOIN n2t nb ON nb.cid = y.cid
        |  WHERE CAST(CAST(list_dot_product(a.v, b.v) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
        |    >= 45e-2),
        |fin AS MATERIALIZED (
        |  SELECT surv.* FROM surv
        |  LEFT JOIN pruned ON pruned.doc_id = surv.doc_id
        |  WHERE pruned.doc_id IS NULL),
        |c AS (
        |  SELECT doc_id, source, lang, text, n_tok,
        |    doc_id // 8192 AS shard,
        |    SUM(n_tok) OVER (PARTITION BY source, doc_id // 8192
        |      ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM fin)
        |SELECT doc_id, source, lang, text, CAST(n_tok AS BIGINT) AS n_tok,
        |  CAST(shard AS BIGINT) AS shard,
        |  CAST((cum - n_tok) // 2048 AS BIGINT) AS pack_id,
        |  CAST((cum - n_tok) % 2048 AS BIGINT) AS pack_offset,
        |  CAST((cum - 1) // 2048 - (cum - n_tok) // 2048 + 1 AS BIGINT)
        |    AS n_chunks
        |FROM c""".stripMargin) { (s, dir) =>
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      graft.pipelines.CurationPipeline.run(s, dir, s"/tmp/graft_p03_out_$tag")
    },

    // -- the phase-only SELF-CALIBRATION cycle as one benched end-to-end
    //    row (round 12): MS → WSClean predict → phase-screen corruption →
    //    gauss_newton solve on solution intervals → correct_vis →
    //    residual → CORRECTED_DATA member-table sink → read-back. Every
    //    stage is a registered face (p01 predict chain; g01/g06-g10
    //    solver; g02/g03 correct/residual semantics); rows-only check
    //    like p01-p03 — SelfCalPipelineSpec carries the recovery proof
    //    (solved screen matches the injected one up to the per-interval
    //    phase gauge; corrected residual power collapses) and the /tmp MS
    //    is invisible to DuckDB. The timed work includes the sink, the
    //    solver's driver loop, and the read-back.
    Q.noOracle("p04_selfcal_pipeline") { (s, dir) =>
      val (msDir, nMain) = ensureMs(s, dir)
      graft.pipelines.SelfCalPipeline.run(s, msDir, ensureSkyModel(),
        mainRows = Some(nMain))
    })
}
