package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipelines.CurationPipeline
import graft.pipelines.CurationPipeline.Config

/** The p03 contract: every curation stage must agree with the oracle-gated
  * registry face whose semantics it composes (t03/t32/t01/t07/t29/t25),
  * and the two collapse stages additionally against independent plain-Scala
  * transcriptions (greedy SemDeDup replay, per-group minima). The registry
  * row itself is rows-only checked (p01/p02 class), so THIS suite is its
  * correctness gate. */
class CurationPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def docs = graft.core.Tables.documents(spark, TestSpark.sf)
  private def emb = graft.core.Tables.embeddings(spark, TestSpark.sf)
  private val cfg = Config()

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  // stage frames, built once per suite run; s4 mirrors curate() (which
  // skips exactDedup — the subsumption test below proves that legal)
  private lazy val s1 = CurationPipeline.languageGate(docs)
  private lazy val s2 = CurationPipeline.gopherGate(s1)
  private lazy val s3 = CurationPipeline.exactDedup(s2)
  private lazy val s4 = CurationPipeline.nearDupCollapse(s2)
  private lazy val s5 = CurationPipeline.semanticPrune(s4, emb, cfg)

  test("stage 1 (language gate) keeps exactly the t03 face's hits") {
    val t03 = SparkEntry.queries("t03_language_id")(spark, TestSpark.sf)
    val nonEmpty = ids(docs.filter(length(col("text")) > 0))
    val expect = ids(t03.filter(col("lang_pred") === col("lang")))
      .intersect(nonEmpty)
    assert(ids(s1) === expect)
    assert(expect.nonEmpty, "degenerate fixture: language gate kept nothing")
  }

  test("stage 2 (Gopher gate) keeps exactly the t32 face's keep set and " +
      "carries its n_tok") {
    val t32 = SparkEntry.queries("t32_gopher_rules")(spark, TestSpark.sf)
    val expect = t32.filter(col("keep")).select("doc_id", "n_tok").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val in = ids(s1)
    val got = s2.select("doc_id", "n_tok").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === expect.keySet.intersect(in))
    got.foreach { case (id, n) => assert(n === expect(id), s"n_tok of $id") }
    assert(got.nonEmpty, "degenerate fixture: Gopher gate kept nothing")
  }

  test("stage 3 (exact dedup) keeps the lowest doc_id per text") {
    val in = s2.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expect = in.groupBy(_._2).values.map(_.map(_._1).min).toSet
    assert(ids(s3) === expect)
  }

  test("stage 3 drops duplicate texts on a corpus that has them " +
      "(the fixture has none)") {
    import spark.implicits._
    val d = Seq((0L, "a b"), (1L, "a b"), (2L, "c"), (7L, "c"), (3L, "a b"))
      .toDF("doc_id", "text")
    assert(ids(CurationPipeline.exactDedup(d)) === Set(0L, 2L))
  }

  test("stage 4 (near-dup collapse) keeps the lowest doc_id per FULL t07 " +
      "signature") {
    val t07 = SparkEntry.queries("t07_minhash_signatures")(spark, TestSpark.sf)
    val in = ids(s2)
    val expect = t07.collect()
      .map(r => (r.getLong(0),
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4))))
      .filter(x => in.contains(x._1))
      .groupBy(_._2).values.map(_.map(_._1).min).toSet
    assert(ids(s4) === expect)
    assert(expect.size < in.size,
      "degenerate fixture: near-dup collapse dropped nothing")
  }

  test("the signature collapse subsumes exact dedup: collapsing with and " +
      "without the exact stage yields the same survivors") {
    assert(ids(CurationPipeline.nearDupCollapse(s3)) === ids(s4))
  }

  test("stage 5 (SemDeDup) matches an independent greedy transcription") {
    val in = ids(s4)
    // independent replay: quantize (BigDecimal HALF_UP, the qquant rule),
    // seeds = k lowest surviving vector ids, nearest-seed by integer L2
    // (ties to the lower seed), prune b iff a lower-id cluster member sits
    // at cosine >= tau
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .filter(x => in.contains(x._1))
      .map { case (id, v) =>
        id -> v.map(x => java.math.BigDecimal.valueOf(x.toDouble * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong)
      }.sortBy(_._1)
    val k = math.max(cfg.minSeeds, emb.count() / cfg.clusterDiv).toInt
    val seeds = vecs.take(k)
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val cluster = vecs.map { case (id, v) =>
      id -> seeds.minBy { case (sid, sv) => (l2(v, sv), sid) }._1
    }.toMap
    val byId = vecs.toMap
    val prunedExpect = vecs.map(_._1).filter { b =>
      vecs.map(_._1).exists { a =>
        a < b && cluster(a) == cluster(b) && {
          val c = dot(byId(a), byId(b)).toDouble /
            (math.sqrt(dot(byId(a), byId(a)).toDouble) *
              math.sqrt(dot(byId(b), byId(b)).toDouble))
          c >= cfg.cosTau
        }
      }
    }.toSet
    // the sf0.001 survivors are near-dup FAMILY representatives, already
    // semantically spread (max within-cluster cosine 0.27 < tau) — the
    // stage prunes nothing here and one doc at sf0.1; the synthetic test
    // below proves the prune actually fires
    info(s"fixture SemDeDup pruned ${prunedExpect.size} of ${vecs.length}")
    assert(ids(s5) === in -- prunedExpect)
  }

  test("stage 5 prunes greedily by ANY lower-id cluster member, including " +
      "an already-pruned one (synthetic chain)") {
    import spark.implicits._
    val dim = 16
    def v(parts: (Int, Double)*): Array[Float] = {
      val a = new Array[Float](dim)
      parts.foreach { case (i, x) => a(i) = x.toFloat }
      a
    }
    val rad = math.Pi / 180.0
    // seeds 0..7 (the minSeeds floor): seed 0 = e0, seeds 1..7 on far dims
    val seeds = (0L, v(0 -> 1.0)) +:
      (1 to 7).map(j => (j.toLong, v((j + 8) -> 1.0)))
    // all three non-seeds land in seed 0's cluster (positive e0 dot, zero
    // dot with every far-dim seed):
    //   8 at 55 deg from e0 -> cos(0,8) = 0.574 >= 0.45: pruned by seed 0
    //   9 at 85 deg         -> cos(0,9) = 0.087 < 0.45, but
    //                          cos(8,9) = cos(30 deg) = 0.866: pruned by
    //                          the ALREADY-PRUNED 8 (the one-pass rule)
    //   10 in the e0-e2 plane at 80 deg -> cos to 0/8/9 all < 0.45: kept
    val extras = Seq(
      (8L, v(0 -> math.cos(55 * rad), 1 -> math.sin(55 * rad))),
      (9L, v(0 -> math.cos(85 * rad), 1 -> math.sin(85 * rad))),
      (10L, v(0 -> math.cos(80 * rad), 2 -> math.sin(80 * rad))))
    val embDf = (seeds ++ extras).toDF("vec_id", "embedding")
    // doc 11 has no vector: semantic pruning must pass it through
    val docsDf = (0L to 11L).toDF("doc_id")
    val out = ids(CurationPipeline.semanticPrune(docsDf, embDf, cfg))
    assert(out === ((0L to 11L).toSet -- Set(8L, 9L)))
  }

  test("stage 6 (packing) replays exactly per (source, shard)") {
    val out = CurationPipeline.pack(s5, cfg)
    val rows = out.select("doc_id", "source", "shard", "n_tok",
      "pack_id", "pack_offset", "n_chunks").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.groupBy(r => (r._2, r._3)).foreach { case (_, grp) =>
      var cum = 0L
      grp.sortBy(_._1).foreach {
        case (id, _, _, nTok, packId, off, nChunks) =>
          assert(packId === cum / cfg.packLen, s"pack_id of $id")
          assert(off === cum % cfg.packLen, s"pack_offset of $id")
          assert(nChunks ===
            (cum + nTok - 1) / cfg.packLen - cum / cfg.packLen + 1,
            s"n_chunks of $id")
          cum += nTok
      }
    }
    rows.foreach { r =>
      assert(r._6 >= 0 && r._6 < cfg.packLen, s"offset range of ${r._1}")
      assert(r._7 >= 1, s"chunk count of ${r._1}")
    }
  }

  test("p03 registry row: sink round-trip is lossless, deterministic, and " +
      "the funnel is monotone and non-degenerate") {
    val cols = Seq("doc_id", "source", "lang", "text", "n_tok", "shard",
      "pack_id", "pack_offset", "n_chunks")
    def key(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(cols.map(col): _*).collect()
        .map(_.toSeq.mkString("")).sorted.toSeq
    val direct = key(CurationPipeline.curate(docs, emb, cfg))
    val run1 = key(SparkEntry.queries("p03_curation_pipeline")(
      spark, TestSpark.sf))
    val run2 = key(SparkEntry.queries("p03_curation_pipeline")(
      spark, TestSpark.sf))
    assert(run1 === direct, "sink round-trip changed the curated shard")
    assert(run2 === run1, "p03 is not deterministic across runs")
    val counts = Seq(docs.count(), s1.count(), s2.count(), s3.count(),
      s4.count(), s5.count())
    info(s"funnel: ${counts.mkString(" -> ")}")
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"funnel not monotone: $counts")
    assert(counts.last > 0 && run1.nonEmpty)
  }
}
