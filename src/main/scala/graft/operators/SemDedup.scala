package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SemDeDup — semantic deduplication by cluster-then-prune (Abbas et al.
  * 2023, "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication"). Embeddings are assigned to their nearest centroid and
  * near-duplicate pairs are searched ONLY within a cluster, so the
  * quadratic pair blowup is bounded by the cluster size: with the cluster
  * count k grown in proportion to the corpus (n/k bounded), total pair
  * volume stays linear in n. ScaleProbe measures exactly that contract.
  *
  * Determinism contract (the t10/e05 idioms): vectors are 1e-6-quantized
  * integer arrays, distances and dots are exact integer sums, the cosine
  * is one sqrt/division chain of exact integers — bit-identical
  * cross-engine — and assignment ties go to the lower centroid id.
  *
  * Scale shape: assignment is a ZERO-shuffle projection against literal
  * centroids (model-sized — the e05 centroids-on-driver idiom); the pair
  * search is ONE cluster-keyed shuffle of two linear relations.
  */
object SemDedup {

  /** Nearest-centroid assignment by exact integer L2 against literal
    * centroids; ties to the lower k. Input must carry (cid, qv);
    * all other columns are preserved. */
  def assign(corpus: DataFrame, seeds: Seq[(Long, Seq[Long])]): DataFrame = {
    // literal-array ql2 rides whole-stage codegen; the typedLit zip_with
    // form would evaluate interpreted per (vector, centroid)
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    val cands = seeds.map { case (k, v) =>
      val d2 = expr(s"ql2(qv, array(${v.map(_ + "L").mkString(",")}))")
      struct(d2.as("d2"), lit(k).as("k"))
    }
    corpus.withColumn("k", least(cands: _*).getField("k"))
  }

  /** Per-vector prune verdicts: a vector is pruned iff some lower-id
    * member of its cluster sits at cosine ≥ tau (the one-pass greedy
    * keep-lowest rule — deterministic, no iteration). Input must carry
    * (cid, qv, n2). Output: (cid, cluster, n_near, pruned, max_cos). */
  def prune(corpus: DataFrame, seeds: Seq[(Long, Seq[Long])],
            tau: Column): DataFrame = {
    // the pair scan is the quadratic-per-cluster hot path — the codegen'd
    // qdot keeps it out of interpreted higher-order-function eval
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    val cell = assign(corpus, seeds)
    val a = cell.select(col("k"), col("cid").as("cid_a"),
      col("qv").as("qv_a"), col("n2").as("n2_a"))
    val b = cell.select(col("k"), col("cid").as("cid_b"),
      col("qv").as("qv_b"), col("n2").as("n2_b"))
    val dotAb = expr("qdot(qv_a, qv_b)")
    val cos = a.join(b, "k").filter(col("cid_a") < col("cid_b"))
      .select(col("cid_b").as("cid"),
        (dotAb.cast("double") /
          (sqrt(col("n2_a").cast("double")) * sqrt(col("n2_b").cast("double"))))
          .as("cosine"))
    val ver = cos.groupBy("cid")
      .agg(sum(when(col("cosine") >= tau, 1L).otherwise(0L)).as("nn"),
        max(col("cosine")).as("mc"))
    cell.select(col("cid"), col("k").as("cluster"))
      .join(ver, Seq("cid"), "left")
      .select(col("cid"), col("cluster"),
        coalesce(col("nn"), lit(0L)).as("n_near"),
        (coalesce(col("nn"), lit(0L)) > 0).as("pruned"),
        col("mc").as("max_cos"))
  }

  /** Collect (cid, qv) rows as seed centroids — model-sized (n × dim
    * longs), the e05 centroids-on-driver idiom. The caller bounds the
    * seed set; this is never a data-sized collect. */
  def collectSeeds(seedRows: DataFrame): Seq[(Long, Seq[Long])] =
    seedRows.select("cid", "qv").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq.sortBy(_._1)

  /** The first n vectors (by cid) as seeds. */
  def seedsOf(corpus: DataFrame, n: Long): Seq[(Long, Seq[Long])] =
    collectSeeds(corpus.filter(col("cid") < n))
}
