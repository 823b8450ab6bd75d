package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SemDedup

/** Two-level (IVF) assignment properties that the e16 oracle can't
  * express: the relation to the FLAT fine argmin it approximates, and
  * the structural guarantees the operator's scale story rests on. */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark; graft.expr.GraftFunctions.register(s); s
  }

  private lazy val corpus = {
    spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .select(col("vec_id").as("cid"),
        expr("qquant(embedding, 1e6)").as("qv"))
      .cache()
  }
  private val NC = 5L
  private val NF = 32L
  private def seeds(n: Long) =
    corpus.filter(col("cid") < n).select(col("cid").as("k"), col("qv"))

  test("two-level ≡ flat fine argmin whenever the flat winner shares the cell; never better") {
    val two = SemDedup.assignTwoLevel(corpus, seeds(NC), seeds(NF))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val flat = SemDedup.assign(corpus, seeds(NF))
      .select(col("cid"), col("k")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fineCell = SemDedup.assign(
      seeds(NF).select(col("k").as("cid"), col("qv")), seeds(NC))
      .select(col("cid"), col("k")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact flat d2 per (row, fine seed) for the never-better check
    val qvs = corpus.select(col("cid"), col("qv")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }; s
    }
    assert(two.size === qvs.size) // no rows dropped (fine ⊇ coarse)
    var agreed = 0
    two.foreach { case (cid, (cell, fine, dTwo)) =>
      assert(fineCell(fine) === cell) // winner really lives in the cell
      val dFlat = d2(qvs(cid), qvs(flat(cid)))
      assert(dTwo >= dFlat) // two-level can never beat the flat argmin
      if (fineCell(flat(cid)) == cell) {
        // the IVF exactness case: flat winner was a candidate → identical
        assert(fine === flat(cid), s"cid=$cid")
        assert(dTwo === dFlat)
        agreed += 1
      }
    }
    assert(agreed > two.size / 4) // the exactness case actually exercised
    assert(agreed < two.size) // ...and so is the approximation case
  }

  test("codegen assign ≡ independent driver brute-force, bit-identical") {
    // A/B for the round-9 rework: the codegen'd nearest_centroid argmin
    // (broadcast one-row LUT, Tungsten end to end) against a from-scratch
    // driver reference implementing the same spec: exact integer L2,
    // ties to the LOWEST centroid id.
    val got = SemDedup.assign(corpus, seeds(NF))
      .select(col("cid"), col("k")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cents = seeds(NF).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).sortBy(_._1)
    val qvs = corpus.select(col("cid"), col("qv")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    assert(got.size === qvs.length)
    qvs.foreach { case (cid, qv) =>
      var bestK = -1L; var bestD = Long.MaxValue
      cents.foreach { case (k, cq) =>
        var d = 0L; var i = 0
        while (i < qv.length) { val t = qv(i) - cq(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; bestK = k }
      }
      assert(got(cid) === bestK, s"cid=$cid")
    }
  }

  test("assign tie rule: duplicate centroid under a higher id never wins") {
    // centroid 0's vector duplicated under id 999 — every row equidistant
    // to both must keep the lower id; in particular row 0 (d2 = 0 twice)
    val dup = seeds(1).union(
      seeds(1).select(lit(999L).as("k"), col("qv")))
    val got = SemDedup.assign(corpus, dup)
      .select(col("cid"), col("k")).collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getLong(1) === 0L))
  }

  test("assign plan stays on Tungsten: no RDD scan, argmin codegen'd") {
    val plan = SemDedup.assign(corpus, seeds(NF))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Scan ExistingRDD"),
      "assign fell back to an RDD round-trip")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("CartesianProduct") || plan.contains("BroadcastExchange"),
      s"one-row LUT should arrive via a broadcast join:\n$plan")
  }

  test("assign fails fast on dimension mismatch") {
    val badSeeds = seeds(2).select(col("k"), slice(col("qv"), 1, 3).as("qv"))
    val e = intercept[Exception] {
      SemDedup.assign(corpus, badSeeds).select(col("k")).collect()
    }
    assert(e.getMessage.contains("dim") ||
      Option(e.getCause).exists(_.getMessage.contains("dim")))
  }

  test("assignChunked ≡ flat assign bit-identically, incl. empty chunks and cross-chunk ties") {
    // the EXACT beyond-broadcast escalation (round-10, the r9 weak): min
    // over per-chunk minima must be the flat argmin under every chunk
    // count, including chunk counts that leave residue classes empty.
    val flat = SemDedup.assign(corpus, seeds(NF))
      .select(col("cid"), col("k")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(2, 3, 7, 64).foreach { b =>
      val got = SemDedup.assignChunked(corpus, seeds(NF), b)
        .select(col("cid"), col("k")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === flat, s"nChunks=$b")
    }
    // cross-chunk tie: centroid 0 duplicated under id 33 — with 2 chunks
    // they land in DIFFERENT residue classes, so the tie is resolved by
    // the cross-chunk least() and must keep the lower id
    val dup = seeds(1).union(
      seeds(1).select(lit(33L).as("k"), col("qv")))
    SemDedup.assignChunked(corpus, dup, 2)
      .select(col("k")).collect()
      .foreach(r => assert(r.getLong(0) === 0L))
  }

  test("assignAuto escalates past the broadcast threshold: chunked plan, flat answer") {
    // flat answer recorded at the default threshold
    val flat = SemDedup.assign(corpus, seeds(NF))
      .select(col("cid"), col("k")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val thr0 = spark.conf.get(key)
    try {
      // NF=32 × dim 64 ⇒ seedBytes = 32·536 = 17 152 > 2 KB ⇒ escalate
      spark.conf.set(key, "2KB")
      assert(SemDedup.seedBytes(NF, 64) > 2048)
      val esc = SemDedup.assignAuto(corpus, seeds(NF))
      val plan = esc.queryExecution.executedPlan.toString
      assert(plan.contains("nearest_min"),
        s"escalation did not engage:\n$plan")
      assert(!plan.contains("nearest_centroid("),
        "escalated plan should not also run the flat argmin")
      val got = esc.select(col("cid"), col("k")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === flat, "escalated ≠ flat — the exactness contract broke")
      // no corpus-proportional single array: every chunk LUT is its own
      // under-threshold broadcast, so no literal in the plan text carries
      // the full 32×64 matrix (the flat LUT would be one 2048-long array)
      assert(!plan.contains("Scan ExistingRDD"))
    } finally spark.conf.set(key, thr0)
  }

  test("assignAuto at the default threshold keeps the flat one-LUT plan") {
    val plan = SemDedup.assignAuto(corpus, seeds(NF))
      .queryExecution.executedPlan.toString
    assert(plan.contains("nearest_centroid("), plan)
    assert(!plan.contains("nearest_min"), plan)
  }

  test("assignAuto edge contracts: disabled threshold sizes vs the 10MB" +
      " default; >64-chunk seed sets fail loudly, never over-broadcast") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val thr0 = spark.conf.get(key)
    try {
      // threshold DISABLED (-1): a small seed set still goes flat (it is
      // under the 10 MB Spark default) — disabling auto-broadcast-join
      // must not change the driver-safety sizing
      spark.conf.set(key, "-1")
      val plan = SemDedup.assignAuto(corpus, seeds(NF))
        .queryExecution.executedPlan.toString
      assert(plan.contains("nearest_centroid("), plan)
      // a seed set that cannot be split into <= 64 under-threshold
      // chunks throws with a pointer at the semantic escalation instead
      // of force-broadcasting any chunk above the threshold
      spark.conf.set(key, "100") // 100 B < one 536-B centroid row
      val e = intercept[IllegalArgumentException] {
        SemDedup.assignAuto(corpus, seeds(NF))
      }
      assert(e.getMessage.contains("assignTwoLevel"), e.getMessage)
    } finally spark.conf.set(key, thr0)
  }

  test("fine seeds self-assign at d2 = 0 and ties go to the lower fine id") {
    val two = SemDedup.assignTwoLevel(corpus, seeds(NC), seeds(NF))
      .filter(col("cid") < NF).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    (0L until NF).foreach { s =>
      val (fine, d) = two(s)
      assert(d === 0L)
      assert(fine <= s) // self unless an identical lower-id seed exists
    }
  }
}
