package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** e18's hashed surface counts |btop3 ∩ candidate-set| — the coverage
  * formulation. This spec asserts the theorem that makes it THE recall:
  * a brute-top3 element inside an IVF candidate set always lands in that
  * method's ranked top-3 (everything outranking it has globally higher
  * cosine, i.e. is itself brute-top3, and the (cosine DESC, cid) tie
  * order is shared), so coverage == |btop3 ∩ method-top3| exactly — and
  * that probing a superset of cells can only help (hits2 ≥ hits1). */
class RecallTheoremSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("candidate coverage equals ranked top-3 intersection; nprobe=2 never hurts") {
    val s = spark
    val dir = TestSpark.sf
    def pairs(name: String, topk: Int): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(s, dir).filter(col("rank") <= topk)
        .select(col("qid"), col("cid")).collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val btop = pairs("e01_knn_bruteforce", 3)
    val ivf1 = pairs("e04_ivf_ann", 3)
    val ivf2 = pairs("e17_ivf_nprobe", 3)
    val e18 = SparkEntry.queries("e18_ivf_recall")(s, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(e18.keySet === btop.keySet)
    e18.foreach { case (qid, (h1, h2)) =>
      assert(h1 === (btop(qid) & ivf1(qid)).size.toLong, s"qid=$qid hits1")
      assert(h2 === (btop(qid) & ivf2(qid)).size.toLong, s"qid=$qid hits2")
      assert(h2 >= h1, s"qid=$qid: wider probe lost recall")
    }
  }
}
