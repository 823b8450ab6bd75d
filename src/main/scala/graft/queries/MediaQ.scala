package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal plumbing query: documents' text re-encoded as an opaque
  * binary column, run through the batch featurize stub (mapPartitions).
  * The oracle recomputes the stub's byte folding from character codes —
  * verifying the binary schema, batching, and fixed output shape that a
  * real decoder would plug into.
  */
object MediaQ {

  val qs: Seq[Q] = Seq(
    Q("m10_multimodal_stub",
      s"""WITH cp AS (
         |  SELECT doc_id, text,
         |    unnest(generate_series(1, length(text))) AS i
         |  FROM documents)
         |SELECT doc_id, CAST(MAX(i) AS BIGINT) AS n_bytes,
         |  ${(0 until 8).map(b =>
              s"CAST(SUM(CASE WHEN (i-1) % 8 = $b THEN ascii(substr(text, CAST(i AS INT), 1)) ELSE 0 END) AS BIGINT) AS f$b")
              .mkString(",\n  ")}
         |FROM cp GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val bin = Tables.documents(s, dir)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.featurizeStub(bin, "doc_id", "payload", 8)
    })
}
