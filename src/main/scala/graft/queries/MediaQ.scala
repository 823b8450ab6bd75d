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
    },

    // -- a REAL decode: every document carries a synthetic 8x8 binary-PGM
    //    image (valid P5 header + raw pixels, built executor-side); the
    //    decoder must parse the header and recover the exact pixel grid or
    //    the closed-form oracle (which never sees the binary) mismatches.
    //    Quadrant sums are the 2x2 summation resize.
    Q("m11_media_decode",
      """WITH px0 AS (
        |  SELECT doc_id, unnest(generate_series(1, 64)) AS x
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, (x-1) // 8 AS r, (x-1) % 8 AS c,
        |    (doc_id*7 + ((x-1) // 8)*3 + ((x-1) % 8)*5) % 256 AS p
        |  FROM px0)
        |SELECT doc_id,
        |  CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        |  CAST(SUM(p) AS BIGINT) AS pix_sum,
        |  CAST(SUM(CASE WHEN r < 4 AND c < 4 THEN p ELSE 0 END) AS BIGINT) AS q00,
        |  CAST(SUM(CASE WHEN r < 4 AND c >= 4 THEN p ELSE 0 END) AS BIGINT) AS q01,
        |  CAST(SUM(CASE WHEN r >= 4 AND c < 4 THEN p ELSE 0 END) AS BIGINT) AS q10,
        |  CAST(SUM(CASE WHEN r >= 4 AND c >= 4 THEN p ELSE 0 END) AS BIGINT) AS q11,
        |  CAST(SUM(p) AS BIGINT) / 64e0 AS mean_pix
        |FROM px GROUP BY doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("payload", BinaryType))))
      val synth = Tables.documents(s, dir).select(col("doc_id").cast("long"))
        .mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val header = "P5\n8 8\n255\n".getBytes("US-ASCII")
            val px = Array.tabulate(64) { i =>
              ((id * 7 + (i / 8) * 3 + (i % 8) * 5) % 256).toByte
            }
            Row(id, header ++ px)
          }
        }(enc)
      Multimodal.decodePgm(synth, "doc_id", "payload")
    })
}
