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
    },

    // -- feature extraction AFTER decode: intensity histogram per image
    //    (quartile bins + dominant bin, ties to the lower index). Same
    //    synthetic P5 payloads as m11; the oracle restates the bucket
    //    counts from the closed-form pixel values.
    Q("m13_image_histogram",
      """WITH px0 AS (
        |  SELECT doc_id, unnest(generate_series(1, 64)) AS x
        |  FROM documents),
        |px AS (
        |  SELECT doc_id,
        |    ((doc_id*7 + ((x-1) // 8)*3 + ((x-1) % 8)*5) % 256) // 64 AS b
        |  FROM px0),
        |hist AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS h0,
        |    CAST(SUM(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
        |    CAST(SUM(CASE WHEN b = 2 THEN 1 ELSE 0 END) AS BIGINT) AS h2,
        |    CAST(SUM(CASE WHEN b = 3 THEN 1 ELSE 0 END) AS BIGINT) AS h3
        |  FROM px GROUP BY doc_id)
        |SELECT doc_id, h0, h1, h2, h3,
        |  CAST(CASE
        |    WHEN h0 >= h1 AND h0 >= h2 AND h0 >= h3 THEN 0
        |    WHEN h1 >= h2 AND h1 >= h3 THEN 1
        |    WHEN h2 >= h3 THEN 2 ELSE 3 END AS BIGINT) AS dominant
        |FROM hist""".stripMargin) { (s, dir) =>
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
      Multimodal.pgmHistogram(synth, "doc_id", "payload")
    },

    // -- a REAL audio decode: every document carries a synthetic RIFF/WAVE
    //    PCM s16le mono clip (valid 44-byte header + 64 samples, built
    //    executor-side); the decoder must walk the chunk structure and
    //    recover the exact sample values or the closed-form oracle (which
    //    never sees the binary) mismatches. Frame energies are the
    //    4-frame-sample feature extraction.
    Q("m12_audio_decode",
      """WITH sm0 AS (
        |  SELECT doc_id, unnest(generate_series(1, 64)) AS x
        |  FROM documents),
        |sm AS (
        |  SELECT doc_id, (x-1) // 16 AS f,
        |    ((doc_id*31 + (x-1)*17) % 4096) - 2048 AS s
        |  FROM sm0)
        |SELECT doc_id,
        |  CAST(8000 AS BIGINT) AS sample_rate, CAST(64 AS BIGINT) AS n_samples,
        |  CAST(SUM(CASE WHEN f = 0 THEN ABS(s) ELSE 0 END) AS BIGINT) AS e0,
        |  CAST(SUM(CASE WHEN f = 1 THEN ABS(s) ELSE 0 END) AS BIGINT) AS e1,
        |  CAST(SUM(CASE WHEN f = 2 THEN ABS(s) ELSE 0 END) AS BIGINT) AS e2,
        |  CAST(SUM(CASE WHEN f = 3 THEN ABS(s) ELSE 0 END) AS BIGINT) AS e3,
        |  CAST(MAX(ABS(s)) AS BIGINT) AS peak,
        |  CAST(SUM(ABS(s)) AS BIGINT) / 64e0 AS mean_abs
        |FROM sm GROUP BY doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("payload", BinaryType))))
      val synth = Tables.documents(s, dir).select(col("doc_id").cast("long"))
        .mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val n = 64
            val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + n * 2)
            bb.put("WAVE".getBytes("US-ASCII"))
            bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
            bb.putShort(1); bb.putShort(1)          // PCM, mono
            bb.putInt(8000); bb.putInt(16000)       // rate, byte rate
            bb.putShort(2); bb.putShort(16)         // block align, bits
            bb.put("data".getBytes("US-ASCII")); bb.putInt(n * 2)
            var i = 0
            while (i < n) {
              bb.putShort((((id * 31 + i * 17) % 4096) - 2048).toShort)
              i += 1
            }
            Row(id, bb.array())
          }
        }(enc)
      Multimodal.decodeWav(synth, "doc_id", "payload")
    },

    // -- video FRAME SAMPLING: every document carries a synthetic 16-frame
    //    8x8 grayscale clip (ASCII GV header + raw frames, built
    //    executor-side); the operator parses the header, skips unsampled
    //    frames by offset arithmetic, and emits every 4th frame's
    //    features. The oracle restates the sampled frames from the
    //    closed-form pixel values — it never sees the binary.
    Q("m14_frame_sample",
      """WITH fr AS (
        |  SELECT doc_id, unnest(generate_series(0, 3)) AS s FROM documents),
        |px AS (
        |  SELECT doc_id, s * 4 AS f, unnest(generate_series(0, 63)) AS x
        |  FROM fr),
        |v AS (
        |  SELECT doc_id, f,
        |    (doc_id * 11 + f * 13 + (x // 8) * 3 + (x % 8) * 5) % 256 AS p
        |  FROM px)
        |SELECT doc_id, CAST(f AS BIGINT) AS frame,
        |  CAST(SUM(p) AS BIGINT) AS pix_sum,
        |  CAST(SUM(p) AS BIGINT) / 64e0 AS mean_pix
        |FROM v GROUP BY doc_id, f""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("payload", BinaryType))))
      val synth = Tables.documents(s, dir).select(col("doc_id").cast("long"))
        .mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val header = "GV\n16 8 8\n".getBytes("US-ASCII")
            val px = Array.tabulate(16 * 64) { i =>
              val f = i / 64; val j = i % 64
              ((id * 11 + f * 13 + (j / 8) * 3 + (j % 8) * 5) % 256).toByte
            }
            Row(id, header ++ px)
          }
        }(enc)
      Multimodal.sampleFrames(synth, "doc_id", "payload", stride = 4)
    },

    // -- RESIZE after decode: the same synthetic P5 payloads as m11,
    //    nearest-neighbour downsampled 8x8 -> 4x4 (source pixel (2r, 2c)
    //    survives); one output row per resized row — the patch fan-out a
    //    downstream embedder consumes.
    Q("m15_image_resize",
      """WITH rr AS (
        |  SELECT doc_id, unnest(generate_series(0, 3)) AS r FROM documents),
        |cc AS (
        |  SELECT doc_id, r, unnest(generate_series(0, 3)) AS c FROM rr),
        |v AS (
        |  SELECT doc_id, r,
        |    (doc_id * 7 + (r * 2) * 3 + (c * 2) * 5) % 256 AS p
        |  FROM cc)
        |SELECT doc_id, CAST(r AS BIGINT) AS r,
        |  CAST(SUM(p) AS BIGINT) AS row_sum,
        |  CAST(SUM(p) AS BIGINT) / 4e0 AS row_mean
        |FROM v GROUP BY doc_id, r""".stripMargin) { (s, dir) =>
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
      Multimodal.resizePgm(synth, "doc_id", "payload", factor = 2)
    })
}
