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

  /** 8-point DFT twiddle tables for m16, by angle index (k·n mod 8):
    * cos ∈ {1, √2/2, 0, −√2/2, −1, …}, sin likewise. Coefficient codes:
    * ±2 = ±1, ±1 = ±√2/2, 0 = drop the term. Every twiddle is either an
    * exact dyadic or sqrt(1/2) — an IEEE-exact value both engines compute
    * bit-identically from the literal, so the whole spectrum stays in
    * CLAUDE.md class (a)/(b): one SHARED expression string evaluated
    * left-associatively by both engines. */
  private val CosCode = Array(2, 1, 0, -1, -2, -1, 0, 1)
  private val SinCode = Array(0, 1, 2, 1, 0, -1, -2, -1)

  private def dftSum(codeOf: Int => Int, k: Int): String = {
    val terms = (0 until 8).flatMap { n =>
      codeOf((k * n) % 8) match {
        case 2  => Some(s"s$n")
        case 1  => Some(s"s$n * sqc")
        case -1 => Some(s"-s$n * sqc")
        case -2 => Some(s"-s$n")
        case _  => None
      }
    }
    terms.mkString(" + ")
  }

  /** (name, expression) pairs for the re/im layer — shared verbatim by the
    * Spark plan and the DuckDB oracle so the float op ORDER is identical. */
  private val reimExprs: Seq[(String, String)] =
    (0 to 4).map(k => s"re$k" -> dftSum(CosCode(_), k)) ++
      (1 to 3).map(k => s"im$k" -> dftSum(SinCode(_), k))

  /** (name, expression) pairs for the power layer (im0 = im4 = 0). */
  private val powerExprs: Seq[(String, String)] =
    Seq("p0" -> "re0 * re0") ++
      (1 to 3).map(k => s"p$k" -> s"re$k * re$k + im$k * im$k") ++
      Seq("p4" -> "re4 * re4")

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
    },

    // -- SPECTRAL features after decode: the m12 clips re-decoded through
    //    the sample-preserving face, framed (8 frames x 8 samples) and
    //    pushed through an 8-point DFT power spectrum — the framed
    //    spectrogram slice an audio-embedding model consumes. The DFT is
    //    DECLARATIVE: re/im are explicit sums with twiddles in
    //    {0, +-1, +-sqrt(1/2)} (IEEE-exact class), and the exact same
    //    expression strings run on both engines so every float op happens
    //    in the same order — the full double-precision spectrum sits on
    //    the hashed surface with no rounding. The oracle restates the
    //    samples from the closed-form synth formula; Spark recovers them
    //    from the real RIFF/WAVE walk.
    Q("m16_audio_spectrum", {
      val sCols = (0 until 8).map(n =>
        s"CAST(((doc_id*31 + (f*8 + $n)*17) % 4096) - 2048 AS DOUBLE) AS s$n")
        .mkString(",\n    ")
      val riCols = reimExprs.map { case (nm, e) => s"$e AS $nm" }
        .mkString(",\n    ")
      val pCols = powerExprs.map { case (nm, e) => s"$e AS $nm" }
        .mkString(",\n  ")
      s"""WITH fr0 AS (
         |  SELECT doc_id, unnest(generate_series(0, 7)) AS f FROM documents),
         |fr AS (
         |  SELECT doc_id, f, sqrt(5e-1) AS sqc,
         |    $sCols
         |  FROM fr0),
         |ri AS (
         |  SELECT doc_id, f,
         |    $riCols
         |  FROM fr)
         |SELECT doc_id, CAST(f AS BIGINT) AS frame,
         |  $pCols
         |FROM ri""".stripMargin
    }) { (s, dir) =>
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
      val dec = Multimodal.decodeWavSamples(synth, "doc_id", "payload")
      val fr = dec
        .select(col("doc_id"), explode(expr("sequence(0, 7)")).as("f"),
          col("samples"))
        .select(Seq(col("doc_id"), col("f"), expr("sqrt(5e-1)").as("sqc")) ++
          (0 until 8).map(n =>
            expr(s"CAST(element_at(samples, f*8 + ${n + 1}) AS DOUBLE)")
              .as(s"s$n")): _*)
      val ri = fr.select(Seq(col("doc_id"), col("f")) ++
        reimExprs.map { case (nm, e) => expr(e).as(nm) }: _*)
      ri.select(Seq(col("doc_id"), col("f").cast("long").as("frame")) ++
        powerExprs.map { case (nm, e) => expr(e).as(nm) }: _*)
    })
}
