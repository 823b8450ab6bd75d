package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Opaque media travel as `binary` columns with typed metadata; decoding /
  * feature extraction runs batch-wise inside `mapPartitions` so a real
  * codec drops in without touching the plan (one partition = one decode
  * batch; the schema contract below is what a JNI/Arrow decoder would
  * fill). The decode itself is a DETERMINISTIC STUB — this environment has
  * no image/audio libraries — that folds unsigned byte values into a
  * fixed-width feature vector; everything around it (binary schema,
  * partition batching, fixed output shape) is the real pipeline.
  */
object Multimodal {

  /** REAL raster decode — binary PGM (P5): ASCII header
    * `P5 <width> <height> <maxval>` + raw 8-bit pixels. Pure-JVM parser
    * (the format needs no codec library), batch-wise in mapPartitions:
    * exactly where a JNI/Arrow JPEG/PNG decoder would slot in, but with
    * the decode actually happening. Output per image: dimensions, integer
    * pixel sum, the four quadrant sums (a 2×2 "resize" by summation), and
    * the mean. Malformed payloads throw — a decode error is data
    * corruption, not a row to drop silently. */
  def decodePgm(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType), StructField("width", LongType),
      StructField("height", LongType), StructField("pix_sum", LongType),
      StructField("q00", LongType), StructField("q01", LongType),
      StructField("q10", LongType), StructField("q11", LongType),
      StructField("mean_pix", DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          // tokenize the ASCII header: magic, width, height, maxval
          var pos = 0
          def token(): String = {
            while (pos < bytes.length && bytes(pos).toChar.isWhitespace) pos += 1
            val start = pos
            while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) pos += 1
            new String(bytes, start, pos - start, "US-ASCII")
          }
          require(token() == "P5", s"not a P5 PGM payload (id $id)")
          val w = token().toInt
          val h = token().toInt
          val maxval = token().toInt
          require(maxval >= 1 && maxval <= 255,
            s"unsupported maxval $maxval (id $id)")
          pos += 1 // single whitespace after maxval
          require(bytes.length - pos == w * h,
            s"payload length ${bytes.length - pos} != $w x $h (id $id)")
          var sum = 0L
          val q = new Array[Long](4)
          var i = 0
          while (i < w * h) {
            val p = (bytes(pos + i) & 0xff).toLong
            sum += p
            q(((i / w) * 2 / h) * 2 + (i % w) * 2 / w) += p
            i += 1
          }
          Row(id, w.toLong, h.toLong, sum, q(0), q(1), q(2), q(3),
            sum.toDouble / (w * h))
        }
      }(enc)
  }

  /** Intensity histogram over a decoded P5 PGM payload — the
    * feature-extraction step after decode: pixel counts per quartile bin
    * (0-63, 64-127, 128-191, 192-255) plus the dominant bin (ties to
    * the lower index). Same mapPartitions batch shape as [[decodePgm]];
    * a production codec slots into the same loop. */
  def pgmHistogram(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType), StructField("h0", LongType),
      StructField("h1", LongType), StructField("h2", LongType),
      StructField("h3", LongType), StructField("dominant", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          var pos = 0
          def token(): String = {
            while (pos < bytes.length && bytes(pos).toChar.isWhitespace) pos += 1
            val start = pos
            while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) pos += 1
            new String(bytes, start, pos - start, "US-ASCII")
          }
          require(token() == "P5", s"not a P5 PGM payload (id $id)")
          val w = token().toInt
          val h = token().toInt
          token() // maxval
          pos += 1
          val hist = new Array[Long](4)
          var i = 0
          while (i < w * h) {
            hist((bytes(pos + i) & 0xff) >> 6) += 1
            i += 1
          }
          var dom = 0
          var j = 1
          while (j < 4) { if (hist(j) > hist(dom)) dom = j; j += 1 }
          Row(id, hist(0), hist(1), hist(2), hist(3), dom.toLong)
        }
      }(enc)
  }

  /** RIFF/WAVE PCM s16le mono chunk walk shared by the decode faces:
    * 12-byte RIFF header, then tagged chunks; `fmt ` fixes the sample
    * format, `data` carries little-endian 16-bit samples; unknown chunks
    * are skipped by size (the spec allows e.g. LIST metadata between
    * them). Malformed payloads throw. */
  private def parseWav(bytes: Array[Byte], id: Long): (Long, Array[Short]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
    }
    require(fourcc() == "RIFF", s"not a RIFF payload (id $id)")
    bb.getInt // container size; payload length is the authority below
    require(fourcc() == "WAVE", s"not a WAVE container (id $id)")
    var rate = -1L
    var samples: Array[Short] = null
    while (bb.remaining >= 8) {
      val cid = fourcc()
      val sz = bb.getInt
      require(sz >= 0 && sz <= bb.remaining,
        s"chunk '$cid' size $sz overruns payload (id $id)")
      cid match {
        case "fmt " =>
          require(sz >= 16, s"fmt chunk too short (id $id)")
          val fmt = bb.getShort; val ch = bb.getShort
          rate = bb.getInt.toLong
          bb.getInt; bb.getShort // byte rate, block align: derived
          val bits = bb.getShort
          require(fmt == 1 && ch == 1 && bits == 16,
            s"only PCM s16 mono supported (id $id)")
          bb.position(bb.position() + (sz - 16))
        case "data" =>
          require(sz % 2 == 0, s"odd data chunk size (id $id)")
          samples = new Array[Short](sz / 2)
          var k = 0
          while (k < samples.length) { samples(k) = bb.getShort; k += 1 }
        case _ => bb.position(bb.position() + sz)
      }
    }
    require(rate > 0 && samples != null && samples.length > 0,
      s"missing fmt/data chunk (id $id)")
    (rate, samples)
  }

  /** REAL audio decode — the feature face over [[parseWav]]. Same
    * placement contract as decodePgm: batch-wise mapPartitions where an
    * mp3/flac codec would slot in. Output per clip: sample rate, sample
    * count, per-frame absolute energies (nFrames fixed frames of
    * ceil(n/nFrames) samples — the frame-sample feature a downstream
    * model consumes), the peak amplitude, and the mean absolute
    * amplitude. */
  def decodeWav(df: DataFrame, idCol: String, binCol: String,
                nFrames: Int = 4): DataFrame = {
    val schema = StructType(
      Seq(StructField(idCol, LongType), StructField("sample_rate", LongType),
        StructField("n_samples", LongType)) ++
      (0 until nFrames).map(i => StructField(s"e$i", LongType)) ++
      Seq(StructField("peak", LongType), StructField("mean_abs", DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (rate, samples) = parseWav(r.getAs[Array[Byte]](1), id)
          val n = samples.length
          val flen = (n + nFrames - 1) / nFrames
          val e = new Array[Long](nFrames)
          var peak = 0L
          var tot = 0L
          var i = 0
          while (i < n) {
            val a = math.abs(samples(i).toLong)
            e(i / flen) += a
            tot += a
            if (a > peak) peak = a
            i += 1
          }
          Row.fromSeq((id +: rate +: n.toLong +: e.toSeq) ++
            Seq[Any](peak, tot.toDouble / n))
        }
      }(enc)
  }

  /** REAL audio decode, sample-preserving face — the same [[parseWav]]
    * walk, but the recovered PCM comes back as an `array<long>` column so
    * downstream DSP (framing, windowed transforms, spectral features)
    * runs DECLARATIVELY in the engine instead of inside the codec stub.
    * Output: (idCol, sample_rate: long, samples: array<long>). */
  def decodeWavSamples(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType), StructField("sample_rate", LongType),
      StructField("samples", ArrayType(LongType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (rate, samples) = parseWav(r.getAs[Array[Byte]](1), id)
          Row(id, rate, samples.map(_.toLong).toSeq)
        }
      }(enc)
  }

  /** df must have (idCol: long, binCol: binary). Output: (idCol,
    * n_bytes: long, f0..f{nFeat-1}: long) — byte i contributes to feature
    * i mod nFeat. */
  def featurizeStub(df: DataFrame, idCol: String, binCol: String,
                    nFeat: Int = 8): DataFrame = {
    val schema = StructType(
      StructField(idCol, LongType) +:
        StructField("n_bytes", LongType) +:
        (0 until nFeat).map(b => StructField(s"f$b", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val feats = new Array[Long](nFeat)
          var i = 0
          while (i < bytes.length) {
            feats(i % nFeat) += bytes(i) & 0xff
            i += 1
          }
          Row.fromSeq(id +: bytes.length.toLong +: feats.toSeq)
        }
      }(enc)
  }

  /** Video FRAME SAMPLING — every `stride`-th frame of a raw grayscale
    * clip ("GV\n<nFrames> <w> <h>\n" ASCII header, then nFrames
    * contiguous w×h frames). One input row fans out to one output row
    * per SAMPLED frame (flat map — the batch shape a real video codec's
    * keyframe extractor plugs into); unsampled frames are skipped by
    * offset arithmetic, never materialized. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   stride: Int = 4): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType), StructField("frame", LongType),
      StructField("pix_sum", LongType), StructField("mean_pix", DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          var pos = 0
          def token(): String = {
            while (pos < bytes.length && bytes(pos).toChar.isWhitespace) pos += 1
            val start = pos
            while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) pos += 1
            new String(bytes, start, pos - start, "US-ASCII")
          }
          require(token() == "GV", s"not a GV clip payload (id $id)")
          val nFrames = token().toInt
          val w = token().toInt
          val h = token().toInt
          pos += 1 // single newline after header
          require(bytes.length - pos == nFrames * w * h,
            s"payload length ${bytes.length - pos} != $nFrames x $w x $h (id $id)")
          (0 until nFrames by stride).map { f =>
            val base = pos + f * w * h
            var sum = 0L
            var i = 0
            while (i < w * h) { sum += bytes(base + i) & 0xff; i += 1 }
            Row(id, f.toLong, sum, sum.toDouble / (w * h))
          }
        }
      }(enc)
  }

  /** Nearest-neighbour RESIZE after decode — P5 PGM downsampled by
    * integer `factor` (source pixel (r·factor, c·factor) survives).
    * Output: one row per RESIZED image row with its pixel sum and mean —
    * the (id, row) fan-out a downstream patch embedder consumes. Same
    * mapPartitions placement contract as [[decodePgm]]. */
  def resizePgm(df: DataFrame, idCol: String, binCol: String,
                factor: Int = 2): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType), StructField("r", LongType),
      StructField("row_sum", LongType), StructField("row_mean", DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          var pos = 0
          def token(): String = {
            while (pos < bytes.length && bytes(pos).toChar.isWhitespace) pos += 1
            val start = pos
            while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) pos += 1
            new String(bytes, start, pos - start, "US-ASCII")
          }
          require(token() == "P5", s"not a P5 PGM payload (id $id)")
          val w = token().toInt
          val h = token().toInt
          token() // maxval
          pos += 1
          val (ow, oh) = (w / factor, h / factor)
          (0 until oh).map { or =>
            var sum = 0L
            var oc = 0
            while (oc < ow) {
              sum += bytes(pos + (or * factor) * w + oc * factor) & 0xff
              oc += 1
            }
            Row(id, or.toLong, sum, sum.toDouble / ow)
          }
        }
      }(enc)
  }
}
