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
}
