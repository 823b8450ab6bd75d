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
