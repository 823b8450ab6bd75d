package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.Multimodal

/** The WAV decoder beyond the oracle's canonical 44-byte layout: chunk
  * walking must skip unknown chunks (LIST metadata between fmt and data is
  * legal RIFF), and malformed payloads must throw, not decode garbage.
  */
class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def wav(samples: Array[Short], extraChunk: Boolean): Array[Byte] = {
    val extra = if (extraChunk) 12 else 0
    val bb = java.nio.ByteBuffer.allocate(44 + extra + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
    bb.putInt(36 + extra + samples.length * 2)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)
    bb.putInt(8000); bb.putInt(16000)
    bb.putShort(2); bb.putShort(16)
    if (extraChunk) {
      bb.put("LIST".getBytes("US-ASCII")); bb.putInt(4)
      bb.put("INFO".getBytes("US-ASCII"))
    }
    bb.put("data".getBytes("US-ASCII")); bb.putInt(samples.length * 2)
    samples.foreach(bb.putShort)
    bb.array()
  }

  private def df(payload: Array[Byte]) = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType))))
    spark.createDataset(Seq(Row(1L, payload)))(enc)
  }

  test("decodeWav skips unknown chunks and recovers exact samples") {
    val samples = Array[Short](100, -200, 300, -400, 500, -600, 700, -800)
    for (extra <- Seq(false, true)) {
      val out = Multimodal.decodeWav(df(wav(samples, extra)), "id", "payload",
        nFrames = 4).collect()
      assert(out.length === 1)
      val r = out.head
      assert(r.getLong(1) === 8000L) // sample_rate
      assert(r.getLong(2) === 8L)    // n_samples
      // frames of ceil(8/4)=2: |100|+|200|, |300|+|400|, ...
      assert((3 to 6).map(r.getLong) === Seq(300L, 700L, 1100L, 1500L))
      assert(r.getLong(7) === 800L)  // peak
      assert(r.getDouble(8) === 3600.0 / 8)
    }
  }

  test("decodeWavSamples round-trips exact PCM through the chunk walk") {
    val samples = Array[Short](100, -200, 300, -400, 500, -600, 700, -800)
    for (extra <- Seq(false, true)) {
      val out = Multimodal.decodeWavSamples(df(wav(samples, extra)),
        "id", "payload").collect()
      assert(out.length === 1)
      assert(out.head.getLong(1) === 8000L)
      assert(out.head.getSeq[Long](2) === samples.map(_.toLong).toSeq)
    }
  }

  test("m16 DFT satisfies Parseval: p0 + 2(p1+p2+p3) + p4 = 8*sum(s^2)") {
    // the m16 power columns cover bins 0..4 of the real-input 8-point
    // DFT; conjugate symmetry doubles bins 1..3 in the energy identity.
    // Proves the shared twiddle expressions state a REAL DFT, not just a
    // cross-engine-agreeing formula.
    val q = graft.queries.MediaQ.qs.find(_.name == "m16_audio_spectrum").get
    // run the Spark side against a 1-doc frame and check the identity
    val row = q.fn(spark, TestSpark.sf).filter("doc_id = 7 AND frame = 0")
      .collect().head
    val ps = (2 to 6).map(row.getDouble)
    val energy = ps(0) + 2 * (ps(1) + ps(2) + ps(3)) + ps(4)
    val s = (0 until 8).map(i => (((7L * 31 + i * 17) % 4096) - 2048).toDouble)
    val expected = 8.0 * s.map(v => v * v).sum
    assert(math.abs(energy - expected) / expected < 1e-12)
  }

  test("decodeWav rejects malformed payloads") {
    // not RIFF
    assertThrows[Exception](
      Multimodal.decodeWav(df("nope".getBytes), "id", "payload").collect())
    // stereo (channels = 2) is unsupported
    val stereo = wav(Array[Short](1, 2), extraChunk = false)
    stereo(22) = 2 // numChannels little-endian low byte
    assertThrows[Exception](
      Multimodal.decodeWav(df(stereo), "id", "payload").collect())
    // truncated data chunk: declared size overruns the payload
    val trunc = wav(Array[Short](1, 2, 3, 4), extraChunk = false)
    assertThrows[Exception](
      Multimodal.decodeWav(df(trunc.dropRight(2)), "id", "payload").collect())
  }
}
