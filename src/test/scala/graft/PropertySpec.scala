package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SchkTest}

/** Property-based checks (ScalaCheck driven directly, no bridge artifact)
  * for the pure-JVM kernels whose contracts hold for ALL inputs, not just
  * the fixture corpus: codec round-trips, shingle definitions, aggregate
  * buffer algebra, and the winnowing guarantee.
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

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

  test("WAV synth -> parse is the identity for arbitrary PCM payloads") {
    val gen = for {
      n <- Gen.choose(1, 512)
      s <- Gen.listOfN(n, Gen.choose(Short.MinValue, Short.MaxValue))
      extra <- Gen.oneOf(true, false)
    } yield (s.map(_.toShort).toArray, extra)
    check("wav-roundtrip", Prop.forAll(gen) { case (samples, extra) =>
      // parseWav is private; the public sample-preserving face runs it
      val dec = decodeOne(wav(samples, extra))
      dec._1 == 8000L && dec._2.sameElements(samples.map(_.toLong))
    })
  }

  private def decodeOne(bytes: Array[Byte]): (Long, Array[Long]) = {
    // drive the decoder through its DataFrame face on a 1-row frame
    val spark = TestSpark.spark
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType))))
    val df = spark.createDataset(Seq(Row(1L, bytes)))(enc)
    val r = graft.operators.Multimodal
      .decodeWavSamples(df, "id", "payload").collect().head
    (r.getLong(1), r.getSeq[Long](2).toArray)
  }

  test("char/word gram expressions equal the sliding-window definition") {
    val asciiWord = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    check("char-grams", Prop.forAll(
      Gen.listOf(Gen.alphaNumChar).map(_.mkString), Gen.choose(1, 8)) { (s, k) =>
      val got = graft.expr.CharGrams.compute(s, k)
        .toArray[AnyRef](org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      val want = if (s.length < k) Seq.empty
        else (0 to s.length - k).map(i => s.substring(i, i + k))
      got == want
    })
    check("word-grams", Prop.forAll(
      Gen.listOf(asciiWord), Gen.choose(1, 5)) { (ws, k) =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        ws.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])
      val got = graft.expr.WordGrams.compute(arr, k)
        .toArray[AnyRef](org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      val want = if (ws.length < k) Seq.empty
        else ws.sliding(k).map(_.mkString(" ")).toSeq
      got == want
    })
  }

  test("scatter_moments buffer algebra: any merge grouping equals one pass") {
    val vec = Gen.listOfN(4, Gen.choose(-1000L, 1000L))
    check("scatter-merge", Prop.forAll(
      Gen.nonEmptyListOf(vec), Gen.choose(1, 5)) { (vecs, parts) =>
      val agg = graft.expr.ScatterMoments(null)
      def run(vs: Seq[Seq[Long]]): Array[Long] =
        vs.foldLeft(agg.createAggregationBuffer()) { (b, v) =>
          // exercise update through the same arithmetic as the expression
          val d = v.length
          val nb = if (b.nonEmpty) b else {
            val x = new Array[Long](2 + d + d * d); x(0) = d; x
          }
          nb(1) += 1
          for (i <- 0 until d) {
            nb(2 + i) += v(i)
            for (j <- 0 until d) nb(2 + d + i * d + j) += v(i) * v(j)
          }
          nb
        }
      val whole = run(vecs)
      val grouped = vecs.grouped(math.max(1, vecs.length / parts)).toSeq
        .map(run).reduce(agg.merge)
      whole.sameElements(grouped)
    })
  }

  test("winnowing guarantee: consecutive selected positions within w of each other") {
    val asciiText = Gen.listOf(Gen.choose(' ', '~')).map(_.mkString)
    check("winnow-gap", Prop.forAll(asciiText) { s =>
      val sel = graft.expr.WinnowFps.compute(s)
      val n = sel.numElements()
      val pos = (0 until n).map(i => sel.getStruct(i, 2).getLong(0))
      // positions strictly increase and neighbouring gaps stay <= w = 4,
      // the property that guarantees shared substrings >= 8 chars collide
      pos.sliding(2).forall {
        case Seq(a, b) => b > a && b - a <= 4
        case _ => true
      }
    })
  }

  test("Hermite coefficient table satisfies the defining identities") {
    import graft.queries.RimeMore.hermiteCoeffs
    val h = hermiteCoeffs(12)
    // recurrence H_n = 2x·H_{n−1} − 2(n−1)·H_{n−2}, checked coefficientwise
    for (n <- 2 to 12; k <- 0 to n) {
      val shifted = if (k >= 1 && k - 1 < h(n - 1).length) 2L * h(n - 1)(k - 1) else 0L
      val lower = if (k < h(n - 2).length) -2L * (n - 1) * h(n - 2)(k) else 0L
      assert(h(n)(k) === shifted + lower, s"H_$n coeff x^$k")
    }
    // parity: only every other coefficient nonzero
    for (n <- 0 to 12; k <- 0 to n if (k % 2) != (n % 2))
      assert(h(n)(k) === 0L, s"H_$n parity at x^$k")
    // derivative identity H_n' = 2n·H_{n−1}, coefficientwise
    for (n <- 1 to 12; k <- 0 until n)
      assert((k + 1).toLong * h(n)(k + 1) === 2L * n * h(n - 1)(k),
        s"H_$n' at x^$k")
    // leading coefficient 2^n
    for (n <- 0 to 12) assert(h(n)(n) === (1L << n))
    // the SQL Horner form evaluates to the same value as the raw poly
    import graft.queries.RimeMore.hermiteSql
    for (n <- 0 to 8; xi <- Seq(-2.5, -1.0, -0.25, 0.0, 0.5, 1.75)) {
      val direct = h(n).zipWithIndex.map { case (c, k) =>
        c.toDouble * math.pow(xi, k) }.sum
      val viaSql = TestSpark.spark.sql(
        s"SELECT ${hermiteSql(n, xi.toString)} AS v").head.getDouble(0)
      assert(math.abs(viaSql - direct) <= 1e-9 * math.max(1.0, math.abs(direct)),
        s"H_$n($xi): $viaSql vs $direct")
    }
  }

  test("UVFITS random-groups write -> read is the identity for arbitrary layouts") {
    import graft.io.UvFits
    val gen = for {
      gcount <- Gen.choose(1, 12)
      pcount <- Gen.choose(1, 6)
      nc <- Gen.choose(1, 4); ns <- Gen.choose(1, 3)
      vals <- Gen.listOfN(gcount * (pcount + 3 * ns * nc),
        Gen.choose(-4096, 4096).map(_ / 16.0))
    } yield (gcount, pcount, nc, ns, vals.toArray)
    check("uvfits roundtrip", Prop.forAll(gen) {
      case (gcount, pcount, nc, ns, vals) =>
        val gsize = 3 * ns * nc
        val params = Array.tabulate(gcount)(g =>
          Array.tabulate(pcount)(p => vals(g * (pcount + gsize) + p)))
        val data = Array.tabulate(gcount * gsize) { i =>
          val g = i / gsize
          vals(g * (pcount + gsize) + pcount + i % gsize)
        }
        val f = java.io.File.createTempFile("uvprop", ".uvfits")
        val cards = Seq(
          "SIMPLE" -> "T", "BITPIX" -> "-64",
          "NAXIS" -> "4", "NAXIS1" -> "0",
          "NAXIS2" -> "3", "NAXIS3" -> ns.toString, "NAXIS4" -> nc.toString,
          "CTYPE2" -> "'COMPLEX'", "CTYPE3" -> "'STOKES'",
          "CTYPE4" -> "'FREQ'",
          "GROUPS" -> "T", "PCOUNT" -> pcount.toString,
          "GCOUNT" -> gcount.toString) ++
          (1 to pcount).map(i => s"PTYPE$i" -> s"'P$i'")
        UvFits.writeGroups(f.getAbsolutePath, cards, pcount, params, data, gsize)
        val g = UvFits.readGroups(f.getAbsolutePath)
        f.delete()
        g.gcount == gcount && g.shape == Seq(3, ns, nc) &&
          (0 until gcount).forall(i => g.params(i).sameElements(params(i))) &&
          g.data.sameElements(data)
    })
  }

  test("token_ct_in equals the split-filter-count definition for arbitrary text") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val tok = Gen.oneOf("a", "the", "b", "ü", "", "aa")
    val gen = for {
      n <- Gen.choose(0, 30)
      parts <- Gen.listOfN(n, tok)
      cands <- Gen.someOf(Seq("a", "the", "ü", "aa"))
    } yield (parts.mkString(" "), cands.toSeq)
    check("token_ct_in", Prop.forAll(gen) { case (text, cands) =>
      val got = graft.expr.TokenCtIn.compute(UTF8String.fromString(text),
        new GenericArrayData(cands.map(UTF8String.fromString).toArray[Any]))
      got == text.split(" ", -1).count(cands.contains)
    })
  }

  test("drop_prefixed equals split-filterNot-startsWith-join for arbitrary text") {
    import org.apache.spark.unsafe.types.UTF8String
    val part = Gen.oneOf("utm_x=1", "ref=2", "", "utm_", "x", "ütm", "utm_ü=é")
    val gen = for {
      n <- Gen.choose(0, 12)
      parts <- Gen.listOfN(n, part)
      prefix <- Gen.oneOf("utm_", "", "x", "ü")
    } yield (parts.mkString("&"), prefix)
    check("drop_prefixed", Prop.forAll(gen) { case (text, prefix) =>
      val got = graft.expr.DropPrefixed.compute(UTF8String.fromString(text),
        UTF8String.fromString("&"), UTF8String.fromString(prefix))
      val want = text.split("&", -1).filterNot(_.startsWith(prefix))
        .mkString("&")
      got.toString == want
    })
  }

  test("subword_sum equals the per-word ceil(chars/k) sum for arbitrary arrays") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val word = Gen.oneOf("", "a", "word", "verylongtokenindeed", "ünïcödé", "文字テスト")
    val gen = for {
      n <- Gen.choose(0, 16)
      words <- Gen.listOfN(n, word)
      k <- Gen.choose(1, 9)
    } yield (words, k)
    check("subword_sum", Prop.forAll(gen) { case (words, k) =>
      val got = graft.expr.SubwordSum.compute(
        new GenericArrayData(words.map(UTF8String.fromString).toArray[Any]), k)
      // length() in Spark counts code points, not UTF-16 units
      val want = words.map(w =>
        Math.ceil(w.codePointCount(0, w.length) / k.toDouble).toLong).sum
      got == want
    })
  }

  test("SemDedup.assign equals brute-force argmin with lowest-id ties") {
    import graft.operators.SemDedup
    val spark = TestSpark.spark
    import spark.implicits._
    val gen = for {
      dim <- Gen.choose(1, 8)
      nv <- Gen.choose(1, 24)
      nc <- Gen.choose(1, 6)
      vecs <- Gen.listOfN(nv * dim, Gen.choose(-8L, 8L))
      cents <- Gen.listOfN(nc * dim, Gen.choose(-8L, 8L))
    } yield (dim, vecs.grouped(dim).toSeq, cents.grouped(dim).toSeq)
    check("semdedup argmin", Prop.forAll(gen) { case (dim, vecs, cents) =>
      val corpus = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("cid", "qv")
      val seeds = cents.zipWithIndex
        .map { case (c, i) => (i.toLong, c) }.toDF("k", "qv")
      val got = SemDedup.assign(corpus, seeds)
        .select("cid", "k").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      vecs.zipWithIndex.forall { case (v, i) =>
        val best = cents.zipWithIndex.map { case (c, k) =>
          (v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, k)
        }.min // (d2, k) lexicographic = lowest id on ties
        got(i.toLong) == best._2.toLong
      }
    })
  }

  test("SemDedup.assignTwoLevel equals the brute-force two-level reference") {
    import graft.operators.SemDedup
    val spark = TestSpark.spark
    import spark.implicits._
    // fine seeds are a PREFIX of the corpus and coarse a prefix of fine —
    // the operator's intended use (fine ⊇ coarse), so no cell can win
    // rows yet hold no fine seed
    val gen = for {
      dim <- Gen.choose(1, 6)
      nv <- Gen.choose(4, 20)
      vecs <- Gen.listOfN(nv * dim, Gen.choose(-6L, 6L))
      nc <- Gen.choose(1, 3)
      nf <- Gen.choose(nc, math.max(nc, nv / 2))
    } yield (vecs.grouped(dim).toSeq, nc, nf)
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    check("two-level argmin", Prop.forAll(gen) { case (vecs, nc, nf) =>
      val corpus = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("cid", "qv")
      def seeds(n: Int) = vecs.take(n).zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("k", "qv")
      val got = SemDedup.assignTwoLevel(corpus, seeds(nc), seeds(nf))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      def cellOf(v: Seq[Long]): Long =
        vecs.take(nc).zipWithIndex.map { case (c, k) => (d2(v, c), k.toLong) }
          .min._2
      vecs.zipWithIndex.forall { case (v, i) =>
        val cell = cellOf(v)
        val cands = vecs.take(nf).zipWithIndex
          .filter { case (f, _) => cellOf(f) == cell }
        val (bd, bk) = cands
          .map { case (f, fk) => (d2(v, f), fk.toLong) }.min
        got(i.toLong) == ((cell, bk, bd))
      }
    })
  }
}
