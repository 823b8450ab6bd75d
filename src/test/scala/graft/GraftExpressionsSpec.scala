package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expr.GraftFunctions

class GraftExpressionsSpec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark; GraftFunctions.register(s); s }

  test("sinc expression: exact at zero, matches scala elsewhere, codegen path") {
    val rows = spark.sql(
      "SELECT x, sinc(x) AS s FROM VALUES (0.0D), (0.5D), (-2.0D), (3.14159D) AS t(x)")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(rows(0.0) === 1.0)
    for ((x, s) <- rows if x != 0.0) assert(s === math.sin(x) / x)
    // null propagates
    assert(spark.sql("SELECT sinc(CAST(NULL AS DOUBLE))").collect()(0).isNullAt(0))
  }

  test("kahan_sum preserves small terms that a naive double sum drops") {
    import spark.implicits._
    val vals = Seq(1e16, 1.0, -1e16, 1.0)
    val df = vals.toDF("v").coalesce(1)
    df.createOrReplaceTempView("kahan_in")
    val k = spark.sql("SELECT kahan_sum(v) FROM kahan_in").collect()(0).getDouble(0)
    assert(k === 2.0)
    // distributed merge keeps the compensation
    val big = (1 to 1000).flatMap(_ => Seq(1e12, 0.1, -1e12))
    big.toDF("v").repartition(8).createOrReplaceTempView("kahan_big")
    val kb = spark.sql("SELECT kahan_sum(v) FROM kahan_big").collect()(0).getDouble(0)
    assert(math.abs(kb - 100.0) < 1e-9)
  }

  test("kahan_sum of empty input is 0") {
    import spark.implicits._
    Seq.empty[Double].toDF("v").createOrReplaceTempView("kahan_empty")
    assert(spark.sql("SELECT kahan_sum(v) FROM kahan_empty")
      .collect()(0).getDouble(0) === 0.0)
  }

  test("token_ct_in ≡ size(filter(split(text,' '), stop-token lambda)) on corpus + edges") {
    // the real corpus: every document must agree exactly
    spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .createOrReplaceTempView("tci_docs")
    val corpusDiff = spark.sql(
      """SELECT count(*) AS n FROM tci_docs
        |WHERE token_ct_in(text, array('a', 'the'))
        |   <> size(filter(split(text, ' '), t -> t = 'a' OR t = 'the'))""".stripMargin)
      .collect()(0).getLong(0)
    assert(corpusDiff === 0L)
    // edge grid: multi-space (empty tokens), candidates at ends, unicode
    // multibyte neighbours, candidate-as-substring ('a' in 'cat'), empty
    // string, trailing space (Java split limit=-1 keeps the empty tail)
    val edges = Seq(
      "a the a", "  a  the  ", "the", "a", "", " ", "cat hat the", "athe thea",
      "üa a ü the é", "a  the", "the a the a the", "word a", "a word", "aa thee")
    import spark.implicits._
    edges.toDF("text").createOrReplaceTempView("tci_edges")
    val rows = spark.sql(
      """SELECT token_ct_in(text, array('a', 'the')) AS fast,
        |  size(filter(split(text, ' '), t -> t = 'a' OR t = 'the')) AS ref
        |FROM tci_edges""".stripMargin).collect()
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    // null text propagates; empty candidate set counts nothing
    assert(spark.sql("SELECT token_ct_in(CAST(NULL AS STRING), array('a'))")
      .collect()(0).isNullAt(0))
    assert(spark.sql("SELECT token_ct_in('a b', CAST(array() AS ARRAY<STRING>))")
      .collect()(0).getInt(0) === 0)
  }

  test("drop_prefixed ≡ array_join(filter(split(q,'&'), NOT startswith), '&')") {
    // the t46 query-string shapes plus edges: all-dropped, all-kept,
    // empty parts (&&), prefix-only part, prefix at every position,
    // empty string, delimiter-free string — and 'utmX=1'-style parts
    // where LITERAL prefix match and LIKE 'utm_%' (wildcard _) DIFFER:
    // drop_prefixed keeps them, LIKE would drop them
    val qs = Seq(
      "utm_source=feed&utm_id=7&ref=3", "ref=1&utm_x=2", "utm_a=1&utm_b=2",
      "a=1&b=2", "", "utm_", "utm", "&&", "&utm_x&", "x&utm_y&z",
      "utm_first=1&mid=2&utm_last=3", "ref=utm_notprefix",
      "utm1=2&utm_id=3", "utmX=1", "utmA=1&ref=2&utm_b=3")
    import spark.implicits._
    qs.toDF("q").createOrReplaceTempView("dp_edges")
    val rows = spark.sql(
      """SELECT drop_prefixed(q, '&', 'utm_') AS fast,
        |  array_join(filter(split(q, '&'), x -> NOT startswith(x, 'utm_')), '&') AS ref
        |FROM dp_edges""".stripMargin).collect()
    rows.foreach(r => assert(r.getString(0) === r.getString(1)))
    // drop_prefixed is LITERAL: 'utmX=1' survives, while LIKE 'utm_%'
    // (where _ is a wildcard) would have dropped it
    assert(spark.sql("SELECT drop_prefixed('utmX=1&utm_y=2', '&', 'utm_')")
      .collect()(0).getString(0) === "utmX=1")
    // the real t46 surface: generated URLs over the corpus ids
    spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .createOrReplaceTempView("dp_docs")
    val corpusDiff = spark.sql(
      """WITH u AS (SELECT concat('utm_source=feed&utm_id=', doc_id,
        |  '&ref=', (doc_id div 3) % 5) AS q FROM dp_docs)
        |SELECT count(*) FROM u
        |WHERE drop_prefixed(q, '&', 'utm_')
        |  <> array_join(filter(split(q, '&'), x -> NOT startswith(x, 'utm_')), '&')"""
        .stripMargin).collect()(0).getLong(0)
    assert(corpusDiff === 0L)
    // non-literal or multi-byte delimiter is a clear registration error
    intercept[Exception](spark.sql("SELECT drop_prefixed('a', '&&', 'x')").collect())
    // null text propagates
    assert(spark.sql("SELECT drop_prefixed(CAST(NULL AS STRING), '&', 'utm_')")
      .collect()(0).isNullAt(0))
  }

  test("subword_sum ≡ aggregate(words, 0L, ceil(length/k) lambda), incl. non-pow2 k") {
    spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .createOrReplaceTempView("sw_docs")
    for (k <- Seq(3, 4, 7)) {
      val diff = spark.sql(
        s"""WITH g AS (SELECT regexp_extract_all(text, '[a-z]+', 0) AS words
           |  FROM sw_docs)
           |SELECT count(*) FROM g
           |WHERE subword_sum(words, $k) <> aggregate(words, 0L,
           |  (a, w) -> a + CAST(CEIL(length(w) / ${k}e0) AS BIGINT))""".stripMargin)
        .collect()(0).getLong(0)
      assert(diff === 0L, s"k=$k")
    }
    // empty array is the lambda's zero seed; unicode length is char count
    assert(spark.sql("SELECT subword_sum(CAST(array() AS ARRAY<STRING>), 4)")
      .collect()(0).getLong(0) === 0L)
    assert(spark.sql("SELECT subword_sum(array('ünïcödé'), 4)")
      .collect()(0).getLong(0) === 2L) // 7 chars -> ceil(7/4) = 2
    assert(spark.sql("SELECT subword_sum(CAST(NULL AS ARRAY<STRING>), 4)")
      .collect()(0).isNullAt(0))
  }

  test("lsh_code16 matches the declarative 16-pass formulation and eval path") {
    import spark.implicits._
    val vecs = Seq(
      (0L, (1 to 64).map(i => ((i * 7) % 23 - 11).toLong)),
      (1L, (1 to 64).map(i => ((i * 13) % 17 - 8).toLong)),
      (2L, Seq.empty[Long]), // empty array → all projections 0 → code 0
      (3L, Seq(5L)))
    val df = vecs.toDF("id", "qv")
    df.createOrReplaceTempView("lsh_in")
    val declarative =
      """aggregate(sequence(0, 15), 0L, (acc, j) -> acc +
        |  CASE WHEN aggregate(transform(qv, (x, i) ->
        |         x * ((CAST(i + 1 AS BIGINT) * (2654435761 + CAST(j AS BIGINT) * 40503)) % 2048 - 1024)),
        |       0L, (a, x) -> a + x) > 0
        |  THEN CAST(shiftleft(1L, CAST(j AS INT)) AS BIGINT) ELSE 0L END)""".stripMargin
    val rows = spark.sql(
      s"SELECT id, lsh_code16(qv) AS fast, $declarative AS slow, " +
        "lsh_code(qv, 16) AS gen FROM lsh_in")
      .collect()
    for (r <- rows) {
      assert(r.getLong(1) === r.getLong(2), s"id ${r.getLong(0)}")
      // the general-width form at 16 IS the lsh_code16 alias
      assert(r.getLong(1) === r.getLong(3), s"id ${r.getLong(0)} width-16")
    }
    assert(rows.find(_.getLong(0) == 2L).get.getLong(1) === 0L)
    // interpreted (non-codegen) eval path agrees with the codegen result
    val direct = graft.expr.LshCode(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        vecs.head._2.toArray,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      16)
      .eval(null).asInstanceOf[Long]
    assert(direct === rows.find(_.getLong(0) == 0L).get.getLong(1))
  }

  test("lsh_code widths nest: a wider code's low bits are the narrower code") {
    // the hyperplane family is indexed by j independent of the width, so
    // code(nbits=w)[0..15] == code(nbits=16) — widening the table only
    // SPLITS buckets (no membership churn), the property that makes the
    // corpus-scaled width a pure refinement of the 16-bit floor
    import spark.implicits._
    val vecs = Seq(
      (0L, (1 to 64).map(i => ((i * 7) % 23 - 11).toLong)),
      (1L, (1 to 64).map(i => ((i * 13) % 17 - 8).toLong)),
      (2L, (1 to 32).map(i => ((i * 31) % 41 - 20).toLong)))
    vecs.toDF("id", "qv").createOrReplaceTempView("lsh_nest")
    val rows = spark.sql(
      "SELECT lsh_code(qv, 16) AS c16, lsh_code(qv, 18) AS c18, " +
        "lsh_code(qv, 24) AS c24 FROM lsh_nest").collect()
    for (r <- rows) {
      assert((r.getLong(1) & 0xffffL) === r.getLong(0))
      assert((r.getLong(2) & 0x3ffffL) === r.getLong(1))
    }
  }

  test("rolling_fp matches the declarative per-character aggregate") {
    import spark.implicits._
    Seq((0L, "hello world"), (1L, ""), (2L, "a"),
        (3L, "The quick brown fox! 42"))
      .toDF("id", "text").createOrReplaceTempView("fp_in")
    val declarative =
      """aggregate(
        |  sequence(1, length(text)),
        |  0L,
        |  (acc, i) -> acc + CAST(ascii(substring(text, i, 1)) AS BIGINT)
        |    * ((CAST(i AS BIGINT) * 2654435761) % 1048576 + 1)
        |) % 1073741824""".stripMargin
    val rows = spark.sql(
      s"SELECT id, rolling_fp(text) AS fast, $declarative AS slow FROM fp_in")
      .collect()
    for (r <- rows)
      assert(r.getLong(1) === r.getLong(2), s"id ${r.getLong(0)}")
    // direct object API agrees too
    assert(graft.expr.RollingFingerprint.compute("hello world")
      === rows.find(_.getLong(0) == 0L).get.getLong(1))
    assert(graft.expr.RollingFingerprint.compute("") === 0L)
  }

  test("simhash8 matches the declarative distinct-token vote pipeline") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // repeated tokens (distinct semantics), double/trailing spaces (empty
    // tokens), a vote-tie doc (2 tokens with complementary bits → v=0 →
    // bit cleared), and unicode-free mixed punctuation
    val docs = Seq((0L, "the cat sat on the the mat"), (1L, ""),
      (2L, "a  b c "), (3L, "x y"), (4L, "Zk42! Zk42! qq-7"))
      .toDF("doc_id", "text")
    val th = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .distinct()
      .select(col("doc_id"),
        expr("""aggregate(sequence(1, length(tok)), 0L,
                (acc, i) -> acc + CAST(ascii(substring(tok, i, 1)) AS BIGINT)
                  * ((CAST(i AS BIGINT) * 37) % 64 + 1)) % 4096""").as("h"))
    val voteCols = (0 until 8).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1L) === 1L, 1L)
        .otherwise(-1L)).as(s"v$b"))
    val slow = th.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"),
        (0 until 8).map(b => when(col(s"v$b") > 0, 1L << b).otherwise(0L))
          .reduce(_ + _).cast("long").as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.expr.GraftFunctions.register(spark)
    val fast = docs.select(col("doc_id"), expr("simhash8(text)").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === slow)
    // direct object API: interpreted eval path agrees with codegen
    assert(graft.expr.SimHash8.compute("the cat sat on the the mat")
      === fast(0L))
  }

  test("kmv_minhash keeps the k smallest distinct values, invariant to partitioning") {
    import spark.implicits._
    // values with duplicates, spread over many partitions so map-side
    // partials MUST merge; expectation is the brute-force bottom-8
    val vals = (1L to 500L).map(i => (i * 7919) % 997) ++ Seq(3L, 3L, 5L)
    val expect = vals.distinct.sorted.take(8)
    for (parts <- Seq(1, 7, 32)) {
      val got = vals.toDF("v").repartition(parts)
        .agg(org.apache.spark.sql.functions.expr("kmv_minhash(v, 8)").as("arr"))
        .head.getSeq[Long](0)
      assert(got === expect, s"parts=$parts")
    }
    // fewer distinct values than k: the sketch returns them all, sorted
    val small = Seq(9L, 2L, 9L, 4L).toDF("v")
      .agg(org.apache.spark.sql.functions.expr("kmv_minhash(v, 8)").as("arr"))
      .head.getSeq[Long](0)
    assert(small === Seq(2L, 4L, 9L))
  }

  test("bloom sketch: zero false negatives; false-positive rate within bound") {
    import spark.implicits._
    // the t19 prefilter contract: members ALWAYS pass (so the exact join
    // after the prefilter is lossless), and the 10-bits-per-item sizing
    // holds the FP rate near its ~1% design point on disjoint probes
    (1 to 10000).map(i => s"member_$i").toDF("s")
      .createOrReplaceTempView("bloom_members")
    val bloomSub =
      "(SELECT bloom_filter_agg(xxhash64(s), 10000L, 100000L) FROM bloom_members)"
    val fn = spark.sql(
      s"""SELECT count(*) FROM bloom_members
         |WHERE NOT bloom_might_contain($bloomSub, xxhash64(s))""".stripMargin)
      .head.getLong(0)
    assert(fn === 0L, "a bloom filter must have no false negatives")
    (1 to 20000).map(i => s"probe_$i").toDF("s")
      .createOrReplaceTempView("bloom_probes")
    val fp = spark.sql(
      s"""SELECT count(*) FROM bloom_probes
         |WHERE bloom_might_contain($bloomSub, xxhash64(s))""".stripMargin)
      .head.getLong(0)
    val rate = fp.toDouble / 20000
    info(s"bloom FP rate at 10 bits/item: $rate ($fp / 20000)")
    assert(rate < 0.03, s"FP rate $rate exceeds 3x the 1% design point")
  }

  test("qquant is bit-identical to the transform-ROUND-cast quantizer") {
    // the hashed embedding surfaces all flow through the quantizer; this
    // pins the codegen expression to the declarative HOF it replaces over
    // the REAL corpus at both scales in use, so swapping it in cannot
    // move a single value under the gate.
    val emb = graft.core.Tables.embeddings(spark, TestSpark.sf)
    for (scale <- Seq("1e4", "1e6")) {
      val n = emb.selectExpr(
        s"transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * $scale) AS BIGINT)) AS a",
        s"qquant(embedding, $scale) AS b")
        .filter("a <> b").count()
      assert(n === 0, s"qquant diverges from transform at scale $scale")
    }
    // .5-exact and negative edge grid (scale 2 makes the halves exact in
    // binary): HALF_UP = away from zero on both paths. Non-finite input
    // throws on BOTH paths (ANSI cast vs the qquant require).
    val edge = spark.sql(
      """SELECT transform(v, x -> CAST(ROUND(CAST(x AS DOUBLE) * 2e0) AS BIGINT)) AS a,
        |       qquant(v, 2e0) AS b
        |FROM VALUES (array(1.25f, -1.25f, 0.75f, -0.75f, 0.0f)) AS t(v)
        |""".stripMargin).collect().head
    assert(edge.getSeq[Long](0) === edge.getSeq[Long](1))
    assert(edge.getSeq[Long](0) === Seq(3L, -3L, 2L, -2L, 0L))
    assertThrows[Exception](spark.sql(
      "SELECT qquant(array(float('nan')), 2e0)").collect())
  }

  test("char_grams and word_grams match the transform-sequence shingling") {
    // the gram strings feed hashed join keys and counts; pin both codegen
    // expressions to the HOFs they replace over the real corpus at the
    // k values in use (5-char shingles, 3- and 5-word grams)
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
    val nc = docs.filter("length(text) >= 5").selectExpr(
      "transform(sequence(1, length(text) - 4), i -> substring(text, i, 5)) AS a",
      "char_grams(text, 5) AS b").filter("a <> b").count()
    assert(nc === 0)
    for (k <- Seq(3, 5)) {
      val nw = docs.selectExpr("split(text, ' ') AS tk")
        .filter(s"size(tk) >= $k").selectExpr(
        s"transform(sequence(1, size(tk) - ${k - 1}), i -> concat_ws(' ', slice(tk, i, $k))) AS a",
        s"word_grams(tk, $k) AS b").filter("a <> b").count()
      assert(nw === 0, s"word_grams diverges at k=$k")
    }
    // short inputs yield empty (call sites filter these out before the
    // explode; empty-array explode = no rows either way)
    val short = spark.sql(
      "SELECT char_grams('abc', 5) AS c, word_grams(array('a','b'), 3) AS w")
      .collect().head
    assert(short.getSeq[String](0).isEmpty && short.getSeq[String](1).isEmpty)
  }

  test("scatter_moments equals the posexplode scatter, invariant to partitioning") {
    // the PCA scatter's typed aggregate must produce the exact same
    // integer (n, sv, sxx) as the declarative double-posexplode chain it
    // replaced, whatever the partition layout (merge path exercised)
    val emb = graft.core.Tables.embeddings(spark, TestSpark.sf)
    val q = emb.selectExpr("qquant(embedding, 1e4) AS qv")
    def moments(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("scatter_moments(qv) AS m")
        .selectExpr("m.n", "m.sv", "m.sxx").collect().head
    val m1 = moments(q.repartition(1))
    val m7 = moments(q.repartition(7))
    assert(m1.getLong(0) === m7.getLong(0))
    assert(m1.getSeq[Long](1) === m7.getSeq[Long](1))
    assert(m1.getSeq[Long](2) === m7.getSeq[Long](2))
    // declarative restate of one sxx cell and one sv entry
    import org.apache.spark.sql.functions._
    val decl = q
      .select(posexplode(col("qv")).as(Seq("p1", "qi")), col("qv"))
      .filter(col("p1") === 0)
      .select(col("qi"), expr("element_at(qv, 3)").as("qj"))
      .agg(sum(col("qi")).as("sv1"), sum(col("qi") * col("qj")).as("sxx13"),
        count(lit(1)).as("n")).collect().head
    assert(m1.getLong(0) === decl.getLong(2))
    assert(m1.getSeq[Long](1).head === decl.getLong(0))
    assert(m1.getSeq[Long](2)(2) === decl.getLong(1)) // row 0, col 2 (0-based)
  }

  test("winnow_fps matches the declarative windows-join formulation") {
    import spark.implicits._
    // texts exercising ties (repeats force equal hashes in one window),
    // the len<8 empty case, and an exact len==8 single-window case
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "aaaaaaaaaaaaaaa"), // all-equal hashes: rightmost tie everywhere
      (3L, "abcabcabcabcabc"), // period-3 repeats
      (4L, "short"), // < 8 chars: no windows
      (5L, "exactly8"), // one window exactly
      (6L, "mississippi bells and banana bandanas"))
    val df = texts.toDF("doc_id", "text")
    df.createOrReplaceTempView("wtexts")
    val fast = spark.sql(
      """SELECT doc_id, w.pos AS pos, w.fp AS fp
        |FROM wtexts LATERAL VIEW explode(winnow_fps(text)) AS w
        |WHERE length(text) >= 8""".stripMargin)
    // the textbook formulation: per-position hashes, 4-wide window
    // explode, rightmost-min rank — what the DuckDB oracle runs
    val slow = spark.sql(
      """WITH h AS (
        |  SELECT doc_id, i,
        |    (CAST(ascii(substring(text, CAST(i AS INT), 1)) AS BIGINT) * 923521
        |     + CAST(ascii(substring(text, CAST(i + 1 AS INT), 1)) AS BIGINT) * 29791
        |     + CAST(ascii(substring(text, CAST(i + 2 AS INT), 1)) AS BIGINT) * 961
        |     + CAST(ascii(substring(text, CAST(i + 3 AS INT), 1)) AS BIGINT) * 31
        |     + CAST(ascii(substring(text, CAST(i + 4 AS INT), 1)) AS BIGINT))
        |      % 1048576 AS hv
        |  FROM wtexts LATERAL VIEW
        |    explode(sequence(1, length(text) - 4)) AS i
        |  WHERE length(text) >= 8),
        |wins AS (
        |  SELECT doc_id, i AS wi, j
        |  FROM h LATERAL VIEW explode(sequence(i - 3, i)) AS j
        |  WHERE i >= 4),
        |sel AS (
        |  SELECT w.doc_id, w.wi, h.i AS j, h.hv,
        |    ROW_NUMBER() OVER (PARTITION BY w.doc_id, w.wi
        |                       ORDER BY h.hv, h.i DESC) AS rk
        |  FROM wins w JOIN h ON h.doc_id = w.doc_id AND h.i = w.j)
        |SELECT DISTINCT doc_id, CAST(j AS BIGINT) AS pos,
        |  CAST(hv AS BIGINT) AS fp
        |FROM sel WHERE rk = 1""".stripMargin)
    val f = fast.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val s = slow.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(f === s)
    assert(f.nonEmpty)
    // doc 4 (<8 chars) contributes nothing; doc 2's all-tie text selects
    // exactly the rightmost position of each window (one fp per window)
    assert(!f.exists(_._1 == 4L))
    val d2 = f.filter(_._1 == 2L).map(_._2)
    assert(d2 === (4L to 11L).toSet) // len 15 → hash positions 1..11, windows end 4..11
    // winnowing guarantee: selected positions within a doc, sorted, have
    // gaps ≤ w (every window of 4 consecutive hash positions is covered)
    for (doc <- f.map(_._1)) {
      val ps = f.filter(_._1 == doc).map(_._2).toSeq.sorted
      assert(ps.head <= 4L)
      ps.sliding(2).foreach {
        case Seq(a, b) => assert(b - a <= 4L, s"gap $a→$b in doc $doc")
        case _ =>
      }
    }
  }
}
