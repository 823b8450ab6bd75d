package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.CxCol
import graft.functions.Feeds.Jones2x2

/** Port of the reference's predict_vis einsum-oracle test
  * (africanus/rime/tests/test_predict.py:20-130): full JONES_2X2 mode with
  * per-source DDE jones, per-antenna DIE jones and base visibilities,
  * checked against a direct driver-side contraction
  * V[r,c] = G_p (Σ_s E_ps X_s E_qs^H) G_q^H + B. */
class PredictFixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // reference index columns (test_predict.py:26-31)
  private val timeIdx = Array(0, 0, 1, 1, 2, 2, 2, 2, 3, 3)
  private val ant1 = Array(0, 0, 0, 0, 1, 1, 1, 2, 2, 3)
  private val ant2 = Array(0, 1, 2, 3, 1, 2, 3, 2, 3, 3)
  private val nSrc = 4; private val nTime = 4; private val nAnt = 4
  private val nChan = 3; private val nRow = 10

  private case class C(re: Double, im: Double) {
    def +(o: C) = C(re + o.re, im + o.im)
    def *(o: C) = C(re * o.re - im * o.im, re * o.im + im * o.re)
    def conj = C(re, -im)
  }
  private case class M(m00: C, m01: C, m10: C, m11: C) {
    def *(o: M) = M(
      m00 * o.m00 + m01 * o.m10, m00 * o.m01 + m01 * o.m11,
      m10 * o.m00 + m11 * o.m10, m10 * o.m01 + m11 * o.m11)
    def +(o: M) = M(m00 + o.m00, m01 + o.m01, m10 + o.m10, m11 + o.m11)
    def herm = M(m00.conj, m10.conj, m01.conj, m11.conj)
  }

  // deterministic pseudo-random dyadic values
  private def v(seed: Int*): Double = {
    val h = seed.foldLeft(17L)((a, b) => a * 31 + b)
    ((h % 19 + 19) % 19 - 9) / 8.0
  }
  private def mat(tag: Int, idx: Int*): M = M(
    C(v(tag +: 1 +: idx: _*), v(tag +: 2 +: idx: _*)),
    C(v(tag +: 3 +: idx: _*), v(tag +: 4 +: idx: _*)),
    C(v(tag +: 5 +: idx: _*), v(tag +: 6 +: idx: _*)),
    C(v(tag +: 7 +: idx: _*), v(tag +: 8 +: idx: _*)))

  private def dde(s: Int, t: Int, a: Int, c: Int) = mat(1, s, t, a, c)
  private def coh(s: Int, r: Int, c: Int) = mat(2, s, r, c)
  private def die(t: Int, a: Int, c: Int) = mat(3, t, a, c)
  private def base(r: Int, c: Int) = mat(4, r, c)

  private def direct(r: Int, c: Int): M = {
    val t = timeIdx(r)
    val sum = (0 until nSrc).map { s =>
      dde(s, t, ant1(r), c) * coh(s, r, c) * dde(s, t, ant2(r), c).herm
    }.reduce(_ + _)
    die(t, ant1(r), c) * sum * die(t, ant2(r), c).herm + base(r, c)
  }

  private def flat(prefix: String, m: M): Seq[(String, Double)] = Seq(
    s"${prefix}00_re" -> m.m00.re, s"${prefix}00_im" -> m.m00.im,
    s"${prefix}01_re" -> m.m01.re, s"${prefix}01_im" -> m.m01.im,
    s"${prefix}10_re" -> m.m10.re, s"${prefix}10_im" -> m.m10.im,
    s"${prefix}11_re" -> m.m11.re, s"${prefix}11_im" -> m.m11.im)

  private def j2(prefix: String): Jones2x2 = Jones2x2(
    CxCol(col(s"${prefix}00_re"), col(s"${prefix}00_im")),
    CxCol(col(s"${prefix}01_re"), col(s"${prefix}01_im")),
    CxCol(col(s"${prefix}10_re"), col(s"${prefix}10_im")),
    CxCol(col(s"${prefix}11_re"), col(s"${prefix}11_im")))

  test("distributed predict equals the direct einsum-style contraction") {
    import spark.implicits._
    val rows = (0 until nRow).map(r =>
      (r.toLong, timeIdx(r).toLong, ant1(r).toLong, ant2(r).toLong))
      .toDF("row_id", "t", "a1", "a2")
    val cohDf = (for { s <- 0 until nSrc; r <- 0 until nRow; c <- 0 until nChan }
      yield (s.toLong, r.toLong, c.toLong) -> coh(s, r, c))
      .map { case ((s, r, c), m) =>
        (s, r, c, m.m00.re, m.m00.im, m.m01.re, m.m01.im,
          m.m10.re, m.m10.im, m.m11.re, m.m11.im)
      }.toDF("s", "row_id", "c", "x00_re", "x00_im", "x01_re", "x01_im",
        "x10_re", "x10_im", "x11_re", "x11_im")
    def jonesDf(tag: Int, pfx: String) =
      (for { s <- 0 until nSrc; t <- 0 until nTime; a <- 0 until nAnt; c <- 0 until nChan }
        yield (s, t, a, c)).map { case (s, t, a, c) =>
        val m = mat(tag, s, t, a, c)
        (s.toLong, t.toLong, a.toLong, c.toLong,
          m.m00.re, m.m00.im, m.m01.re, m.m01.im,
          m.m10.re, m.m10.im, m.m11.re, m.m11.im)
      }.toDF("s", "t", "a", "c", s"${pfx}00_re", s"${pfx}00_im",
        s"${pfx}01_re", s"${pfx}01_im", s"${pfx}10_re", s"${pfx}10_im",
        s"${pfx}11_re", s"${pfx}11_im")
    val ddeP = jonesDf(1, "ep").withColumnsRenamed(Map("t" -> "tp", "a" -> "ap", "s" -> "sp"))
    val ddeQ = jonesDf(1, "eq").withColumnsRenamed(Map("t" -> "tq", "a" -> "aq", "s" -> "sq"))

    // per-(src,row,chan): E_p X E_q^H, then sum over src
    val expanded = cohDf.join(rows, "row_id")
      .join(broadcast(ddeP),
        col("sp") === col("s") && col("tp") === col("t") &&
          col("ap") === col("a1") && ddeP("c") === cohDf("c"))
      .join(broadcast(ddeQ),
        col("sq") === col("s") && col("tq") === col("t") &&
          col("aq") === col("a2") && ddeQ("c") === cohDf("c"))
    val inner = Jones2x2.mul(Jones2x2.mul(j2("ep"), j2("x")),
      Jones2x2.herm(j2("eq")))
    val summed = expanded
      .select(col("row_id"), col("t"), col("a1"), col("a2"), cohDf("c").as("c"),
        inner.m00.re.as("s00_re"), inner.m00.im.as("s00_im"),
        inner.m01.re.as("s01_re"), inner.m01.im.as("s01_im"),
        inner.m10.re.as("s10_re"), inner.m10.im.as("s10_im"),
        inner.m11.re.as("s11_re"), inner.m11.im.as("s11_im"))
      .groupBy("row_id", "t", "a1", "a2", "c")
      .agg(sum("s00_re").as("s00_re"), sum("s00_im").as("s00_im"),
        sum("s01_re").as("s01_re"), sum("s01_im").as("s01_im"),
        sum("s10_re").as("s10_re"), sum("s10_im").as("s10_im"),
        sum("s11_re").as("s11_re"), sum("s11_im").as("s11_im"))

    // DIE application + base
    val dieP = (for { t <- 0 until nTime; a <- 0 until nAnt; c <- 0 until nChan }
      yield (t, a, c)).map { case (t, a, c) =>
      val m = die(t, a, c)
      (t.toLong, a.toLong, c.toLong) match { case (tt, aa, cc) =>
        (tt, aa, cc, m.m00.re, m.m00.im, m.m01.re, m.m01.im,
          m.m10.re, m.m10.im, m.m11.re, m.m11.im)
      }
    }.toDF("gt", "ga", "gc", "g00_re", "g00_im", "g01_re", "g01_im",
      "g10_re", "g10_im", "g11_re", "g11_im")
    val dieQ = dieP.toDF(dieP.columns.map(_.replace("g", "h")): _*)
    val baseDf = (for { r <- 0 until nRow; c <- 0 until nChan } yield (r, c))
      .map { case (r, c) =>
        val m = base(r, c)
        (r.toLong, c.toLong, m.m00.re, m.m00.im, m.m01.re, m.m01.im,
          m.m10.re, m.m10.im, m.m11.re, m.m11.im)
      }.toDF("row_id", "c", "b00_re", "b00_im", "b01_re", "b01_im",
        "b10_re", "b10_im", "b11_re", "b11_im")
    val full = summed
      .join(broadcast(dieP), col("gt") === col("t") && col("ga") === col("a1")
        && col("gc") === col("c"))
      .join(broadcast(dieQ), col("ht") === col("t") && col("ha") === col("a2")
        && col("hc") === col("c"))
      .join(broadcast(baseDf), Seq("row_id", "c"))
    val outer = Jones2x2.mul(Jones2x2.mul(j2("g"), j2("s")),
      Jones2x2.herm(j2("h")))
    val got = full.select(col("row_id"), col("c"),
        (outer.m00.re + col("b00_re")).as("v00_re"),
        (outer.m00.im + col("b00_im")).as("v00_im"),
        (outer.m11.re + col("b11_re")).as("v11_re"),
        (outer.m11.im + col("b11_im")).as("v11_im"))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap

    for (r <- 0 until nRow; c <- 0 until nChan) {
      val exp = direct(r, c)
      val (g00r, g00i, g11r, g11i) = got((r, c))
      assert(math.abs(g00r - exp.m00.re) < 1e-9, s"v00.re at ($r,$c)")
      assert(math.abs(g00i - exp.m00.im) < 1e-9, s"v00.im at ($r,$c)")
      assert(math.abs(g11r - exp.m11.re) < 1e-9, s"v11.re at ($r,$c)")
      assert(math.abs(g11i - exp.m11.im) < 1e-9, s"v11.im at ($r,$c)")
    }
  }
}
