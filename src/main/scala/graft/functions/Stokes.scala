package graft.functions

import org.apache.spark.sql.functions._
import graft.core.{Cx, CxCol}

/** Stokes ↔ correlation conversion (SURVEY §2.2 M4).
  *
  * Schema-driven linear recombination, planned at query-build time into a
  * fixed projection — the Spark analogue of the reference's greedy mapping
  * compiler (/root/reference/africanus/model/coherency/conversion.py:19-48
  * conversion tables, :144-230 planner). All combos are +/- and halving —
  * exact IEEE arithmetic, bit-deterministic.
  */
object StokesConvert {

  /** (a+bi)/2i = b/2 - (a/2)i. */
  private def divTwoI(z: CxCol): CxCol = CxCol(z.im / lit(2.0), -z.re / lit(2.0))

  /** Convert the available components in `in` to the requested `targets`.
    * Components are any of I,Q,U,V,XX,XY,YX,YY,RR,RL,LR,LL.
    * Throws at plan time if a target is underivable — mirroring the
    * reference's MissingConversionInputs (conversion.py:163-198). */
  def convert(in: Map[String, CxCol], targets: Seq[String]): Seq[(String, CxCol)] =
    targets.map(t => t -> one(in, t))

  private def one(in: Map[String, CxCol], t: String): CxCol = {
    def g(k: String): Option[CxCol] = in.get(k)
    def both(a: String, b: String)(f: (CxCol, CxCol) => CxCol): Option[CxCol] =
      for (x <- g(a); y <- g(b)) yield f(x, y)
    val two = lit(2.0)
    val candidates: Seq[Option[CxCol]] = t match {
      // stokes -> corr (conversion.py:19-28)
      case "RR" => Seq(both("I", "V")(_ + _))
      case "RL" => Seq(both("Q", "U")((q, u) => q + (Cx.i * u)))
      case "LR" => Seq(both("Q", "U")((q, u) => q - (Cx.i * u)))
      case "LL" => Seq(both("I", "V")(_ - _))
      case "XX" => Seq(both("I", "Q")(_ + _))
      case "XY" => Seq(both("U", "V")((u, v) => u + (Cx.i * v)))
      case "YX" => Seq(both("U", "V")((u, v) => u - (Cx.i * v)))
      case "YY" => Seq(both("I", "Q")(_ - _))
      // corr -> stokes (conversion.py:31-48)
      case "I" => Seq(
        both("XX", "YY")((a, b) => (a + b) / two),
        both("RR", "LL")((a, b) => (a + b) / two))
      case "Q" => Seq(
        both("XX", "YY")((a, b) => (a - b) / two),
        both("RL", "LR")((a, b) => (a + b) / two))
      case "U" => Seq(
        both("XY", "YX")((a, b) => (a + b) / two),
        both("RL", "LR")((a, b) => divTwoI(a - b)))
      case "V" => Seq(
        both("XY", "YX")((a, b) => divTwoI(a - b)),
        both("RR", "LL")((a, b) => (a - b) / two))
      case other => throw new IllegalArgumentException(s"unknown component $other")
    }
    g(t).orElse(candidates.flatten.headOption).getOrElse(
      throw new IllegalArgumentException(
        s"cannot derive $t from inputs ${in.keys.mkString(",")}"))
  }
}

/** Feed rotation (L term) — SURVEY §2.1 R5.
  * 2x2 rotation per parallactic angle; semantics match
  * /root/reference/africanus/rime/feeds.py:13-48.
  */
object Feeds {
  import org.apache.spark.sql.Column

  final case class Jones2x2(m00: CxCol, m01: CxCol, m10: CxCol, m11: CxCol)

  def feedRotation(pa: Column, feedType: String = "linear"): Jones2x2 = {
    val c = cos(pa)
    val s = sin(pa)
    feedType match {
      case "linear" => // feeds.py:19-31
        Jones2x2(Cx.real(c), Cx.real(s), Cx.real(-s), Cx.real(c))
      case "circular" => // feeds.py:34-44: diag(cos-isin, cos+isin)
        Jones2x2(CxCol(c, -s), Cx.zero, Cx.zero, CxCol(c, s))
      case other =>
        throw new IllegalArgumentException(s"Invalid feed_type '$other'")
    }
  }

  object Jones2x2 {
    /** 2x2 complex matmul a·b. */
    def mul(a: Jones2x2, b: Jones2x2): Jones2x2 = Jones2x2(
      a.m00 * b.m00 + a.m01 * b.m10, a.m00 * b.m01 + a.m01 * b.m11,
      a.m10 * b.m00 + a.m11 * b.m10, a.m10 * b.m01 + a.m11 * b.m11)
    /** Hermitian transpose. */
    def herm(a: Jones2x2): Jones2x2 =
      Jones2x2(a.m00.conj, a.m10.conj, a.m01.conj, a.m11.conj)
    /** 2x2 complex inverse (used by correct_vis FULL mode,
      * calibration/utils/correct_vis.py:10-119). */
    def inv(a: Jones2x2): Jones2x2 = {
      val det = a.m00 * a.m11 - a.m01 * a.m10
      Jones2x2(a.m11 / det, (-a.m01) / det, (-a.m10) / det, a.m00 / det)
    }
  }
}
