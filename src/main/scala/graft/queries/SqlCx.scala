package graft.queries

/** String-side complex / 2x2-matrix algebra for GENERATING oracle SQL:
  * each operation mirrors `graft.core.CxCol` / `Feeds.Jones2x2` term for
  * term, so a Spark plan built with the column algebra and an oracle built
  * with this one evaluate identical expression trees. */
object SqlCx {

  final case class CS(re: String, im: String) {
    def +(o: CS): CS = CS(s"(${re} + ${o.re})", s"(${im} + ${o.im})")
    def -(o: CS): CS = CS(s"(${re} - ${o.re})", s"(${im} - ${o.im})")
    def *(o: CS): CS = CS(
      s"(${re}*${o.re} - ${im}*${o.im})",
      s"(${re}*${o.im} + ${im}*${o.re})")
    def conj: CS = CS(re, s"(-${im})")
    def neg: CS = CS(s"(-${re})", s"(-${im})")
    /** mirrors CxCol./(s: Column): componentwise divide by a real scalar */
    def /(s: String): CS = CS(s"(${re} / $s)", s"(${im} / $s)")
    /** mirrors CxCol.scale(s: Column) */
    def scale(s: String): CS = CS(s"(${re}*$s)", s"(${im}*$s)")
    /** mirrors CxCol./(CxCol): a·conj(b) / |b|² */
    def /(o: CS): CS = {
      val d = s"(${o.re}*${o.re} + ${o.im}*${o.im})"
      CS(s"((${re}*${o.re} + ${im}*${o.im}) / $d)",
        s"((${im}*${o.re} - ${re}*${o.im}) / $d)")
    }
  }

  final case class MS(m00: CS, m01: CS, m10: CS, m11: CS)

  /** mirrors Feeds.Jones2x2.mul */
  def mulS(a: MS, b: MS): MS = MS(
    a.m00 * b.m00 + a.m01 * b.m10, a.m00 * b.m01 + a.m01 * b.m11,
    a.m10 * b.m00 + a.m11 * b.m10, a.m10 * b.m01 + a.m11 * b.m11)

  /** mirrors Feeds.Jones2x2.herm */
  def hermS(a: MS): MS =
    MS(a.m00.conj, a.m10.conj, a.m01.conj, a.m11.conj)

  /** mirrors Feeds.Jones2x2.inv */
  def invS(a: MS): MS = {
    val det = a.m00 * a.m11 - a.m01 * a.m10
    MS(a.m11 / det, a.m01.neg / det, a.m10.neg / det, a.m00 / det)
  }
}
