package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Complex-valued column algebra.
  *
  * Spark has no complex type, so a complex value is a pair of double
  * Columns. All operations expand to plain Catalyst arithmetic — they stay
  * inside whole-stage codegen and are deterministic (IEEE ops, no
  * reordering), which the duckdb-oracle hash-matching relies on.
  *
  * Mirrors the complex arithmetic used throughout the reference's kernels
  * (e.g. /root/reference/africanus/rime/predict.py:56-130 2x2 matmuls,
  * africanus/model/coherency/conversion.py:19-48 stokes combos).
  */
final case class CxCol(re: Column, im: Column) {
  def +(o: CxCol): CxCol = CxCol(re + o.re, im + o.im)
  def -(o: CxCol): CxCol = CxCol(re - o.re, im - o.im)
  def *(o: CxCol): CxCol =
    CxCol(re * o.re - im * o.im, re * o.im + im * o.re)
  def conj: CxCol = CxCol(re, -im)
  def unary_- : CxCol = CxCol(-re, -im)
  /** Scale by a real column. */
  def *:(s: Column): CxCol = CxCol(re * s, im * s)
  def scale(s: Column): CxCol = CxCol(re * s, im * s)
  def /(s: Column): CxCol = CxCol(re / s, im / s)
  /** Complex division a/b = a * conj(b) / |b|^2. */
  def /(o: CxCol): CxCol = {
    val d = o.re * o.re + o.im * o.im
    CxCol((re * o.re + im * o.im) / d, (im * o.re - re * o.im) / d)
  }
  def abs2: Column = re * re + im * im
  /** As a struct<re,im> column (for array-of-complex packing). */
  def struct_(name: String = ""): Column =
    struct(re.as("re"), im.as("im"))
  /** Round both parts to `d` decimals (determinism for transcendental inputs). */
  def rounded(d: Int): CxCol = CxCol(round(re, d), round(im, d))
}

object Cx {
  val zero: CxCol = CxCol(lit(0.0), lit(0.0))
  val one: CxCol = CxCol(lit(1.0), lit(0.0))
  val i: CxCol = CxCol(lit(0.0), lit(1.0))
  def real(c: Column): CxCol = CxCol(c, lit(0.0))
  def imag(c: Column): CxCol = CxCol(lit(0.0), c)
  /** e^{i phase} = cos(phase) + i sin(phase) — the reference elides exp the
    * same way (africanus/rime/phase.py:52-59). */
  def expi(phase: Column): CxCol = CxCol(cos(phase), sin(phase))
  def fromStruct(c: Column): CxCol = CxCol(c.getField("re"), c.getField("im"))
}
