package graft.rime

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{Cx, CxCol, Det}
import graft.functions.Phase

/** The fused-RIME mini-compiler — SURVEY §2.11 X1-X5
  * (africanus/experimental/rime/fused/specification.py:78-470, core.py,
  * intrinsics.py).
  *
  * `RimeSpec.parse` turns an equation string like
  * `"(Gp,Kpq,Bpq,Gq): [I,Q,U,V] -> [XX,XY,YX,YY]"` into a term list +
  * stokes/corr schemas (X1). `RimeCompiler.plan` is the planner/codegen
  * analogue (X4/X5): it assembles ONE declarative DataFrame pipeline —
  * source×row×chan expansion with broadcast dimension tables, per-corr
  * sampler expressions fused by whole-stage codegen (the counterpart of
  * the reference's numba intrinsic chain), a deterministic fixed-point
  * source sum (its Kahan sums), and direction-independent gains applied
  * outside the sum. Catalyst provides the dead-argument elimination and
  * constant folding the reference implements by hand (§4).
  *
  * Term letters: K = phase delay, B = brightness (linear-feed stokes→corr,
  * with implicit-zero stokes as in model/coherency/conversion.py:163-198),
  * G = per-(time, ant) complex gain.
  */
final case class RimeSpec(terms: Seq[Char], stokes: Seq[String], corrs: Seq[String]) {
  def hasTerm(c: Char): Boolean = terms.contains(c)
}

object RimeSpec {
  private val KnownTerms = Set('K', 'B', 'G')
  private val KnownStokes = Set("I", "Q", "U", "V")
  private val KnownCorrs = Set("XX", "XY", "YX", "YY")
  private val Shape = """\(([^)]*)\)\s*:\s*\[([^\]]*)\]\s*->\s*\[([^\]]*)\]""".r

  def parse(s: String): RimeSpec = s.trim match {
    case Shape(ts, st, co) =>
      val terms = ts.split(",").map(_.trim).filter(_.nonEmpty).map { t =>
        require(KnownTerms(t.head), s"unknown term '$t' (known: K, B, G)")
        t.head
      }.toSeq
      require(terms.nonEmpty, "empty term list")
      val stokes = st.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      require(stokes.forall(KnownStokes), s"unknown stokes in [$st]")
      val corrs = co.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      require(corrs.nonEmpty && corrs.forall(KnownCorrs), s"unknown corr in [$co]")
      RimeSpec(terms, stokes, corrs)
    case other =>
      throw new IllegalArgumentException(
        s"cannot parse RIME spec '$other' — expected '(T,..): [S,..] -> [C,..]'")
  }
}

object RimeCompiler {

  /** Build the visibility pipeline for `specStr`.
    *
    * Inputs: `src` (src_id, l, m, and lowercase stokes columns i/q/u/v as
    * present), `rows` (row_id, u, v, w, time_index, ant1, ant2), `chans`
    * (chan, freq), `gainsDf` (time_index, ant, g_re, g_im; required iff G
    * is in the spec). Output: (row_id, chan) + <corr>_re/_im per requested
    * correlation.
    */
  def plan(specStr: String, src: DataFrame, rows: DataFrame,
           chans: DataFrame, gainsDf: Option[DataFrame] = None): DataFrame = {
    val spec = RimeSpec.parse(specStr)
    require(!spec.hasTerm('G') || gainsDf.isDefined,
      "spec contains G but no gains table was supplied")

    // implicit-zero stokes (conversion.py:163-198)
    def st(n: String): Column =
      if (spec.stokes.contains(n)) col(n.toLowerCase) else lit(0.0)

    // X3-style transform: the K sampler needs (l, m) + uvw + freq
    val k: CxCol =
      if (spec.hasTerm('K'))
        Phase.phaseDelay(col("l"), col("m"), col("u"), col("v"), col("w"), col("freq"))
      else Cx.one

    // per-corr fused sampler: brightness × phase. XX/YY have real
    // brightness under linear feeds — keep the real-scale form so the
    // expression matches the hand-written oracle trees bit for bit.
    def sampler(corr: String): CxCol = corr match {
      case "XX" => k.scale(st("I") + st("Q"))
      case "YY" => k.scale(st("I") - st("Q"))
      case "XY" => CxCol(st("U"), st("V")) * k
      case "YX" => CxCol(st("U"), -st("V")) * k
    }

    val expanded = rows.crossJoin(broadcast(src)).crossJoin(broadcast(chans))
    val gKeys =
      if (spec.hasTerm('G')) Seq("row_id", "time_index", "ant1", "ant2", "chan")
      else Seq("row_id", "chan")
    val sumCols = spec.corrs.flatMap { c =>
      val x = sampler(c)
      val n = c.toLowerCase
      Seq(Det.fsum(x.re).as(s"${n}_re"), Det.fsum(x.im).as(s"${n}_im"))
    }
    val summed = expanded.groupBy(gKeys.map(col): _*)
      .agg(sumCols.head, sumCols.tail: _*)

    if (!spec.hasTerm('G')) summed
    else {
      val withG = graft.queries.Predict.withGains(summed, gainsDf.get)
      val gp = CxCol(col("gp_re"), col("gp_im"))
      val gq = CxCol(col("gq_re"), col("gq_im"))
      val outCols = spec.corrs.flatMap { c =>
        val n = c.toLowerCase
        val v = gp * CxCol(col(s"${n}_re"), col(s"${n}_im")) * gq.conj
        Seq(v.re.as(s"${n}_re"), v.im.as(s"${n}_im"))
      }
      withG.select((col("row_id") +: col("chan") +: outCols): _*)
    }
  }
}
