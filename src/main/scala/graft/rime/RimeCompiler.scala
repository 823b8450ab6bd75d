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
  private val KnownTerms = Set('K', 'B', 'G', 'L')
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
           chans: DataFrame, gainsDf: Option[DataFrame] = None,
           paDf: Option[DataFrame] = None): DataFrame = {
    val spec = RimeSpec.parse(specStr)
    require(!spec.hasTerm('G') || gainsDf.isDefined,
      "spec contains G but no gains table was supplied")
    require(!spec.hasTerm('L') || paDf.isDefined,
      "spec contains L but no parallactic-angle table was supplied")
    require(!(spec.hasTerm('L') && spec.hasTerm('G')),
      "combining L and G terms is not supported yet")

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
    val needsAnts = spec.hasTerm('G') || spec.hasTerm('L')
    val gKeys =
      if (needsAnts) Seq("row_id", "time_index", "ant1", "ant2", "chan")
      else Seq("row_id", "chan")
    // the feed-rotation term mixes correlations, so its path carries the
    // full 2x2 matrix through the sum regardless of the requested subset
    val sumCorrs =
      if (spec.hasTerm('L')) Seq("XX", "XY", "YX", "YY") else spec.corrs
    val sumCols = sumCorrs.flatMap { c =>
      val x = sampler(c)
      val n = c.toLowerCase
      Seq(Det.fsum(x.re).as(s"${n}_re"), Det.fsum(x.im).as(s"${n}_im"))
    }
    val summed = expanded.groupBy(gKeys.map(col): _*)
      .agg(sumCols.head, sumCols.tail: _*)

    if (spec.hasTerm('L')) {
      import graft.functions.Feeds
      val pa = paDf.get
      val pp = broadcast(pa.select(col("time_index").as("lt"),
        col("ant").as("la"), col("pa").as("pap")))
      val pq = broadcast(pa.select(col("time_index").as("mt"),
        col("ant").as("ma"), col("pa").as("paq")))
      val j = summed
        .join(pp, col("time_index") === col("lt") && col("ant1") === col("la"))
        .join(pq, col("time_index") === col("mt") && col("ant2") === col("ma"))
      val m = Feeds.Jones2x2(
        CxCol(col("xx_re"), col("xx_im")), CxCol(col("xy_re"), col("xy_im")),
        CxCol(col("yx_re"), col("yx_im")), CxCol(col("yy_re"), col("yy_im")))
      val rp = Feeds.feedRotation(col("pap"), "linear")
      val rq = Feeds.feedRotation(col("paq"), "linear")
      val v = Feeds.Jones2x2.mul(Feeds.Jones2x2.mul(rp, m),
        Feeds.Jones2x2.herm(rq))
      val entry = Map("XX" -> v.m00, "XY" -> v.m01, "YX" -> v.m10, "YY" -> v.m11)
      val outCols = spec.corrs.flatMap { c =>
        val n = c.toLowerCase
        Seq(entry(c).re.as(s"${n}_re"), entry(c).im.as(s"${n}_im"))
      }
      j.select((col("row_id") +: col("chan") +: outCols): _*)
    } else if (!spec.hasTerm('G')) summed
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
