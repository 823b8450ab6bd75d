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

  final class MissingConversionInputs(msg: String)
    extends IllegalArgumentException(msg)
  final class DimensionMismatch(msg: String)
    extends IllegalArgumentException(msg)

  /** CASA stokes enumeration (casacore Stokes.h order; the reference's
    * STOKES_TYPES, africanus/util/casa_types.py:4-44). Index IS the id. */
  val StokesTypes: Seq[String] = Seq(
    "Undefined", "I", "Q", "U", "V", "RR", "RL", "LR", "LL",
    "XX", "XY", "YX", "YY", "RX", "RY", "LX", "LY", "XR", "XL", "YR", "YL",
    "PP", "PQ", "QP", "QQ", "RCircular", "LCircular", "Linear",
    "Ptotal", "Plinear", "PFtotal", "PFlinear", "Pangle")
  private val idToName: Map[Int, String] = StokesTypes.zipWithIndex
    .map { case (n, i) => i -> n }.toMap

  /** (a+bi)/2i = b/2 - (a/2)i. */
  private def divTwoI(z: CxCol): CxCol = CxCol(z.im / lit(2.0), -z.re / lit(2.0))

  /** Conversion tables (conversion.py:19-48). Each target lists candidate
    * (c1, c2, fn) derivations, tried in declaration order. */
  private val two = lit(2.0)
  private type Fn = (CxCol, CxCol) => CxCol
  private val stokesToCorr: Map[String, Seq[(String, String, Fn)]] = Map(
    "RR" -> Seq(("I", "V", (i: CxCol, v: CxCol) => i + v)),
    "RL" -> Seq(("Q", "U", (q: CxCol, u: CxCol) => q + (Cx.i * u))),
    "LR" -> Seq(("Q", "U", (q: CxCol, u: CxCol) => q - (Cx.i * u))),
    "LL" -> Seq(("I", "V", (i: CxCol, v: CxCol) => i - v)),
    "XX" -> Seq(("I", "Q", (i: CxCol, q: CxCol) => i + q)),
    "XY" -> Seq(("U", "V", (u: CxCol, v: CxCol) => u + (Cx.i * v))),
    "YX" -> Seq(("U", "V", (u: CxCol, v: CxCol) => u - (Cx.i * v))),
    "YY" -> Seq(("I", "Q", (i: CxCol, q: CxCol) => i - q)))
  private val corrToStokes: Map[String, Seq[(String, String, Fn)]] = Map(
    "I" -> Seq(
      ("XX", "YY", (a: CxCol, b: CxCol) => (a + b) / two),
      ("RR", "LL", (a: CxCol, b: CxCol) => (a + b) / two)),
    "Q" -> Seq(
      ("XX", "YY", (a: CxCol, b: CxCol) => (a - b) / two),
      ("RL", "LR", (a: CxCol, b: CxCol) => (a + b) / two)),
    "U" -> Seq(
      ("XY", "YX", (a: CxCol, b: CxCol) => (a + b) / two),
      ("RL", "LR", (a: CxCol, b: CxCol) => divTwoI(a - b))),
    "V" -> Seq(
      ("XY", "YX", (a: CxCol, b: CxCol) => divTwoI(a - b)),
      ("RR", "LL", (a: CxCol, b: CxCol) => (a - b) / two)))
  private val conversionSchema = stokesToCorr ++ corrToStokes

  /** Flatten a (possibly nested) correlation schema into leaf names in
    * traversal order. Elements are component name strings OR CASA integer
    * ids; nesting must be rectangular (conversion.py:94-142). */
  def elementNames(schema: Any): Seq[String] = {
    val shape = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(node: Any, depth: Int): Unit = node match {
      case s: Seq[_] =>
        if (shape.size <= depth) shape += s.size
        else if (shape(depth) != s.size)
          throw new DimensionMismatch(
            s"Dimension mismatch ${shape(depth)} != ${s.size} at depth $depth")
        s.foreach(walk(_, depth + 1))
      case name: String =>
        if (out.contains(name))
          throw new IllegalArgumentException(s"'$name' defined multiple times")
        out += name
      case id: Int =>
        val name = idToName.getOrElse(id,
          throw new IllegalArgumentException(s"Invalid CASA stokes id '$id'"))
        if (out.contains(name))
          throw new IllegalArgumentException(s"'$name' defined multiple times")
        out += name
      case other =>
        throw new IllegalArgumentException(s"Invalid schema element '$other'")
    }
    walk(schema match { case s: Seq[_] => s; case e => Seq(e) }, 0)
    out.toSeq
  }

  /** Schema-driven conversion planner (conversion.py:145-230): for every
    * output leaf pick the derivation with the most REAL inputs; when
    * `implicitStokes` is set, missing stokes default to zero for
    * stokes→corr outputs (['I'] → ['XX','XY','YX','YY'] becomes legal).
    * `input` supplies complex columns in flattened inputSchema order.
    * Throws MissingConversionInputs when no derivation is satisfiable. */
  def convertSchema(input: Seq[CxCol], inputSchema: Any, outputSchema: Any,
                    implicitStokes: Boolean = false): Seq[(String, CxCol)] = {
    val inNames = elementNames(inputSchema)
    require(inNames.size == input.size,
      s"input has ${input.size} columns but schema has ${inNames.size} leaves")
    val byName: Map[String, CxCol] = inNames.zip(input).toMap
    elementNames(outputSchema).map { okey =>
      val deps = conversionSchema.getOrElse(okey,
        throw new IllegalArgumentException(
          s"Unknown output $okey. Known outputs: ${conversionSchema.keys.mkString(",")}"))
      val canDefault = implicitStokes && stokesToCorr.contains(okey)
      // candidate = (number of real inputs, expression); stable order keeps
      // the table's declaration priority among equals
      val candidates = deps.flatMap { case (c1, c2, fn) =>
        val a = byName.get(c1)
        val b = byName.get(c2)
        if ((a.isDefined || canDefault) && (b.isDefined || canDefault))
          Some((a.size + b.size,
            fn(a.getOrElse(Cx.zero), b.getOrElse(Cx.zero))))
        else None
      }
      if (candidates.isEmpty)
        throw new MissingConversionInputs(
          s"None of the supplied inputs '${inNames.mkString(",")}' can " +
            s"produce output '$okey'. It can be produced by " +
            deps.map { case (a, b, _) => s"($a,$b)" }.mkString(","))
      okey -> candidates.maxBy(_._1)._2
    }
  }

  /** Convert the available components in `in` to the requested `targets` —
    * thin wrapper over [[convertSchema]] with flat schemas and an identity
    * fallback for targets already present in the input. */
  def convert(in: Map[String, CxCol], targets: Seq[String]): Seq[(String, CxCol)] = {
    val (names, cols) = in.toSeq.unzip
    targets.map { t =>
      in.get(t) match {
        case Some(z) => t -> z
        case None => convertSchema(cols, names, Seq(t)).head
      }
    }
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
