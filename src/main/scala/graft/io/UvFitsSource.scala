package graft.io

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 face of the UVFITS reader:
  *
  * {{{
  *   spark.read.format("uvfits").load("/path/obs.uvfits")
  *   // => (path, row_id, chan, stokes, u, v, w, ant1, ant2, jd,
  *   //     re, im, weight)
  * }}}
  *
  * One input partition per file (random-groups HDUs are monolithic;
  * archives split observations across files, which is where the
  * parallelism lives — same shape as [[FitsSource]]). u/v/w are the
  * UVFITS native SECONDS (multiply by frequency for wavelengths, by c
  * for metres); BASELINE decodes to (ant1, ant2); the COMPLEX axis
  * unpacks to (re, im, weight) per (group, chan, stokes) row. Column
  * pruning is pushed into the reader. */
class UvFitsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "uvfits"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    UvFitsSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new UvFitsTable(FitsSource.paths(properties))
}

object UvFitsSource {
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("row_id", LongType, nullable = false),
    StructField("chan", LongType, nullable = false),
    StructField("stokes", LongType, nullable = false),
    StructField("u", DoubleType, nullable = false),
    StructField("v", DoubleType, nullable = false),
    StructField("w", DoubleType, nullable = false),
    StructField("ant1", LongType, nullable = false),
    StructField("ant2", LongType, nullable = false),
    StructField("jd", DoubleType, nullable = false),
    StructField("re", DoubleType, nullable = false),
    StructField("im", DoubleType, nullable = false),
    StructField("weight", DoubleType, nullable = false)))
}

private[io] class UvFitsTable(paths: Seq[String])
    extends Table with SupportsRead {
  override def name(): String = s"uvfits(${paths.mkString(",")})"
  override def schema(): StructType = UvFitsSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new UvFitsScanBuilder(paths)
}

private[io] class UvFitsScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = UvFitsSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new UvFitsScan(paths, required)
}

private[io] class UvFitsScan(paths: Seq[String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(UvFitsInputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new UvFitsReaderFactory(required)
}

private[io] case class UvFitsInputPartition(path: String) extends InputPartition

private[io] class UvFitsReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new UvFitsPartitionReader(
      partition.asInstanceOf[UvFitsInputPartition].path, required)
}

private[io] class UvFitsPartitionReader(path: String, required: StructType)
    extends PartitionReader[InternalRow] {
  private val g = UvFits.readGroups(path)

  // axis roles from CTYPE2..N (canonical UVFITS: COMPLEX, STOKES, FREQ,
  // then degenerate RA/DEC axes)
  private val axisNames = g.shape.indices.map(k =>
    g.cards.getOrElse(s"CTYPE${k + 2}", ""))
  private def axis(name: String): Int = {
    val i = axisNames.indexWhere(_.equalsIgnoreCase(name))
    require(i >= 0, s"uvfits: no $name axis in $axisNames")
    i
  }
  private val cxAx = axis("COMPLEX")
  private val stAx = axis("STOKES")
  private val fqAx = axis("FREQ")
  require(g.shape(cxAx) >= 2, "COMPLEX axis needs at least (re, im)")
  private val hasWeight = g.shape(cxAx) >= 3
  private val nStokes = g.shape(stAx)
  private val nChan = g.shape(fqAx)

  // strides of the X-fastest (NAXIS2 first) flattening
  private val strides: Array[Int] = {
    val s = new Array[Int](g.shape.length)
    var acc = 1
    for (k <- g.shape.indices) { s(k) = acc; acc *= g.shape(k) }
    s
  }
  private def flat(cx: Int, st: Int, ch: Int): Int =
    cx * strides(cxAx) + st * strides(stAx) + ch * strides(fqAx)

  private val total = g.gcount.toLong * nChan * nStokes
  private var i = -1L
  override def next(): Boolean = { i += 1; i < total }

  // A monolithic archive HDU expands to (group × chan × stokes) ~1e8 rows,
  // so nothing per-row may re-scan PTYPEs, re-match column-name strings, or
  // allocate: parameter indices and one extractor per REQUIRED column are
  // resolved once here, the BASELINE decode is cached per group (it is
  // chan/stokes-invariant), and get() refills a single reused row buffer.
  private def paramIdx(name: String): Array[Int] = {
    val idxs = g.ptypes.zipWithIndex.collect {
      case (t, k) if t.equalsIgnoreCase(name) => k
    }.toArray
    require(idxs.nonEmpty, s"uvfits: no group parameter '$name' in ${g.ptypes}")
    idxs
  }
  // repeated PTYPEs (the split-DATE convention) sum their occurrences
  private def sumParams(idxs: Array[Int], grp: Int): Double = {
    val p = g.params(grp)
    var s = 0.0; var k = 0
    while (k < idxs.length) { s += p(idxs(k)); k += 1 }
    s
  }
  private val pathStr = UTF8String.fromString(path)
  private lazy val blIdx = paramIdx("BASELINE")
  private var blGrp = -1
  private var blA1 = 0L
  private var blA2 = 0L
  private def decodeAnts(grp: Int): Unit = if (grp != blGrp) {
    val (a1, a2) = UvFits.decodeBaseline(sumParams(blIdx, grp))
    blA1 = a1.toLong; blA2 = a2.toLong; blGrp = grp
  }

  private val extractors: Array[(Int, Int, Int) => Any] =
    required.fields.map(_.name).map[(Int, Int, Int) => Any] {
      case "path" => (_, _, _) => pathStr
      case "row_id" => (grp, _, _) => grp.toLong
      case "chan" => (_, ch, _) => ch.toLong
      case "stokes" => (_, _, st) => st.toLong
      case "u" => val ix = paramIdx("UU"); (grp, _, _) => sumParams(ix, grp)
      case "v" => val ix = paramIdx("VV"); (grp, _, _) => sumParams(ix, grp)
      case "w" => val ix = paramIdx("WW"); (grp, _, _) => sumParams(ix, grp)
      case "ant1" => (grp, _, _) => { decodeAnts(grp); blA1 }
      case "ant2" => (grp, _, _) => { decodeAnts(grp); blA2 }
      case "jd" => val ix = paramIdx("DATE"); (grp, _, _) => sumParams(ix, grp)
      case "re" => (grp, ch, st) => g.datum(grp, flat(0, st, ch))
      case "im" => (grp, ch, st) => g.datum(grp, flat(1, st, ch))
      case "weight" =>
        if (hasWeight) (grp, ch, st) => g.datum(grp, flat(2, st, ch))
        else (_, _, _) => 1.0
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
  private val rowVals = new Array[Any](extractors.length)
  private val row =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rowVals)

  override def get(): InternalRow = {
    val grp = (i / (nChan * nStokes)).toInt
    val rem = (i % (nChan * nStokes)).toInt
    val ch = rem / nStokes
    val st = rem % nStokes
    var k = 0
    while (k < extractors.length) {
      rowVals(k) = extractors(k)(grp, ch, st); k += 1
    }
    row
  }

  override def close(): Unit = ()
}
