package graft.io

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 face of the FITS reader — the `spark.read.format`
  * integration a user of the reference's file-based entry points
  * (beam cubes `util/beams.py`, model images `dft/examples/
  * predict_from_fits.py`) expects from a Spark-native engine:
  *
  * {{{
  *   spark.read.format("fits").load("/path/beam.fits")
  *   // => (path string, plane long, y long, x long, value double)
  * }}}
  *
  * Each file becomes ONE input partition (FITS primary HDUs are
  * monolithic big-endian arrays; parallelism comes from the file set —
  * e.g. the 8 per-corr/reim cube files of a beam schema — not intra-file
  * splits). Axes 1/2 map to x/y and all higher axes are linearized into
  * `plane`, matching `Fits.BeamCube`'s layout. Column pruning is pushed
  * into the reader (`SupportsPushDownRequiredColumns`): a query that
  * never touches `path` or `plane` materializes only what it reads.
  * Multiple files: `.load(p1, p2, ...)` (Spark passes a JSON "paths"
  * array) or a comma-free single "path" option.
  */
class FitsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "fits"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FitsSource.Schema

  // writes carry their own (plane, y, x, value) schema — without this,
  // Spark validates the written frame against the READ schema and demands
  // a `path` column the writer synthesizes itself
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FitsTable(FitsSource.paths(properties), schema,
      FitsSource.extraCards(properties))
}

object FitsSource {
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("plane", LongType, nullable = false),
    StructField("y", LongType, nullable = false),
    StructField("x", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** Spark encodes `.load(p…)` as a JSON array under "paths" (single
    * path: a bare "path" entry). The fixture paths carry no quotes or
    * escapes, so a quoted-string scan is a faithful parse. */
  private[io] def paths(properties: util.Map[String, String]): Seq[String] = {
    val multi = Option(properties.get("paths")).toSeq.flatMap { js =>
      "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(js).map(_.group(1)).toSeq
    }
    val single = Option(properties.get("path")).toSeq
    val all = (multi ++ single).distinct
    require(all.nonEmpty, "fits source: no path given — use .load(path)")
    all
  }

  /** Write option `cards`: newline-separated `KEY=VALUE` header cards
    * appended after the geometry cards the sink derives itself — how a
    * writer carries WCS/metadata (CTYPE/CRPIX/CDELT/GFREQn/...) into the
    * file, e.g. the MeqTrees-compliant cubes [[BeamFactory]] emits.
    * String values must arrive pre-quoted FITS-style (`'X'`). */
  private[io] def extraCards(properties: util.Map[String, String]): Seq[(String, String)] =
    Option(properties.get("cards")).toSeq.flatMap(_.split("\n").toSeq)
      .map(_.trim).filter(_.nonEmpty)
      .map { line =>
        val i = line.indexOf('=')
        require(i > 0, s"fits sink: malformed card '$line' (KEY=VALUE)")
        (line.take(i).trim, line.drop(i + 1).trim)
      }
}

private[io] class FitsTable(paths: Seq[String], tableSchema: StructType,
                            extraCards: Seq[(String, String)])
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"fits(${paths.mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FitsScanBuilder(paths)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new FitsWriteBuilder(paths.head, info.schema(), extraCards)
}

/** Write face: `df.write.format("fits").save(dir)` — every input
  * PARTITION becomes one `part-<pid>.fits` primary HDU under `dir`.
  * Rows must carry (plane, y, x, value); the caller repartitions so each
  * partition holds exactly one complete image (the imaging pipeline's
  * per-plane / per-facet layout). Dims are inferred from the max indices
  * at commit, so the writer buffers one image — images are grid-sized by
  * design, never data-sized. Truncate (mode Overwrite) deletes every
  * existing part-*.fits under the target before the new write starts, so
  * a rewrite with FEWER partitions leaves no stale images behind for a
  * directory-listing consumer. */
private[io] class FitsWriteBuilder(dir: String, schema: StructType,
                                   extraCards: Seq[(String, String)])
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new FitsBatchWrite(dir, schema, doTruncate, extraCards)
  }
}

private[io] class FitsBatchWrite(dir: String, schema: StructType,
                                 truncate: Boolean,
                                 extraCards: Seq[(String, String)])
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val d = new java.io.File(dir)
    d.mkdirs()
    if (truncate) {
      val stale = Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".fits"))
      stale.foreach(_.delete())
    }
    new FitsWriterFactory(dir, schema, extraCards)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[io] class FitsWriterFactory(dir: String, schema: StructType,
                                    extraCards: Seq[(String, String)])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new FitsDataWriter(s"$dir/part-$partitionId.fits", schema, extraCards)
}

private[io] case class FitsCommit(path: String, pixels: Long)
    extends WriterCommitMessage

private[io] class FitsDataWriter(path: String, schema: StructType,
                                 extraCards: Seq[(String, String)])
    extends DataWriter[InternalRow] {
  private val iPlane = schema.fieldIndex("plane")
  private val iY = schema.fieldIndex("y")
  private val iX = schema.fieldIndex("x")
  private val iV = schema.fieldIndex("value")
  private val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
  private var nx = 0L
  private var ny = 0L
  private var np = 0L

  override def write(record: InternalRow): Unit = {
    val p = record.getLong(iPlane); val y = record.getLong(iY)
    val x = record.getLong(iX); val v = record.getDouble(iV)
    require(p < (1L << 23) && y < (1L << 20) && x < (1L << 20),
      s"fits sink: index out of packing range (plane=$p y=$y x=$x)")
    nx = math.max(nx, x + 1); ny = math.max(ny, y + 1)
    np = math.max(np, p + 1)
    // dims are unknown until the last row, so buffer (packed index, value)
    // and linearize at commit
    buf += (((p << 40) | (y << 20) | x, v))
  }

  override def commit(): WriterCommitMessage = {
    val n = (np * ny * nx).toInt
    val data = new Array[Double](n)
    for ((key, v) <- buf) {
      val p = key >> 40; val y = (key >> 20) & 0xfffff; val x = key & 0xfffff
      data(((p * ny + y) * nx + x).toInt) = v
    }
    Fits.write(path, Seq(
      "SIMPLE" -> "T", "BITPIX" -> "-64",
      "NAXIS" -> (if (np > 1) "3" else "2"),
      "NAXIS1" -> nx.toString, "NAXIS2" -> ny.toString) ++
      (if (np > 1) Seq("NAXIS3" -> np.toString) else Nil) ++
      extraCards, data)
    FitsCommit(path, buf.length.toLong)
  }

  override def abort(): Unit = ()
  override def close(): Unit = ()
}

private[io] class FitsScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = FitsSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new FitsScan(paths, required)
}

private[io] class FitsScan(paths: Seq[String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(FitsInputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new FitsReaderFactory(required)
}

private[io] case class FitsInputPartition(path: String) extends InputPartition

private[io] class FitsReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FitsPartitionReader(
      partition.asInstanceOf[FitsInputPartition].path, required)

  // vectorized path: FITS pixels are a dense primitive array, the
  // natural shape for ColumnarBatch — Spark then runs the scan through
  // the same columnar pipeline as parquet (ColumnarToRow only where a
  // row consumer needs it)
  override def supportColumnarReads(partition: InputPartition): Boolean = true
  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new FitsColumnarReader(
      partition.asInstanceOf[FitsInputPartition].path, required)
}

private[io] class FitsColumnarReader(path: String, required: StructType)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

  private val BatchRows = 4096
  private var hdu: Fits.Hdu = _
  private var nx = 0
  private var ny = 0
  private var offset = 0
  private val pathBytes = path.getBytes("UTF-8")
  private var batch: ColumnarBatch = _
  private var vectors: Array[OnHeapColumnVector] = _

  override def next(): Boolean = {
    if (hdu == null) {
      hdu = Fits.read(path)
      nx = if (hdu.naxis.nonEmpty) hdu.naxis.head else 1
      ny = if (hdu.naxis.length > 1) hdu.naxis(1) else 1
      vectors = OnHeapColumnVector.allocateColumns(BatchRows, required)
      batch = new ColumnarBatch(vectors.map(_.asInstanceOf[ColumnVector]))
    }
    if (offset >= hdu.data.length) return false
    val n = math.min(BatchRows, hdu.data.length - offset)
    var c = 0
    while (c < required.fields.length) {
      val v = vectors(c)
      v.reset()
      required.fields(c).name match {
        case "path" =>
          var r = 0
          while (r < n) { v.putByteArray(r, pathBytes); r += 1 }
        case "plane" =>
          var r = 0
          while (r < n) { v.putLong(r, ((offset + r) / (nx * ny)).toLong); r += 1 }
        case "y" =>
          var r = 0
          while (r < n) { v.putLong(r, (((offset + r) / nx) % ny).toLong); r += 1 }
        case "x" =>
          var r = 0
          while (r < n) { v.putLong(r, ((offset + r) % nx).toLong); r += 1 }
        case "value" =>
          var r = 0
          while (r < n) { v.putDouble(r, hdu.data(offset + r)); r += 1 }
      }
      c += 1
    }
    batch.setNumRows(n)
    offset += n
    true
  }

  override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = batch

  override def close(): Unit = if (batch != null) batch.close()
}

private[io] class FitsPartitionReader(path: String, required: StructType)
    extends PartitionReader[InternalRow] {
  // the HDU loads lazily on the executor at first next(), not at planning
  private var hdu: Fits.Hdu = _
  private var nx = 0
  private var ny = 0
  private var i = -1
  private val fields = required.fieldNames

  override def next(): Boolean = {
    if (hdu == null) {
      hdu = Fits.read(path)
      nx = if (hdu.naxis.nonEmpty) hdu.naxis.head else 1
      ny = if (hdu.naxis.length > 1) hdu.naxis(1) else 1
    }
    i += 1
    i < hdu.data.length
  }

  override def get(): InternalRow = {
    val vals = fields.map {
      case "path"  => UTF8String.fromString(path)
      case "plane" => (i / (nx * ny)).toLong
      case "y"     => ((i / nx) % ny).toLong
      case "x"     => (i % nx).toLong
      case "value" => hdu.data(i)
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = ()
}
