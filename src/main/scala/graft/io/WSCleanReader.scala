package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WSClean component-list reader — SURVEY §2.2 M3
  * (africanus/model/wsclean/file_model.py:19-266).
  *
  * Format: a `Format = Name, Type, Ra, Dec, I, SpectralIndex,
  * LogarithmicSI, ReferenceFrequency='<hz>', MajorAxis, MinorAxis,
  * Orientation` header line, then CSV rows where Ra is sexagesimal
  * `h:m:s`, Dec is `d.m.s`, the spectral-index list is bracketed
  * `[a,b,...]`, axes are arcseconds, and empty fields fall back to the
  * header defaults. Sky models are small (thousands of components) — the
  * parse happens driver-side and the result becomes a broadcastable
  * DataFrame, exactly how the reference feeds its predict examples.
  */
object WSCleanReader {

  final case class Component(
      name: String, compType: String, ra: Double, dec: Double, flux: Double,
      spi: Seq[Double], logSI: Boolean, refFreq: Double,
      majorAxis: Double, minorAxis: Double, orientation: Double)

  private val Arcsec2Rad = math.Pi / (180.0 * 3600.0)

  /** `h:m:s` → radians (15 deg per hour). */
  def parseRa(s: String): Double = {
    val Array(h, m, sec) = s.trim.split(":")
    val sign = if (h.trim.startsWith("-")) -1.0 else 1.0
    sign * (math.abs(h.trim.toDouble) + m.toDouble / 60.0 +
      sec.toDouble / 3600.0) * (math.Pi / 12.0)
  }

  /** `d.m.s` (or `d:m:s`) → radians. */
  def parseDec(s: String): Double = {
    val parts = s.trim.split("[.:]", 3) match {
      case Array(d, m, rest) =>
        // rest may itself contain the fractional seconds ("30.5")
        (d, m, rest)
    }
    val sign = if (parts._1.trim.startsWith("-")) -1.0 else 1.0
    sign * (math.abs(parts._1.trim.toDouble) + parts._2.toDouble / 60.0 +
      parts._3.toDouble / 3600.0) * (math.Pi / 180.0)
  }

  /** Split a CSV line, keeping bracketed lists intact. */
  private def splitFields(line: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    line.foreach {
      case '[' => depth += 1; cur += '['
      case ']' => depth -= 1; cur += ']'
      case ',' if depth == 0 => out += cur.result().trim; cur.clear()
      case c => cur += c
    }
    out += cur.result().trim
    out.result()
  }

  def parse(lines: Iterator[String]): Seq[Component] = {
    val it = lines.filter(_.trim.nonEmpty)
    require(it.hasNext, "empty component list")
    val header = it.next()
    require(header.trim.toLowerCase.startsWith("format"),
      s"expected 'Format = ...' header, got: $header")
    val refFreqDefault =
      "ReferenceFrequency='([0-9.eE+]+)'".r.findFirstMatchIn(header)
        .map(_.group(1).toDouble).getOrElse(1e9)
    it.map { line =>
      val f = splitFields(line)
      def get(i: Int): String = if (i < f.length) f(i) else ""
      def dOr(i: Int, dflt: Double): Double =
        if (get(i).isEmpty) dflt else get(i).toDouble
      val spi = get(5) match {
        case "" | "[]" => Seq.empty[Double]
        case b => b.stripPrefix("[").stripSuffix("]").split(",")
          .map(_.trim).filter(_.nonEmpty).map(_.toDouble).toSeq
      }
      Component(
        name = get(0),
        compType = get(1).toUpperCase,
        ra = parseRa(get(2)),
        dec = parseDec(get(3)),
        flux = dOr(4, 0.0),
        spi = spi,
        logSI = get(6).equalsIgnoreCase("true"),
        refFreq = dOr(7, refFreqDefault),
        majorAxis = dOr(8, 0.0) * Arcsec2Rad,
        minorAxis = dOr(9, 0.0) * Arcsec2Rad,
        orientation = dOr(10, 0.0) * math.Pi / 180.0)
    }.toSeq
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val src = scala.io.Source.fromFile(path)
    try parse(src.getLines()).toDF()
    finally src.close()
  }
}
