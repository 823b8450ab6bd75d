package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tigger ASCII sky-model reader — the second sky-model format the
  * reference's flagship predict consumes (via `Tigger.load`,
  * africanus/rime/examples/predict.py:248-347): sources with position,
  * IQUV flux, an optional spectral index + reference frequency, and an
  * optional gaussian shape, split into 'pnt'/'gau' morphologies.
  *
  * Format: a `#format: <col> <col> ...` header names the columns; data
  * rows are whitespace-separated, `#`-prefixed lines are comments. Column
  * names carry unit suffixes: `_rad`, `_d` (degrees), `_h` (hours),
  * `_m` (arcminutes), `_s` (arcseconds) — all converted to radians.
  * Missing trailing fields default (flux 0, spi 0, shape 0). A source is
  * 'gau' when a `type` column says so or when either extent is non-zero.
  */
object TiggerReader {

  final case class TiggerSource(
      name: String, typecode: String, ra: Double, dec: Double,
      i: Double, q: Double, u: Double, v: Double,
      spi: Double, freq0: Double,
      emaj: Double, emin: Double, pa: Double)

  private def angleScale(suffix: String): Double = suffix match {
    case "rad" => 1.0
    case "d" => math.Pi / 180.0
    case "h" => math.Pi / 12.0
    case "m" => math.Pi / (180.0 * 60.0)
    case "s" => math.Pi / (180.0 * 3600.0)
    case other => throw new IllegalArgumentException(s"unknown unit '$other'")
  }

  /** (base column name, multiplier to radians or 1.0). */
  private def colSpec(token: String): (String, Double) = {
    val t = token.trim.toLowerCase
    val i = t.lastIndexOf('_')
    if (i > 0) {
      val (base, suffix) = (t.substring(0, i), t.substring(i + 1))
      if (Set("ra", "dec", "emaj", "emin", "pa").contains(base))
        (base, angleScale(suffix))
      else (t, 1.0)
    } else (t, 1.0)
  }

  def parse(lines: Iterator[String], defaultFreq0: Double = 1.4e9): Seq[TiggerSource] = {
    val all = lines.toSeq
    val fmt = all.map(_.trim).find(_.toLowerCase.startsWith("#format:"))
      .getOrElse(throw new IllegalArgumentException("no '#format:' header line"))
    val specs = fmt.substring("#format:".length).trim
      .split("\\s+").toSeq.map(colSpec)
    all.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { line =>
        val f = line.split("\\s+")
        val vals = specs.zipWithIndex.map { case ((base, scale), i) =>
          base -> (if (i < f.length) Some((f(i), scale)) else None)
        }.toMap
        def num(base: String, dflt: Double): Double = vals.get(base).flatten
          .map { case (s, scale) => s.toDouble * scale }.getOrElse(dflt)
        def str(base: String, dflt: String): String = vals.get(base).flatten
          .map(_._1).getOrElse(dflt)
        val emaj = num("emaj", 0.0); val emin = num("emin", 0.0)
        val explicit = str("type", "").toLowerCase
        val typecode =
          if (explicit.nonEmpty) explicit
          else if (emaj != 0.0 || emin != 0.0) "gau"
          else "pnt"
        require(typecode == "pnt" || typecode == "gau",
          s"unknown source morphology '$typecode'")
        TiggerSource(
          name = str("name", ""), typecode = typecode,
          ra = num("ra", 0.0), dec = num("dec", 0.0),
          i = num("i", 0.0), q = num("q", 0.0),
          u = num("u", 0.0), v = num("v", 0.0),
          spi = num("spi", 0.0), freq0 = num("freq0", defaultFreq0),
          emaj = emaj, emin = emin, pa = num("pa", 0.0))
      }
  }

  def read(spark: SparkSession, path: String,
           defaultFreq0: Double = 1.4e9): DataFrame = {
    import spark.implicits._
    val src = scala.io.Source.fromFile(path)
    try parse(src.getLines(), defaultFreq0).toDF()
    finally src.close()
  }
}
