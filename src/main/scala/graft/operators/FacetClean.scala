package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Facet-parallel CLEAN — the distributed shape of SURVEY §2.8 I1: the sky
  * is split into facets (the reference's geometry utilities §2.9 L2 plan
  * these), each facet's image fits one executor, and the inherently
  * sequential Hogbom loop runs per facet via flatMapGroups — perfectly
  * parallel across facets, sequential within.
  */
object FacetClean {

  /** df columns: facet_id (long), x, y (int pixel coords), value (double).
    * Pixels of one facet form an (nx x ny) image. Returns one row per
    * clean component: (facet_id, x, y, flux). */
  def clean(df: DataFrame, nx: Int, ny: Int, psf: Array[Double], psfHalf: Int,
            gamma: Double, threshold: Double, maxIter: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("facet_id").cast("long"), col("x").cast("int"),
        col("y").cast("int"), col("value").cast("double"))
      .as[(Long, Int, Int, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (facet, pixels) =>
        val img = new Array[Double](nx * ny)
        pixels.foreach(p => img(p._2 * ny + p._3) = p._4)
        val r = Deconv.hogbomClean(img, nx, ny, psf, psfHalf,
          gamma, threshold, maxIter)
        r.components.iterator.map { case (x, y, f) => (facet, x, y, f) }
      }
      .toDF("facet_id", "x", "y", "flux")
  }
}
