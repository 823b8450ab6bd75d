package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.FacetClean

class FacetCleanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("facets clean independently and recover their point fluxes") {
    import spark.implicits._
    // facet 0: source at (1,2) flux 1.0; facet 1: sources at (3,3)=0.5, (0,1)=0.25
    val pixels = Seq(
      (0L, 1, 2, 1.0),
      (1L, 3, 3, 0.5), (1L, 0, 1, 0.25))
    val df = pixels.toDF("facet_id", "x", "y", "value")
    val psf = Array(0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0)
    val comps = FacetClean.clean(df, 6, 6, psf, 1,
        gamma = 0.5, threshold = 1e-6, maxIter = 200)
      .collect()
      .groupBy(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .view.mapValues(_.map(_.getDouble(3)).sum).toMap
    assert(math.abs(comps((0L, 1, 2)) - 1.0) < 1e-5)
    assert(math.abs(comps((1L, 3, 3)) - 0.5) < 1e-5)
    assert(math.abs(comps((1L, 0, 1)) - 0.25) < 1e-5)
    assert(comps.keySet === Set((0L, 1, 2), (1L, 3, 3), (1L, 0, 1)))
  }
}
