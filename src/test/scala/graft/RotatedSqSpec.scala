package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** e19's quantizer contract: codes stay in [0, 15] with non-degenerate
  * spread on both rotated axes, errors are non-negative, and the
  * clamped 16-bucket center-reconstruction quantizer is structurally
  * within half a bucket of its input everywhere in the range. */
class RotatedSqSpec extends AnyFunSuite {
  test("codes in range and non-degenerate; half-bucket bound is structural") {
    val s = TestSpark.spark
    val rows = SparkEntry.queries("e19_rotated_sq")(s, TestSpark.sf)
      .select(col("vec_id"), col("b1"), col("b2"), col("err")).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) <= 15L)
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 15L)
      assert(r.getDouble(3) >= 0.0)
    }
    // rotation earns its keep only if both axes discriminate
    assert(rows.map(_.getLong(1)).distinct.length >= 4, "axis-1 codes degenerate")
    assert(rows.map(_.getLong(2)).distinct.length >= 4, "axis-2 codes degenerate")
    // |x - center(bucket(x))| ≤ range/32 for the clamped uniform
    // quantizer — swept across an asymmetric range including both edges
    val mn = -3.7; val mx = 11.2; val range = mx - mn
    (0 to 997).foreach { i =>
      val x = mn + range * i / 997.0
      val b = math.min(15L, math.floor((x - mn) / range * 16.0).toLong)
      val rc = mn + (b + 0.5) * range / 16.0
      assert(math.abs(x - rc) <= range / 32.0 + 1e-12, s"x=$x b=$b")
    }
  }
}
