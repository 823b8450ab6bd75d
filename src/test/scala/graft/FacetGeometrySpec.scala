package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.FacetGeometry._

/** L2 facet-planning geometry (africanus/linalg/geometry.py). */
class FacetGeometrySpec extends AnyFunSuite {

  test("monotone-chain hull of a noisy square is the square") {
    val pts: Seq[Pt] = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0),
      (2.0, 2.0), (1.0, 3.0), (3.0, 1.0)) // interior points must vanish
    val h = convexHull(pts)
    assert(h.toSet === Set((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)))
    assert(area(h) === 16.0)
    assert(circumference(h) === 16.0)
  }

  test("containment and separating-axis overlap") {
    val sq = convexHull(Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)))
    assert(contains(sq, (2.0, 2.0)))
    assert(!contains(sq, (9.0, 2.0), tol = 0.0))
    val tri = convexHull(Seq((3.0, 3.0), (6.0, 3.0), (3.0, 6.0)))
    val far = convexHull(Seq((10.0, 10.0), (12.0, 10.0), (10.0, 12.0)))
    assert(overlaps(sq, tri))
    assert(!overlaps(sq, far, minSep = 0.0))
  }

  test("SplitBox tiles exactly: disjoint and covering, remainder at edges") {
    val b = BBox(0, 10, 0, 6) // 11 x 7 pixels
    val subs = splitBox(b, 3, 2)
    assert(subs.size === 6)
    // covering + disjoint over every pixel
    for (x <- 0L to 10L; y <- 0L to 6L)
      assert(subs.count(_.contains(x, y)) === 1, s"pixel ($x, $y)")
    // remainder absorbed by the last row/column of boxes
    assert(subs.map(s => s.nx * s.ny).sum === 11L * 7L)
  }

  test("PadBox grows around the centre to the requested shape") {
    val b = BBox(4, 7, 10, 12) // 4 x 3
    val p = padBox(b, 8, 7)
    assert(p.nx === 8 && p.ny === 7)
    // original box contained
    for (x <- 4L to 7L; y <- 10L to 12L) assert(p.contains(x, y))
  }

  test("AABB snaps fractional extrema outward") {
    val b = aabb(Seq((1.2, -0.7), (3.8, 2.1)))
    assert(b === BBox(1, 4, -1, 3))
  }

  test("l02 edge lengths stay far from their 1e-6 round boundaries") {
    // l02 hashes per-edge round(len*1e6) where the Spark side computes
    // hypot and the oracle sqrt(dx^2+dy^2) -- 1-ulp apart at worst. A
    // flip needs an edge length within that noise of a .5 boundary;
    // measure the minimum margin over every facet's octagon edges.
    var minM = Double.MaxValue
    for (k <- 0L until 20L) {
      val cx = (k * 3 % 7).toDouble; val cy = (k * 5 % 9).toDouble
      val w = (k % 5 + 2).toDouble; val h = (k % 3 + 1).toDouble
      val a = w + 1; val b2 = h + 1
      val oct = Seq((cx + a, cy), (cx + w, cy + h), (cx, cy + b2),
        (cx - w, cy + h), (cx - a, cy), (cx - w, cy - h), (cx, cy - b2),
        (cx + w, cy - h))
      for (i <- oct.indices) {
        val (x1, y1) = oct(i); val (x2, y2) = oct((i + 1) % 8)
        val t = math.hypot(x2 - x1, y2 - y1) * 1e6
        minM = math.min(minM, math.abs(t - math.floor(t) - 0.5))
      }
    }
    info(s"l02 edge min |frac(len*1e6)-.5| = $minM")
    assert(minM > 1e-6, s"an l02 edge sits within 1e-6 of a round boundary")
  }
}
