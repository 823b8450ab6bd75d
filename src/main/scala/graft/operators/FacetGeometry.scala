package graft.operators

/** Facet-planning geometry — SURVEY §2.9 L2
  * (africanus/linalg/geometry.py:33-750: BoundingConvexHull, BoundingBox,
  * BoundingBoxFactory). Driver-side planning math, like the reference: the
  * hulls/boxes describe image facets; the distributed work they gate runs
  * through the facet-parallel operators (FacetClean, WStack).
  *
  * Algorithms are the standard public ones: Andrew monotone chain for the
  * hull, shoelace area, separating-axis overlap on edge normals (the
  * reference's normals + projection test), half-plane containment.
  */
object FacetGeometry {

  type Pt = (Double, Double)

  /** Convex hull in counter-clockwise order (Andrew monotone chain). */
  def convexHull(points: Seq[Pt]): Seq[Pt] = {
    val ps = points.distinct.sorted
    if (ps.size <= 2) return ps
    def cross(o: Pt, a: Pt, b: Pt): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def half(src: Seq[Pt]): Seq[Pt] = {
      val h = scala.collection.mutable.ArrayBuffer.empty[Pt]
      for (p <- src) {
        while (h.size >= 2 && cross(h(h.size - 2), h(h.size - 1), p) <= 0)
          h.remove(h.size - 1)
        h += p
      }
      h.remove(h.size - 1)
      h.toSeq
    }
    half(ps) ++ half(ps.reverse)
  }

  /** Shoelace area of a CCW polygon (geometry.py:324-332). */
  def area(hull: Seq[Pt]): Double =
    0.5 * math.abs(hull.indices.map { i =>
      val (x1, y1) = hull(i); val (x2, y2) = hull((i + 1) % hull.size)
      x1 * y2 - x2 * y1
    }.sum)

  /** Perimeter (geometry.py:318-322). */
  def circumference(hull: Seq[Pt]): Double =
    hull.indices.map { i =>
      val (x1, y1) = hull(i); val (x2, y2) = hull((i + 1) % hull.size)
      math.hypot(x2 - x1, y2 - y1)
    }.sum

  /** Point-in-hull via half-plane signs (geometry.py:431-451). */
  def contains(hull: Seq[Pt], p: Pt, tol: Double = 0.5): Boolean =
    hull.indices.forall { i =>
      val (x1, y1) = hull(i); val (x2, y2) = hull((i + 1) % hull.size)
      (x2 - x1) * (p._2 - y1) - (y2 - y1) * (p._1 - x1) >= -tol
    }

  /** Hull-hull overlap via the separating-axis test on both hulls' edge
    * normals (geometry.py:386-418). */
  def overlaps(a: Seq[Pt], b: Seq[Pt], minSep: Double = 0.5): Boolean = {
    def axes(h: Seq[Pt]): Seq[Pt] = h.indices.map { i =>
      val (x1, y1) = h(i); val (x2, y2) = h((i + 1) % h.size)
      (-(y2 - y1), x2 - x1)
    }
    (axes(a) ++ axes(b)).forall { case (nx, ny) =>
      val pa = a.map(p => p._1 * nx + p._2 * ny)
      val pb = b.map(p => p._1 * nx + p._2 * ny)
      pa.min - minSep <= pb.max && pb.min - minSep <= pa.max
    }
  }

  /** Axis-aligned box [xl, xu] × [yl, yu] (inclusive pixel bounds). */
  final case class BBox(xl: Long, xu: Long, yl: Long, yu: Long,
                        name: String = "unnamed") {
    require(xu >= xl && yu >= yl, s"degenerate box $this")
    def nx: Long = xu - xl + 1
    def ny: Long = yu - yl + 1
    def corners: Seq[Pt] = Seq(
      (xl.toDouble, yl.toDouble), (xu.toDouble, yl.toDouble),
      (xu.toDouble, yu.toDouble), (xl.toDouble, yu.toDouble))
    def contains(x: Long, y: Long): Boolean =
      x >= xl && x <= xu && y >= yl && y <= yu
  }

  /** AABB of a point set (BoundingBoxFactory.AxisAlignedBoundingBox). */
  def aabb(points: Seq[Pt], name: String = "unnamed"): BBox = BBox(
    math.floor(points.map(_._1).min).toLong,
    math.ceil(points.map(_._1).max).toLong,
    math.floor(points.map(_._2).min).toLong,
    math.ceil(points.map(_._2).max).toLong, name)

  /** Tessellate into nx × ny subboxes (BoundingBoxFactory.SplitBox,
    * geometry.py:659-721): subboxes tile the parent exactly — disjoint,
    * covering, edge boxes absorb the remainder. */
  def splitBox(b: BBox, nxSub: Int, nySub: Int): Seq[BBox] = {
    require(nxSub >= 1 && nySub >= 1)
    val xw = b.nx / nxSub; val yw = b.ny / nySub
    require(xw >= 1 && yw >= 1, s"box $b too small for $nxSub x $nySub")
    for (i <- 0 until nxSub; j <- 0 until nySub) yield BBox(
      b.xl + i * xw,
      if (i == nxSub - 1) b.xu else b.xl + (i + 1) * xw - 1,
      b.yl + j * yw,
      if (j == nySub - 1) b.yu else b.yl + (j + 1) * yw - 1,
      s"${b.name}[$i,$j]")
  }

  /** Grow to a desired size around the centre
    * (BoundingBoxFactory.PadBox, geometry.py:723-749). */
  def padBox(b: BBox, nx: Long, ny: Long): BBox = {
    require(nx >= b.nx && ny >= b.ny, "pad target smaller than box")
    val cx = (b.xl + b.xu) / 2; val cy = (b.yl + b.yu) / 2
    BBox(cx - (nx - 1) / 2, cx - (nx - 1) / 2 + nx - 1,
      cy - (ny - 1) / 2, cy - (ny - 1) / 2 + ny - 1, b.name)
  }
}
