package graft.functions

/** General Noll-indexed Zernike evaluation — SURVEY §2.1 R8
  * (africanus/rime/zernike.py:8-144: `zernike_rad` radial polynomial +
  * Noll de-indexing). Driver-side math: coefficients tables are
  * dimension-table sized; the distributed query (r08) evaluates the
  * resulting polynomials as column expressions.
  */
object Zernike {

  /** Noll index j (1-based) → (n, m signed; m < 0 selects the sin term).
    * Within a radial order n, |m| ascends and the EVEN j of each ±|m|
    * pair carries the cosine (+m) term — Noll's convention. */
  def nollToNM(j: Int): (Int, Int) = {
    require(j >= 1, s"noll index must be >= 1, got $j")
    var n = 0
    var first = 1 // first j of row n (each row holds n + 1 indices)
    while (j >= first + n + 1) { first += n + 1; n += 1 }
    // build the row's signed-m sequence
    val absMs = (if (n % 2 == 0) 0 to n by 2 else 1 to n by 2).toIndexedSeq
    val row = scala.collection.mutable.ArrayBuffer.empty[Int]
    var jj = first
    for (am <- absMs) {
      if (am == 0) { row += 0; jj += 1 }
      else {
        // two consecutive js: the even one gets +am
        if (jj % 2 == 0) { row += am; row += -am }
        else { row += -am; row += am }
        jj += 2
      }
    }
    (n, row(j - first))
  }

  /** Radial polynomial R_n^{|m|}(rho) by the explicit factorial sum
    * (zernike.py:23-44). */
  def zernikeRad(m: Int, n: Int, rho: Double): Double = {
    val am = math.abs(m)
    if ((n - am) % 2 != 0) return 0.0
    def fact(k: Int): Double = (1 to k).foldLeft(1.0)(_ * _)
    var sum = 0.0
    var k = 0
    while (k <= (n - am) / 2) {
      val c = (if (k % 2 == 0) 1.0 else -1.0) * fact(n - k) /
        (fact(k) * fact((n + am) / 2 - k) * fact((n - am) / 2 - k))
      sum += c * math.pow(rho, n - 2 * k)
      k += 1
    }
    sum
  }

  /** Exact INTEGER radial coefficients of R_n^{|m|}: (coef, power) pairs —
    * Zernike radial coefficients are integers, so the generated SQL is
    * exact on both engines. */
  def radialCoeffs(m: Int, n: Int): Seq[(Long, Int)] = {
    val am = math.abs(m)
    require((n - am) % 2 == 0, s"R_$n^$am vanishes")
    def fact(k: Int): BigInt = (1 to k).foldLeft(BigInt(1))(_ * _)
    (0 to (n - am) / 2).map { k =>
      val c = (if (k % 2 == 0) 1 else -1) * fact(n - k) /
        (fact(k) * fact((n + am) / 2 - k) * fact((n - am) / 2 - k))
      (c.toLong, n - 2 * k)
    }
  }

  /** SQL/Catalyst expression text for Noll mode Z_j at placeholder columns
    * (x, y) — the SAME string feeds Spark's `expr` and the DuckDB oracle,
    * so the expression trees are identical by construction. ρ powers are
    * expanded as multiplication chains (no env-sensitive `pow`); the only
    * transcendentals are atan2/cos/sin of small arguments and IEEE sqrt. */
  def zernikeExprSql(j: Int, x: String, y: String): String = {
    val (n, m) = nollToNM(j)
    val am = math.abs(m)
    val rho2 = s"(($x)*($x) + ($y)*($y))"
    def rhoPow(p: Int): String = {
      val parts = Seq.fill(p / 2)(rho2) ++
        (if (p % 2 == 1) Seq(s"sqrt($rho2)") else Nil)
      if (parts.isEmpty) "1e0" else parts.mkString("*")
    }
    val rad = radialCoeffs(m, n)
      .map { case (c, p) => s"(${c}e0 * ${rhoPow(p)})" }
      .mkString(" + ")
    val norm =
      if (m == 0) s"sqrt(${n + 1}e0)" else s"sqrt(${2 * (n + 1)}e0)"
    val ang =
      if (m == 0) "1e0"
      else if (m > 0) s"cos($m * atan2($y, $x))"
      else s"sin(${-m} * atan2($y, $x))"
    s"$norm * ($rad) * $ang"
  }

  /** Noll-normalized Zernike Z_j at cartesian (x, y). */
  def zernike(j: Int, x: Double, y: Double): Double = {
    val (n, m) = nollToNM(j)
    val rho = math.hypot(x, y)
    val theta = math.atan2(y, x)
    val r = zernikeRad(m, n, rho)
    if (m == 0) math.sqrt(n + 1.0) * r
    else if (m > 0) math.sqrt(2.0 * (n + 1)) * r * math.cos(m * theta)
    else math.sqrt(2.0 * (n + 1)) * r * math.sin(-m * theta)
  }
}
