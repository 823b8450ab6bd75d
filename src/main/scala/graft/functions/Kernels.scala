package graft.functions

/** Anti-alias gridding kernel construction — SURVEY §2.7 F8
  * (africanus/gridding/perleypolyhedron/kernels.py:17-186). Driver-side
  * precompute; the resulting taps are broadcast constants for the
  * gridder (operators.Gridder).
  */
object Kernels {

  /** Unnormalized sinc kernel over `w` half-support, `oversample` taps per
    * cell (kernels.py:31-43 shape). */
  def sinc(w: Int, oversample: Int = 5): Array[Double] = {
    val n = w * oversample
    Array.tabulate(2 * n + 1) { i =>
      val x = (i - n).toDouble / oversample
      if (x == 0.0) 1.0 else math.sin(math.Pi * x) / (math.Pi * x)
    }
  }

  /** Modified Bessel I0 by power series (for the Kaiser-Bessel window). */
  def besselI0(x: Double): Double = {
    var term = 1.0
    var sum = 1.0
    var k = 1
    while (term > 1e-16 * sum && k < 64) {
      val t = x / (2.0 * k)
      term *= t * t
      sum += term
      k += 1
    }
    sum
  }

  /** Kaiser-Bessel windowed sinc (kernels.py:45-76): beta defaults to the
    * published optimum for the half-support. */
  def kbSinc(w: Int, oversample: Int = 5, betaOpt: Option[Double] = None): Array[Double] = {
    val beta = betaOpt.getOrElse(2.34 * w)
    val base = sinc(w, oversample)
    val n = w * oversample
    Array.tabulate(base.length) { i =>
      val u = (i - n).toDouble / n // in [-1, 1]
      base(i) * besselI0(beta * math.sqrt(math.max(0.0, 1.0 - u * u))) / besselI0(beta)
    }
  }

  /** Hanning-windowed sinc (kernels.py:78-95). */
  def hanningSinc(w: Int, oversample: Int = 5): Array[Double] = {
    val base = sinc(w, oversample)
    val n = w * oversample
    Array.tabulate(base.length) { i =>
      base(i) * (0.5 + 0.5 * math.cos(math.Pi * (i - n).toDouble / (n + 1)))
    }
  }

  /** Oversampled kernel -> per-cell (offset, weight) taps at a given
    * sub-cell position (pack/unpack analogue, kernels.py:97-120). */
  def taps(kernel: Array[Double], w: Int, oversample: Int): Seq[(Int, Double)] = {
    val n = w * oversample
    (-w to w).map(o => o -> kernel(n + o * oversample))
  }

  /** Separable detaper: the 1-D DFT of the cell-spaced taps evaluated at
    * image coordinate `x` (cycles) — symmetric real kernels give
    * Σ tap(o)·cos(2π·o·x); the 2-D detaper is tx·ty
    * (compute_detaper_dft_seperable, kernels.py:141-186). This is the
    * function WStack.dirtyImageDft divides by. */
  def detaperDftSeparable(taps: Seq[(Int, Double)], x: Double): Double =
    taps.map { case (o, t) => t * math.cos(2.0 * math.Pi * o * x) }.sum

  /** "Exponential of semicircle" (ES) gridding kernel — the modern
    * wgridder kernel family ducc0/FINUFFT use (Barnett, Magland & af
    * Klinteberg 2019; the `epsilon` knob of
    * gridding/wgridder/vis2im.py:77-106 maps to the half-support `w`):
    * k(x) = exp(β(√(1−(x/w)²) − 1)) on |x| < w, 0 outside. Closed-form
    * (exp/sqrt only), so the FRACTIONAL-offset weight k(off − frac) is
    * evaluable inside whole-stage codegen — no uv snap at all. */
  def esKernel(w: Int, beta: Double, x: Double): Double =
    if (math.abs(x) >= w) 0.0
    else math.exp(beta * (math.sqrt(1.0 - (x / w) * (x / w)) - 1.0))

  /** Continuous transform K̂(l) = ∫_{-w}^{w} k(x)·cos(2πxl) dx of the ES
    * kernel — the detaper the fractional gridder divides by. The x = w·sin t
    * substitution removes the edge √-singularity, making the integrand
    * analytic and the midpoint rule spectrally convergent (n = 128 is
    * ~machine-precision for any w ≤ 16). */
  def esTransform(w: Int, beta: Double, l: Double, n: Int = 128): Double = {
    val h = math.Pi / n // t ∈ [−π/2, π/2]
    var s = 0.0
    var j = 0
    while (j < n) {
      val t = -math.Pi / 2 + (j + 0.5) * h
      val ct = math.cos(t)
      s += math.exp(beta * (ct - 1.0)) *
        math.cos(2.0 * math.Pi * w * l * math.sin(t)) * w * ct
      j += 1
    }
    s * h
  }

  /** ducc0-style ε → (half-support, β) map for the ES kernel at our
    * operating point (image extent ≪ Nyquist, so aliases sit a full cycle
    * away — unlike FINUFFT's σ=2 tuning β≈2.3w, the measured optimum here
    * is β ≈ 1.8πw). Measured worst-case relative aliasing error over all
    * sub-cell fractions: w=2 → 1.9e-4, w=3 → 5.4e-7, w=4 → 1.5e-9,
    * w=5 → 3.2e-12, w=6 → 8.4e-15 — about 2.6 digits per cell of
    * support, holding through w=6 (a β rescan at w=5/6 moves the optimum
    * ≤0.15πw and buys <4x — the 1.8πw rule stays). */
  def esBeta(w: Int): Double = 1.8 * math.Pi * w

  def esSupportFor(eps: Double): (Int, Double) = {
    val digits = -math.log10(eps)
    val w = math.max(2, math.ceil((digits + 1.5) / 2.6).toInt)
    (w, esBeta(w))
  }

  /** ε → (half-support, w-plane count) for the full w-stacked dirty
    * image: kernel aliasing falls 2.6 digits per support cell (above) but
    * TOTAL error is w-term-limited. The plane-SNAP scatter
    * (WStack.planeGridsFrac) truncates at first order — error LINEAR in
    * the plane spacing (measured 2.9e-5 → 1.9e-6 over 8 → 128 planes), so
    * sub-1e-6 by brute plane count is a dense-data shuffle tax. The deep
    * tier therefore switches to the two-plane linear w-INTERPOLATION
    * scatter (WStack.planeGridsFracW2, second-order: ∝ (Δw)²), which
    * reaches the 1e-9 class at 32 planes. Tiers measured by
    * WGridderAccuracySpec against the exact continuous DFT at its
    * operating point (wMax = 5, |l| ≤ 4/1024): (3, 8) snap → 1.2e-4,
    * (4, 32) snap → 5.4e-6, (5, 32) W2-interp → <1e-6 (CI-asserted).
    * Occupied (plane, cell) groups — the shuffle volume — are bounded by
    * the visibility count (2x it under interp), nPlanes-free on sparse
    * data. */
  def esTierFor(eps: Double): (Int, Int) =
    if (eps >= 2e-4) (3, 8)
    else if (eps >= 1e-5) (4, 32)
    else (5, 32) // with WStack.planeGridsFracW2 (two-plane w-interp)

  /** Full 2-D DFT detaper over the outer-product kernel
    * (compute_detaper_dft, kernels.py:99-139): Re Σ_{o1,o2}
    * k(o1)k(o2)·e^{2πi(o1·x + o2·y)}. For a separable kernel this equals
    * detaperDftSeparable(x)·detaperDftSeparable(y) — KernelsSpec asserts
    * it, tying the cheap path to the definition. */
  def detaperDft2d(taps: Seq[(Int, Double)], x: Double, y: Double): Double =
    (for ((o1, t1) <- taps; (o2, t2) <- taps) yield {
      t1 * t2 * math.cos(2.0 * math.Pi * (o1 * x + o2 * y))
    }).sum
}
