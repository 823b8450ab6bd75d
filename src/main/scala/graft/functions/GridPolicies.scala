package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.{Cx, CxCol}

/** Gridder policy families — SURVEY §2.7 F9
  * (africanus/gridding/perleypolyhedron/policies/): facet baseline
  * transforms, facet phase rotation, and the named stokes-conversion
  * policies the Perley-polyhedron gridder/degridder dispatch on. All are
  * pure column expressions (whole-stage codegen).
  */
object GridPolicies {

  final case class Uvw(u: Column, v: Column, w: Column)

  /** Baseline (uvw) transform policies
    * (baseline_transform_policies.py:5-97). "rotate" applies the
    * T(new)·Tᵀ(old) rotation to the ORIGINAL vector — the reference's
    * in-place kernel overwrites uvw[0] before rows 2-3 read it (and
    * indexes uvw[3] of a length-3 array); we implement the documented
    * matrix product. "wlinapprox" is the Kogan & Greisen planar-w
    * approximation (AIPS Memo 113). */
  def uvwTransform(policy: String, uvw: Uvw, ra0: Column, dec0: Column,
                   ra: Column, dec: Column): Uvw = policy match {
    case "None" => uvw
    case "rotate" =>
      val cDRa = cos(ra - ra0); val sDRa = sin(ra - ra0)
      val cNd = cos(dec); val sNd = sin(dec)
      val cOd = cos(dec0); val sOd = sin(dec0)
      val m11 = cDRa; val m12 = sOd * sDRa; val m13 = -cOd * sDRa
      val m21 = -sNd * sDRa
      val m22 = sNd * sOd * cDRa + cNd * cOd
      val m23 = -cOd * sNd * cDRa + cNd * sOd
      val m31 = cNd * sDRa
      val m32 = -cNd * sOd * cDRa + sNd * cOd
      val m33 = cNd * cOd * cDRa + sNd * sOd
      Uvw(m11 * uvw.u + m12 * uvw.v + m13 * uvw.w,
        m21 * uvw.u + m22 * uvw.v + m23 * uvw.w,
        m31 * uvw.u + m32 * uvw.v + m33 * uvw.w)
    case "wlinapprox" =>
      val cDRa = cos(ra - ra0); val sDRa = sin(ra - ra0)
      val cNd = cos(dec); val sNd = sin(dec)
      val cOd = cos(dec0); val sOd = sin(dec0)
      val li0 = cNd * sDRa
      val mi0 = sNd * cOd - cNd * sOd * cDRa
      val ni0 = sNd * sOd + cNd * cOd * cDRa
      Uvw(uvw.u - uvw.w * li0 / ni0, uvw.v - uvw.w * mi0 / ni0, uvw.w)
    case other =>
      throw new IllegalArgumentException(
        s"Invalid baseline transform policy '$other'")
  }

  /** Facet phase-rotation factor e^{i·sign·2π(u·l + v·m + w·n)/λ}
    * (phase_transform_policies.py:9-35); multiply the visibility by it.
    * "None" returns unity. */
  def phaseFactor(policy: String, uvw: Uvw, lambdaCol: Column,
                  ra0: Column, dec0: Column, ra: Column, dec: Column,
                  phaseSign: Double = 1.0): CxCol = policy match {
    case "None" => Cx.one
    case "phase_rotate" =>
      val cDd = cos(dec); val sDd = sin(dec)
      val sDRa = sin(ra - ra0); val cDRa = cos(ra - ra0)
      val cDp = cos(dec0); val sDp = sin(dec0)
      val ll = cDd * sDRa
      val mm = sDd * cDp - cDd * sDp * cDRa
      val nn = -(lit(1.0) - sqrt(lit(1.0) - ll * ll - mm * mm))
      Cx.expi(lit(phaseSign) * 2.0 * math.Pi
        * (uvw.u * ll + uvw.v * mm + uvw.w * nn) / lambdaCol)
    case other =>
      throw new IllegalArgumentException(s"Invalid phase policy '$other'")
  }

  private val I = Cx.i

  /** stokes → gridded correlations (stokes_conversion_policies.py:4-139):
    * the named policy fixes both the correlation count and the
    * coefficients. */
  def stokes2corr(policy: String, s: CxCol): Seq[CxCol] = policy match {
    case "XXYY_FROM_I" | "RRLL_FROM_I" => Seq(s, s)
    case "XXXYYXYY_FROM_I" | "RRRLLRLL_FROM_I" => Seq(s, Cx.zero, Cx.zero, s)
    case "XXYY_FROM_Q" => Seq(s, -s)
    case "XXXYYXYY_FROM_Q" => Seq(s, Cx.zero, Cx.zero, -s)
    case "RLLR_FROM_Q" => Seq(s, s)
    case "RRRLLRLL_FROM_Q" => Seq(Cx.zero, s, s, Cx.zero)
    case "XYYX_FROM_U" => Seq(s, s)
    case "XXXYYXYY_FROM_U" => Seq(Cx.zero, s, s, Cx.zero)
    case "RLLR_FROM_U" => Seq(I * s, -(I * s))
    case "RRRLLRLL_FROM_U" => Seq(Cx.zero, I * s, -(I * s), Cx.zero)
    case "XYYX_FROM_V" => Seq(I * s, -(I * s))
    case "XXXYYXYY_FROM_V" => Seq(Cx.zero, I * s, -(I * s), Cx.zero)
    case "RRLL_FROM_V" => Seq(s, -s)
    case "RRRLLRLL_FROM_V" => Seq(s, Cx.zero, Cx.zero, -s)
    case other =>
      throw new IllegalArgumentException(s"Invalid stokes conversion '$other'")
  }

  /** correlations → stokes for degridding
    * (stokes_conversion_policies.py:141-179). */
  def corr2stokes(policy: String, in: Seq[CxCol]): CxCol = {
    def half(z: CxCol) = z.scale(lit(0.5))
    policy match {
      case "I_FROM_XXYY" | "I_FROM_RRLL" => half(in(0) + in(1))
      case "I_FROM_XXXYYXYY" | "I_FROM_RRRLLRLL" => half(in(0) + in(3))
      case "Q_FROM_XXYY" => half(in(0) - in(1))
      case "Q_FROM_XXXYYXYY" => half(in(0) - in(3))
      case "Q_FROM_RRRLLRLL" => half(in(1) + in(2))
      case "U_FROM_XYYX" => half(in(0) + in(1))
      case "U_FROM_XXXYYXYY" => half(in(1) + in(2))
      case "U_FROM_RLLR" => (-I) * half(in(0) - in(1))
      case "U_FROM_RRRLLRLL" => (-I) * half(in(1) - in(2))
      case "V_FROM_RRLL" => half(in(0) - in(1))
      case "V_FROM_RRRLLRLL" => half(in(0) - in(3))
      case "V_FROM_XYYX" => (-I) * half(in(0) - in(1))
      case "V_FROM_XXXYYXYY" => (-I) * half(in(1) - in(2))
      case other =>
        throw new IllegalArgumentException(s"Invalid stokes conversion '$other'")
    }
  }
}
