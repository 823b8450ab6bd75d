package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.core.{CxCol, Det}
import graft.core.Det.{r6Sql, r9Sql}
import graft.functions._
import SyntheticMs._

/** RIME / sky-model / coordinate operator queries (SURVEY §2.1-2.3, §2.10)
  * over the synthetic MS views. Source/channel dim tables are broadcast;
  * the row table is the only large input — at cluster scale these plans are
  * shuffle-free projections.
  *
  * Transcendental outputs go through Det.r6/r9 (scaled rounding, mirrored
  * verbatim in the oracle SQL) so libm-vs-JDK 1-ulp differences cannot flip
  * a rounded digit differently on the two engines.
  */
object Rime {

  private val phaseSql = SyntheticMs.phaseSql
  private val lSql = "cos(dec)*sin(ra - 25e-2)"
  private val mSql = "sin(dec)*cos(-38e-2) - cos(dec)*sin(-38e-2)*cos(ra - 25e-2)"
  private val logSql = SyntheticMs.specLogSql
  private val ordSql = SyntheticMs.specOrdSql

  val qs: Seq[Q] = Seq(

    // -- C1: radec -> lmn about the phase centre (trig projection).
    Q("c01_radec_to_lmn",
      s"""WITH src AS (${sourcesSql(25)})
         |SELECT src_id,
         |  ${r9Sql(lSql)} AS l,
         |  ${r9Sql(mSql)} AS m,
         |  ${r9Sql(s"sqrt(1e0 - ($lSql)*($lSql) - ($mSql)*($mSql))")} AS n
         |FROM src""".stripMargin) { (s, dir) =>
      val src = sources(s, dir, 25)
      val lmn = Coordinates.radecToLmn(col("ra"), col("dec"), lit(Ra0), lit(Dec0))
      src.select(col("src_id"),
        Det.r9(lmn.l).as("l"), Det.r9(lmn.m).as("m"), Det.r9(lmn.n).as("n"))
    },

    // -- R1: phase delay over source x row x chan (fourier convention).
    // The hashed column is the PHASE itself: it is built from *, /, +, -,
    // sqrt and greatest only — every one IEEE-754 correctly rounded, hence
    // bit-identical on any two engines with NO rounding layer. cos/sin of
    // the phase (env-sensitive libm range reduction flipped the r6 hash on
    // the driver in rounds 1-2) stay covered by the fsum-aggregated
    // queries r09 and x01-x08, which the driver verifies green.
    Q("r01_phase_delay",
      s"""WITH src AS (${sourcesSql(5)}),
         |rws AS (${uvwRowsSql(16)}),
         |ch AS (${channelsSql(8)})
         |SELECT src_id, row_id, chan,
         |  $phaseSql AS phase
         |FROM rws, src, ch""".stripMargin) { (s, dir) =>
      val src = broadcast(sources(s, dir, 5))
      val rws = uvwRows(s, dir, 16)
      val ch = broadcast(channels(s, dir, 8))
      val ph = Phase.realPhase(col("l"), col("m"),
        col("u"), col("v"), col("w")) * col("freq")
      rws.crossJoin(src).crossJoin(ch).select(
        col("src_id"), col("row_id"), col("chan"),
        ph.as("phase"))
    },

    // -- M1: spectral model, all three bases, source x chan.
    Q("m01_spectral_model",
      s"""WITH src AS (${sourcesSql(25)}), ch AS (${channelsSql(8)})
         |SELECT src_id, chan,
         |  ${r6Sql("flux * pow(freq/ref_freq, spi0) * pow(freq/ref_freq, spi1)")} AS s_std,
         |  ${r6Sql(logSql)} AS s_log,
         |  ${r6Sql("flux * pow(1e1, spi0 * log10(freq/ref_freq) + spi1 * (log10(freq/ref_freq)*log10(freq/ref_freq)))")} AS s_log10
         |FROM src, ch""".stripMargin) { (s, dir) =>
      val src = sources(s, dir, 25)
      val ch = broadcast(channels(s, dir, 8))
      val spi = Seq(col("spi0"), col("spi1"))
      src.crossJoin(ch).select(
        col("src_id"), col("chan"),
        Det.r6(Spectral.spectralModelStd(col("flux"), spi, col("ref_freq"), col("freq"))).as("s_std"),
        Det.r6(Spectral.spectralModelLog(col("flux"), spi, col("ref_freq"), col("freq"))).as("s_log"),
        Det.r6(Spectral.spectralModelLog10(col("flux"), spi, col("ref_freq"), col("freq"))).as("s_log10"))
    },

    // -- M2: WSClean spectra; ordinary polynomial is exact (unrounded).
    Q("m02_wsclean_spectra",
      s"""WITH src AS (${sourcesSql(25)}), ch AS (${channelsSql(8)})
         |SELECT src_id, chan,
         |  $ordSql AS s_ord,
         |  ${r6Sql(logSql)} AS s_log,
         |  CASE WHEN log_poly THEN ${r6Sql(logSql)}
         |       ELSE ${r6Sql(ordSql)} END AS s_sel
         |FROM src, ch""".stripMargin) { (s, dir) =>
      val src = sources(s, dir, 25)
      val ch = broadcast(channels(s, dir, 8))
      val coeffs = Seq(col("spi0"), col("spi1"))
      val ord = Spectral.wscleanOrdinary(col("flux"), coeffs, col("ref_freq"), col("freq"))
      val lg = Spectral.wscleanLog(col("flux"), coeffs, col("ref_freq"), col("freq"))
      src.crossJoin(ch).select(
        col("src_id"), col("chan"),
        ord.as("s_ord"),
        Det.r6(lg).as("s_log"),
        when(col("log_poly"), Det.r6(lg)).otherwise(Det.r6(ord)).as("s_sel"))
    },

    // -- M4: correlations -> stokes (exact linear recombination).
    Q("m04_stokes_convert",
      s"""WITH cv AS (${corrVisSql(4)})
         |SELECT row_id,
         |  (xx_re + yy_re)/2e0 AS i_re, (xx_im + yy_im)/2e0 AS i_im,
         |  (xx_re - yy_re)/2e0 AS q_re, (xx_im - yy_im)/2e0 AS q_im,
         |  (xy_re + yx_re)/2e0 AS u_re, (xy_im + yx_im)/2e0 AS u_im,
         |  (xy_im - yx_im)/2e0 AS v_re, -(xy_re - yx_re)/2e0 AS v_im
         |FROM cv""".stripMargin) { (s, dir) =>
      val cv = corrVis(s, dir, 4)
      val in = Map(
        "XX" -> CxCol(col("xx_re"), col("xx_im")),
        "XY" -> CxCol(col("xy_re"), col("xy_im")),
        "YX" -> CxCol(col("yx_re"), col("yx_im")),
        "YY" -> CxCol(col("yy_re"), col("yy_im")))
      val out = StokesConvert.convert(in, Seq("I", "Q", "U", "V"))
      cv.select(col("row_id") +: out.flatMap { case (nm, z) =>
        Seq(z.re.as(s"${nm.toLowerCase}_re"), z.im.as(s"${nm.toLowerCase}_im"))
      }: _*)
    },

    // -- M4b: the schema-driven coherency PLANNER end to end
    //    (conversion.py:145-230): stage 1 derives IQUV from CIRCULAR
    //    correlations (the planner must pick the RR/LL + RL/LR rules since
    //    no linear corrs exist); stage 2 converts [I, V] — given as CASA
    //    integer ids [1, 4] — to the nested linear schema [[XX,XY],[YX,YY]]
    //    with implicit-zero Q and U. The oracle states the same derivation
    //    chain via the string complex algebra, term for term.
    Q("m06_coherency_planner", {
      import SqlCx.CS
      val rr = CS("xx_re", "xx_im"); val rl = CS("xy_re", "xy_im")
      val lr = CS("yx_re", "yx_im"); val ll = CS("yy_re", "yy_im")
      def divTwoIS(z: CS) = CS(s"(${z.im} / 2e0)", s"((-${z.re}) / 2e0)")
      val zero = CS("0e0", "0e0"); val iU = CS("0e0", "1e0")
      val i = (rr + ll) / "2e0"
      val q = (rl + lr) / "2e0"
      val u = divTwoIS(rl - lr)
      val v = (rr - ll) / "2e0"
      val outs = Seq(
        "i" -> i, "q" -> q, "u" -> u, "v" -> v,
        "xx" -> (i + zero), "xy" -> (zero + (iU * v)),
        "yx" -> (zero - (iU * v)), "yy" -> (i - zero))
      s"""WITH cv AS (${corrVisSql(8)})
         |SELECT row_id,
         |  ${outs.map { case (n, z) =>
               s"${z.re} AS ${n}_re,\n  ${z.im} AS ${n}_im" }.mkString(",\n  ")}
         |FROM cv""".stripMargin
    }) { (s, dir) =>
      val cv = corrVis(s, dir, 8)
      val circ = Seq(
        CxCol(col("xx_re"), col("xx_im")), CxCol(col("xy_re"), col("xy_im")),
        CxCol(col("yx_re"), col("yx_im")), CxCol(col("yy_re"), col("yy_im")))
      val stokes = StokesConvert.convertSchema(
        circ, Seq("RR", "RL", "LR", "LL"), Seq("I", "Q", "U", "V")).toMap
      val lin = StokesConvert.convertSchema(
        Seq(stokes("I"), stokes("V")), Seq(1, 4),
        Seq(Seq("XX", "XY"), Seq("YX", "YY")), implicitStokes = true)
      val outs = Seq("i" -> stokes("I"), "q" -> stokes("Q"),
        "u" -> stokes("U"), "v" -> stokes("V")) ++
        lin.map { case (n, z) => n.toLowerCase -> z }
      cv.select(col("row_id") +: outs.flatMap { case (n, z) =>
        Seq(z.re.as(s"${n}_re"), z.im.as(s"${n}_im")) }: _*)
    },

    // -- R5: feed rotation matrices (linear + circular) per (time, ant).
    Q("r05_feed_rotation",
      s"""WITH pat AS (${paTableSql()})
         |SELECT time_index, ant,
         |  ${r6Sql("cos(pa)")} AS lin_00, ${r6Sql("sin(pa)")} AS lin_01,
         |  ${r6Sql("-sin(pa)")} AS lin_10, ${r6Sql("cos(pa)")} AS lin_11,
         |  ${r6Sql("cos(pa)")} AS cir_00_re, ${r6Sql("-sin(pa)")} AS cir_00_im,
         |  ${r6Sql("cos(pa)")} AS cir_11_re, ${r6Sql("sin(pa)")} AS cir_11_im
         |FROM pat""".stripMargin) { (s, dir) =>
      val pat = paTable(s, dir)
      val lin = Feeds.feedRotation(col("pa"), "linear")
      val cir = Feeds.feedRotation(col("pa"), "circular")
      pat.select(col("time_index"), col("ant"),
        Det.r6(lin.m00.re).as("lin_00"), Det.r6(lin.m01.re).as("lin_01"),
        Det.r6(lin.m10.re).as("lin_10"), Det.r6(lin.m11.re).as("lin_11"),
        Det.r6(cir.m00.re).as("cir_00_re"), Det.r6(cir.m00.im).as("cir_00_im"),
        Det.r6(cir.m11.re).as("cir_11_re"), Det.r6(cir.m11.im).as("cir_11_im"))
    },

    // -- P1+P2: pairwise |xi-xj| + RBF covariance (distributed (n,n) grid).
    Q("p01_gps_kernel",
      s"""SELECT a.n_nationkey AS i, b.n_nationkey AS j,
         |  abs(a.n_nationkey * 25e-2 - b.n_nationkey * 25e-2) AS d,
         |  ${r6Sql("2e0 * exp(-((abs(a.n_nationkey * 25e-2 - b.n_nationkey * 25e-2))*(abs(a.n_nationkey * 25e-2 - b.n_nationkey * 25e-2))) / 45e-1)")} AS cov
         |FROM nation a, nation b""".stripMargin) { (s, dir) =>
      val a = graft.core.Tables.nation(s, dir)
        .select(col("n_nationkey").as("i"), (col("n_nationkey") * 25e-2).as("xi"))
      val b = graft.core.Tables.nation(s, dir)
        .select(col("n_nationkey").as("j"), (col("n_nationkey") * 25e-2).as("xj"))
      val d = Gps.absDiff(col("xi"), col("xj"))
      a.crossJoin(broadcast(b)).select(
        col("i"), col("j"), d.as("d"),
        Det.r6(Gps.exponentialSquared(d, 2.0, 1.5)).as("cov"))
    })
}
