package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.core.{Det, Tables}
import graft.core.Det.fsumSql
import SyntheticMs._

/** Model-fitting / beam kernels — SURVEY §2.2 M5, §2.1 R7/R8.
  *
  * M5 (`fit_spi_components`, africanus/model/spi/component_spi.py:12-97):
  * the reference runs a per-component Gauss-Newton on the power law; here
  * the fit is the log-linearized weighted least squares — a single
  * partial+final aggregation per component (Spark-idiomatic: closed-form
  * sums instead of an iterative kernel), embarrassingly parallel across
  * components.
  *
  * R7 (`beam_cube_dde`, africanus/rime/fast_beam_cubes.py:57-240): beam
  * cube as a broadcast dimension table. Two tiers live in this file: the
  * r07 on-plane bilinear gather (four corner joins, dyadic weights —
  * exact), and the FULL reference semantics in the r14 query below
  * (freq_grid_interp clamped-plane mapping, 8-corner trilinear gather,
  * amplitude renormalization — r14/r16/x12-green).
  *
  * R8 (`zernike_dde`, africanus/rime/zernike.py:8-144): first six Noll
  * modes evaluated analytically per (source, antenna) with per-antenna
  * coefficients.
  */
object ModelFit {

  /** Σ_j coeff_j(ant) · Z_j(x, y) over Noll modes 1..10 — shared between
    * the Spark expr and the oracle SQL of r12. */
  val zernikeGeneralSql: String = {
    val x = "(-2e-1 + src_id * 25e-3)"
    val y = "(1e-1 - src_id * 125e-4)"
    (1 to 10).map { j =>
      s"((ant % ${j + 2} + 1) / 8e0) * (${graft.functions.Zernike.zernikeExprSql(j, x, y)})"
    }.mkString(" + ")
  }

  val qs: Seq[Q] = Seq(

    // -- M5: weighted log-linear spectral-index fit per component.
    Q("m05_fit_spi", {
      val alpha = "(sw*swxy - swx*swy)/(sw*swxx - swx*swx)"
      s"""WITH comp AS (SELECT CAST(n_nationkey AS BIGINT) AS comp_id
         |              FROM nation WHERE n_nationkey < 25),
         |ch AS (${channelsSql(8)}),
         |obs AS (
         |  SELECT comp_id, chan,
         |    ln(freq/14e8) AS x,
         |    ln((comp_id % 4 + 1 + chan % 3) / 4e0) AS y,
         |    (chan % 5 + 1) / 8e0 AS w
         |  FROM comp, ch),
         |s AS (
         |  SELECT comp_id,
         |    ${fsumSql("w", "1e9")} AS sw, ${fsumSql("w*x", "1e9")} AS swx,
         |    ${fsumSql("w*y", "1e9")} AS swy, ${fsumSql("w*x*x", "1e9")} AS swxx,
         |    ${fsumSql("w*x*y", "1e9")} AS swxy
         |  FROM obs GROUP BY comp_id)
         |SELECT comp_id, $alpha AS alpha,
         |  (swy - ($alpha)*swx)/sw AS log_i0
         |FROM s""".stripMargin
    }) { (s, dir) =>
      val comp = Tables.nation(s, dir).filter(col("n_nationkey") < 25)
        .select(col("n_nationkey").cast("long").as("comp_id"))
      val x = log(col("freq") / 14e8)
      val y = log((col("comp_id") % 4 + 1 + col("chan") % 3) / 4e0)
      val w = (col("chan") % 5 + 1) / 8e0
      val sums = comp.crossJoin(broadcast(channels(s, dir, 8)))
        .groupBy("comp_id")
        .agg(Det.fsum(w, 1e9).as("sw"), Det.fsum(w * x, 1e9).as("swx"),
          Det.fsum(w * y, 1e9).as("swy"), Det.fsum(w * x * x, 1e9).as("swxx"),
          Det.fsum(w * x * y, 1e9).as("swxy"))
      val alpha = (col("sw") * col("swxy") - col("swx") * col("swy")) /
        (col("sw") * col("swxx") - col("swx") * col("swx"))
      sums.select(col("comp_id"), alpha.as("alpha"),
        ((col("swy") - alpha * col("swx")) / col("sw")).as("log_i0"))
    },

    // -- M5 FULL semantics: the reference's weighted GAUSS-NEWTON on the
    //    power law I(ν) = i0·(ν/ν0)^α (component_spi.py:12-52), not the
    //    log-linearized closed form of m05. Three unrolled iterations from
    //    the reference's initialisation (α = −0.7, i0 = data at the
    //    channel nearest ν0), each building J, residuals and the 2×2
    //    normal equations as fixed-point (1e-9) channel sums — the oracle
    //    replays the identical rounds as chained CTEs. det is clamped at
    //    the reference's float64 mindet; variance outputs follow
    //    out[1]/out[3] = hess/det·lik/dof.
    Q("m07_fit_spi_gn", {
      val obs =
        s"""obs AS (
           |  SELECT comp_id, chan, freq/14e8 AS w,
           |    (comp_id % 4 + 1 + chan % 3) / 4e0 AS y,
           |    (chan % 5 + 1) / 8e0 AS wgt
           |  FROM comp, ch)""".stripMargin
      def round(n: Int, prev: String): String = {
        val j1 = "pow(w, alpha)"
        val model = s"(i0 * $j1)"
        val j0 = s"($model * ln(w))"
        val r = s"(y - $model)"
        s"""s$n AS (
           |  SELECT obs.comp_id,
           |    ${fsumSql(s"$j0*wgt*($r)", "1e9")} AS jr0,
           |    ${fsumSql(s"$j1*wgt*($r)", "1e9")} AS jr1,
           |    ${fsumSql(s"$j0*wgt*$j0", "1e9")} AS h00,
           |    ${fsumSql(s"$j0*wgt*$j1", "1e9")} AS h01,
           |    ${fsumSql(s"$j1*wgt*$j1", "1e9")} AS h11,
           |    ${fsumSql(s"($r)*wgt*($r)", "1e9")} AS lik
           |  FROM obs JOIN $prev p ON obs.comp_id = p.comp_id
           |  GROUP BY obs.comp_id),
           |p$n AS (
           |  SELECT s$n.comp_id,
           |    p.alpha + (h11*jr0 - h01*jr1)
           |      / GREATEST(h00*h11 - h01*h01, 1e-12) AS alpha,
           |    p.i0 + ((-h01)*jr0 + h00*jr1)
           |      / GREATEST(h00*h11 - h01*h01, 1e-12) AS i0
           |  FROM s$n JOIN $prev p ON s$n.comp_id = p.comp_id)""".stripMargin
      }
      s"""WITH comp AS (SELECT CAST(n_nationkey AS BIGINT) AS comp_id
         |              FROM nation WHERE n_nationkey < 25),
         |ch AS (${channelsSql(8)}),
         |$obs,
         |p0 AS (
         |  SELECT comp_id, -7e-1 AS alpha,
         |    (comp_id % 4 + 1 + 5 % 3) / 4e0 AS i0
         |  FROM comp),
         |${round(1, "p0")},
         |${round(2, "p1")},
         |${round(3, "p2")}
         |SELECT p3.comp_id,
         |  ${Det.r6Sql("p3.alpha")} AS alpha, ${Det.r6Sql("p3.i0")} AS i0,
         |  ${Det.r6Sql("h11 / GREATEST(h00*h11 - h01*h01, 1e-12) * lik / 6")} AS alpha_var,
         |  ${Det.r6Sql("h00 / GREATEST(h00*h11 - h01*h01, 1e-12) * lik / 6")} AS i0_var
         |FROM p3 JOIN s3 ON p3.comp_id = s3.comp_id""".stripMargin
    }) { (s, dir) =>
      val comp = Tables.nation(s, dir).filter(col("n_nationkey") < 25)
        .select(col("n_nationkey").cast("long").as("comp_id"))
      val obs = comp.crossJoin(broadcast(channels(s, dir, 8)))
        .select(col("comp_id"), col("chan"), (col("freq") / 14e8).as("w"),
          ((col("comp_id") % 4 + 1 + col("chan") % 3) / 4e0).as("y"),
          ((col("chan") % 5 + 1) / 8e0).as("wgt"))
        .cache()
      var params = comp.select(col("comp_id"), lit(-7e-1).as("alpha"),
        ((col("comp_id") % 4 + 1 + lit(5) % 3) / 4e0).as("i0"))
      var lastSums: DataFrame = null
      for (_ <- 1 to 3) {
        val p = params.select(col("comp_id").as("pc"),
          col("alpha"), col("i0"))
        val j = obs.join(p, col("comp_id") === col("pc"))
        val j1 = pow(col("w"), col("alpha"))
        val model = col("i0") * j1
        val j0 = model * log(col("w"))
        val r = col("y") - model
        val sums = j.groupBy("comp_id").agg(
          Det.fsum(j0 * col("wgt") * r, 1e9).as("jr0"),
          Det.fsum(j1 * col("wgt") * r, 1e9).as("jr1"),
          Det.fsum(j0 * col("wgt") * j0, 1e9).as("h00"),
          Det.fsum(j0 * col("wgt") * j1, 1e9).as("h01"),
          Det.fsum(j1 * col("wgt") * j1, 1e9).as("h11"),
          Det.fsum(r * col("wgt") * r, 1e9).as("lik"))
        lastSums = sums
        val det = greatest(col("h00") * col("h11") - col("h01") * col("h01"),
          lit(1e-12))
        params = sums.join(p, col("comp_id") === col("pc")).select(
          col("comp_id"),
          (col("alpha") + (col("h11") * col("jr0") - col("h01") * col("jr1")) / det)
            .as("alpha"),
          (col("i0") + ((-col("h01")) * col("jr0") + col("h00") * col("jr1")) / det)
            .as("i0"))
      }
      val det = greatest(col("h00") * col("h11") - col("h01") * col("h01"),
        lit(1e-12))
      params.join(
          lastSums.select(col("comp_id").as("sc"), col("h00"), col("h01"),
            col("h11"), col("lik")),
          col("comp_id") === col("sc"))
        .select(col("comp_id"),
          Det.r6(col("alpha")).as("alpha"), Det.r6(col("i0")).as("i0"),
          Det.r6(col("h11") / det * col("lik") / 6).as("alpha_var"),
          Det.r6(col("h00") / det * col("lik") / 6).as("i0_var"))
    },

    // -- R7: beam_cube_dde, full semantics
    //    (africanus/rime/fast_beam_cubes.py:10-54 freq_grid_interp,
    //    110-238 trilinear gather + amplitude renorm):
    //    * data frequencies interpolate BETWEEN beam freq planes
    //      (grid 9e8 + fi·2e8; channels 0 and 7 fall OUTSIDE the grid and
    //      take the reference's extrapolation: clamp to the boundary plane
    //      and SCALE the (l, m) coordinates by f/f_boundary);
    //    * 8-corner trilinear gather over the broadcast cube;
    //    * amplitude renormalization: the complex blend is rescaled so its
    //      modulus equals the blended modulus of the corners.
    //    Every op below is single-IEEE-expression deterministic (sqrt is
    //    correctly rounded on both engines) — no rounding layer needed.
    Q("r07_beam_cube", {
      val corners = for (dli <- 0 to 1; dmi <- 0 to 1; dfi <- 0 to 1)
        yield (s"c$dli$dmi$dfi", dli, dmi, dfi)
      def wS(dli: Int, dmi: Int, dfi: Int): String = Seq(
        if (dli == 0) "(1e0-dl)" else "dl",
        if (dmi == 0) "(1e0-dm)" else "dm",
        if (dfi == 0) "(1e0-fw)" else "fw").mkString("*")
      def blendS(f: String => String): String =
        corners.map { case (nm, a, b, c) => s"${wS(a, b, c)}*${f(nm)}" }
          .mkString(" + ")
      val wre = blendS(nm => s"$nm.b_re")
      val wim = blendS(nm => s"$nm.b_im")
      val wabs = blendS(nm => s"sqrt($nm.b_re*$nm.b_re + $nm.b_im*$nm.b_im)")
      val den = s"sqrt(($wre)*($wre) + ($wim)*($wim))"
      val joins = corners.map { case (nm, a, b, c) =>
        s"JOIN cube $nm ON $nm.li = pp.l0+$a AND $nm.mi = pp.m0+$b AND $nm.fi = pp.f0+$c"
      }.mkString("\n")
      s"""WITH src AS (${sourcesSql(20)}), ch AS (${channelsSql(8)}),
         |cube AS (
         |  SELECT CAST(li.n_nationkey AS BIGINT) AS li,
         |    CAST(mi.n_nationkey AS BIGINT) AS mi,
         |    CAST(fi.n_nationkey AS BIGINT) AS fi,
         |    ((li.n_nationkey*3 + mi.n_nationkey*5 + fi.n_nationkey*7) % 11 - 5) / 8e0 AS b_re,
         |    ((li.n_nationkey*7 + mi.n_nationkey*3 + fi.n_nationkey*5) % 9 - 4) / 8e0 AS b_im
         |  FROM nation li, nation mi, nation fi
         |  WHERE li.n_nationkey < 8 AND mi.n_nationkey < 8 AND fi.n_nationkey < 4),
         |fq AS (
         |  SELECT src_id, chan,
         |    CASE WHEN freq < 9e8 THEN freq/9e8
         |         WHEN freq > 15e8 THEN freq/15e8 ELSE 1e0 END AS fscale,
         |    CASE WHEN freq < 9e8 THEN 9e8
         |         WHEN freq > 15e8 THEN 15e8 ELSE freq END AS fc
         |  FROM src, ch),
         |pt AS (
         |  SELECT src_id, chan, fscale,
         |    (((src_id * 5) % 21) / 4e0 + 1e0) * fscale AS lc,
         |    (((src_id * 3 + chan * 5) % 21) / 4e0 + 1e0) * fscale AS mc,
         |    LEAST(CAST(FLOOR((fc - 9e8)/2e8) AS BIGINT), 2) AS f0,
         |    (fc - (9e8 + LEAST(CAST(FLOOR((fc - 9e8)/2e8) AS BIGINT), 2) * 2e8)) / 2e8 AS fw
         |  FROM fq),
         |pp AS (
         |  SELECT src_id, chan, f0, fw,
         |    CAST(FLOOR(lc) AS BIGINT) AS l0, CAST(FLOOR(mc) AS BIGINT) AS m0,
         |    lc - FLOOR(lc) AS dl, mc - FLOOR(mc) AS dm
         |  FROM pt)
         |SELECT pp.src_id, pp.chan,
         |  CASE WHEN $den = 0e0 THEN $wre
         |       ELSE ($wre) * (($wabs) / ($den)) END AS e_re,
         |  CASE WHEN $den = 0e0 THEN $wim
         |       ELSE ($wim) * (($wabs) / ($den)) END AS e_im
         |FROM pp
         |$joins""".stripMargin
    }) { (s, dir) =>
      val n = Tables.nation(s, dir).select(col("n_nationkey").cast("long").as("k"))
      val cube = n.filter(col("k") < 8).select(col("k").as("li"))
        .crossJoin(n.filter(col("k") < 8).select(col("k").as("mi")))
        .crossJoin(n.filter(col("k") < 4).select(col("k").as("fi")))
        .select(col("li"), col("mi"), col("fi"),
          (((col("li") * 3 + col("mi") * 5 + col("fi") * 7) % 11 - 5) / 8e0).as("b_re"),
          (((col("li") * 7 + col("mi") * 3 + col("fi") * 5) % 9 - 4) / 8e0).as("b_im"))
      val fscale = when(col("freq") < 9e8, col("freq") / 9e8)
        .when(col("freq") > 15e8, col("freq") / 15e8).otherwise(lit(1e0))
      val fc = when(col("freq") < 9e8, lit(9e8))
        .when(col("freq") > 15e8, lit(15e8)).otherwise(col("freq"))
      val pt = sources(s, dir, 20).select("src_id")
        .crossJoin(broadcast(channels(s, dir, 8)))
        .withColumn("fscale", fscale)
        .withColumn("fc", fc)
        .withColumn("lc", (((col("src_id") * 5) % 21) / 4e0 + 1e0) * col("fscale"))
        .withColumn("mc", (((col("src_id") * 3 + col("chan") * 5) % 21) / 4e0 + 1e0) * col("fscale"))
        .withColumn("f0", least(floor((col("fc") - 9e8) / 2e8).cast("long"), lit(2L)))
        .withColumn("fw", (col("fc") - (lit(9e8) + col("f0") * 2e8)) / 2e8)
        .withColumn("l0", floor(col("lc")).cast("long"))
        .withColumn("m0", floor(col("mc")).cast("long"))
        .withColumn("dl", col("lc") - floor(col("lc")))
        .withColumn("dm", col("mc") - floor(col("mc")))
      val corners = for (dli <- 0 to 1; dmi <- 0 to 1; dfi <- 0 to 1)
        yield (s"c$dli$dmi$dfi", dli, dmi, dfi)
      var j = pt
      for ((nm, dli, dmi, dfi) <- corners)
        j = j.join(
          broadcast(cube.select(col("li").as(s"${nm}_li"), col("mi").as(s"${nm}_mi"),
            col("fi").as(s"${nm}_fi"), col("b_re").as(s"${nm}_re"),
            col("b_im").as(s"${nm}_im"))),
          col(s"${nm}_li") === col("l0") + dli && col(s"${nm}_mi") === col("m0") + dmi
            && col(s"${nm}_fi") === col("f0") + dfi)
      def w(dli: Int, dmi: Int, dfi: Int): Column =
        (if (dli == 0) lit(1e0) - col("dl") else col("dl")) *
          (if (dmi == 0) lit(1e0) - col("dm") else col("dm")) *
          (if (dfi == 0) lit(1e0) - col("fw") else col("fw"))
      def blend(f: String => Column): Column =
        corners.map { case (nm, a, b, c) => w(a, b, c) * f(nm) }.reduce(_ + _)
      val wre = blend(nm => col(s"${nm}_re"))
      val wim = blend(nm => col(s"${nm}_im"))
      val wabs = blend(nm =>
        sqrt(col(s"${nm}_re") * col(s"${nm}_re") + col(s"${nm}_im") * col(s"${nm}_im")))
      val den = sqrt(wre * wre + wim * wim)
      j.select(col("src_id"), col("chan"),
        when(den === 0e0, wre).otherwise(wre * (wabs / den)).as("e_re"),
        when(den === 0e0, wim).otherwise(wim * (wabs / den)).as("e_im"))
    },

    // -- R8 FULL: the general Noll-indexed Zernike evaluator
    //    (zernike.py:8-144) in the distributed query — modes 1..10
    //    generated from the exact integer radial coefficients with
    //    multiplication-chain ρ powers (no env-sensitive pow). ONE string
    //    feeds both Spark's expr() and the oracle, so the trees are
    //    identical by construction.
    Q("r12_zernike_general", {
      val zSql = ModelFit.zernikeGeneralSql
      s"""WITH src AS (${sourcesSql(20)}),
         |ants AS (SELECT CAST(n_nationkey AS BIGINT) AS ant
         |         FROM nation WHERE n_nationkey < 7)
         |SELECT src_id, ant,
         |  ${Det.r6Sql(zSql)} AS zval
         |FROM src, ants""".stripMargin
    }) { (s, dir) =>
      val ants = Tables.nation(s, dir).filter(col("n_nationkey") < 7)
        .select(col("n_nationkey").cast("long").as("ant"))
      sources(s, dir, 20).select("src_id")
        .crossJoin(broadcast(ants))
        .select(col("src_id"), col("ant"),
          Det.r6(expr(ModelFit.zernikeGeneralSql)).as("zval"))
    },

    // -- R7∘R6: the beam sampled at TRANSFORMED source coordinates — the
    //    reference's actual call chain (transform_sources feeds
    //    beam_cube_dde): lm rotated by the parallactic angle, pointing
    //    errors added, antenna scaling applied, then mapped onto the beam
    //    grid and bilinearly gathered per (src, time, ant, chan).
    Q("r14_beam_transformed", {
      val lt = "((1e0 + ant * 125e-3) * (l*cos(pa) - m*sin(pa) + (time_index - 1) * 25e-4))"
      val mt = "((1e0 - ant * 625e-4) * (l*sin(pa) + m*cos(pa) + (ant - 1) * 125e-4))"
      s"""WITH src AS (${sourcesSql(8)}), pat AS (${paTableSql(4, 3)}),
         |ch AS (SELECT CAST(n_nationkey AS BIGINT) AS chan
         |       FROM nation WHERE n_nationkey < 4),
         |cube AS (
         |  SELECT CAST(li.n_nationkey AS BIGINT) AS li,
         |    CAST(mi.n_nationkey AS BIGINT) AS mi,
         |    CAST(fi.n_nationkey AS BIGINT) AS fi,
         |    ((li.n_nationkey*3 + mi.n_nationkey*5 + fi.n_nationkey*7) % 11 - 5) / 8e0 AS b_re,
         |    ((li.n_nationkey*7 + mi.n_nationkey*3 + fi.n_nationkey*5) % 9 - 4) / 8e0 AS b_im
         |  FROM nation li, nation mi, nation fi
         |  WHERE li.n_nationkey < 8 AND mi.n_nationkey < 8 AND fi.n_nationkey < 4),
         |pt AS (
         |  SELECT src_id, time_index, ant, chan,
         |    35e-1 + $lt * 512e0 AS lc,
         |    35e-1 + $mt * 256e0 AS mc
         |  FROM src, pat, ch),
         |pp AS (
         |  SELECT src_id, time_index, ant, chan, lc, mc,
         |    CAST(FLOOR(lc) AS BIGINT) AS l0, CAST(FLOOR(mc) AS BIGINT) AS m0,
         |    lc - FLOOR(lc) AS dl, mc - FLOOR(mc) AS dm
         |  FROM pt)
         |SELECT pp.src_id, pp.time_index, pp.ant, pp.chan,
         |  ${Det.r6Sql(
             "(1e0-dl)*(1e0-dm)*c00.b_re + (1e0-dl)*dm*c01.b_re" +
             " + dl*(1e0-dm)*c10.b_re + dl*dm*c11.b_re")} AS e_re,
         |  ${Det.r6Sql(
             "(1e0-dl)*(1e0-dm)*c00.b_im + (1e0-dl)*dm*c01.b_im" +
             " + dl*(1e0-dm)*c10.b_im + dl*dm*c11.b_im")} AS e_im
         |FROM pp
         |JOIN cube c00 ON c00.li = pp.l0   AND c00.mi = pp.m0   AND c00.fi = pp.chan
         |JOIN cube c01 ON c01.li = pp.l0   AND c01.mi = pp.m0+1 AND c01.fi = pp.chan
         |JOIN cube c10 ON c10.li = pp.l0+1 AND c10.mi = pp.m0   AND c10.fi = pp.chan
         |JOIN cube c11 ON c11.li = pp.l0+1 AND c11.mi = pp.m0+1 AND c11.fi = pp.chan""".stripMargin
    }) { (s, dir) =>
      val n = Tables.nation(s, dir).select(col("n_nationkey").cast("long").as("k"))
      val cube = n.filter(col("k") < 8).select(col("k").as("li"))
        .crossJoin(n.filter(col("k") < 8).select(col("k").as("mi")))
        .crossJoin(n.filter(col("k") < 4).select(col("k").as("fi")))
        .select(col("li"), col("mi"), col("fi"),
          (((col("li") * 3 + col("mi") * 5 + col("fi") * 7) % 11 - 5) / 8e0).as("b_re"),
          (((col("li") * 7 + col("mi") * 3 + col("fi") * 5) % 9 - 4) / 8e0).as("b_im"))
      val ch = Tables.nation(s, dir).filter(col("n_nationkey") < 4)
        .select(col("n_nationkey").cast("long").as("chan"))
      val scaleL = lit(1e0) + col("ant") * 125e-3
      val scaleM = lit(1e0) - col("ant") * 625e-4
      val lt = scaleL * (col("l") * cos(col("pa")) - col("m") * sin(col("pa"))
        + (col("time_index") - 1) * 25e-4)
      val mt = scaleM * (col("l") * sin(col("pa")) + col("m") * cos(col("pa"))
        + (col("ant") - 1) * 125e-4)
      val pt = sources(s, dir, 8)
        .crossJoin(broadcast(paTable(s, dir, 4, 3)))
        .crossJoin(broadcast(ch))
        .withColumn("lc", lit(35e-1) + lt * 512e0)
        .withColumn("mc", lit(35e-1) + mt * 256e0)
        .withColumn("l0", floor(col("lc")).cast("long"))
        .withColumn("m0", floor(col("mc")).cast("long"))
        .withColumn("dl", col("lc") - floor(col("lc")))
        .withColumn("dm", col("mc") - floor(col("mc")))
      var j = pt
      for ((nm, dli, dmi) <- Seq(("c00", 0, 0), ("c01", 0, 1), ("c10", 1, 0), ("c11", 1, 1)))
        j = j.join(
          broadcast(cube.select(col("li").as(s"${nm}_li"), col("mi").as(s"${nm}_mi"),
            col("fi").as(s"${nm}_fi"), col("b_re").as(s"${nm}_re"),
            col("b_im").as(s"${nm}_im"))),
          col(s"${nm}_li") === col("l0") + dli && col(s"${nm}_mi") === col("m0") + dmi
            && col(s"${nm}_fi") === col("chan"))
      val dl = col("dl"); val dm = col("dm")
      def blend(sfx: String) =
        (lit(1e0) - dl) * (lit(1e0) - dm) * col(s"c00_$sfx") +
          (lit(1e0) - dl) * dm * col(s"c01_$sfx") +
          dl * (lit(1e0) - dm) * col(s"c10_$sfx") +
          dl * dm * col(s"c11_$sfx")
      j.select(col("src_id"), col("time_index"), col("ant"), col("chan"),
        Det.r6(blend("re")).as("e_re"), Det.r6(blend("im")).as("e_im"))
    },

    // -- R8: Zernike polynomial beam, Noll modes 1-6, per-antenna coeffs.
    Q("r08_zernike", {
      val x = "(-2e-1 + src_id * 25e-3)"
      val y = "(1e-1 - src_id * 125e-4)"
      val r2 = s"($x*$x + $y*$y)"
      val terms = Seq(
        s"(ant % 5 + 1) / 8e0 * 1e0",
        s"(ant % 3 + 1) / 8e0 * (2e0 * $x)",
        s"(ant % 7 + 1) / 8e0 * (2e0 * $y)",
        s"(ant % 4 + 1) / 8e0 * (sqrt(3e0) * (2e0 * $r2 - 1e0))",
        s"(ant % 6 + 1) / 8e0 * (sqrt(6e0) * (2e0 * $x * $y))",
        s"(ant % 2 + 1) / 8e0 * (sqrt(6e0) * ($x*$x - $y*$y))")
      s"""WITH src AS (${sourcesSql(20)}),
         |ants AS (SELECT CAST(n_nationkey AS BIGINT) AS ant
         |         FROM nation WHERE n_nationkey < 7)
         |SELECT src_id, ant,
         |  ${terms.mkString(" + ")} AS zval
         |FROM src, ants""".stripMargin
    }) { (s, dir) =>
      val ants = Tables.nation(s, dir).filter(col("n_nationkey") < 7)
        .select(col("n_nationkey").cast("long").as("ant"))
      val x = lit(-2e-1) + col("src_id") * 25e-3
      val y = lit(1e-1) - col("src_id") * 125e-4
      val r2 = x * x + y * y
      def cf(m: Int) = (col("ant") % m + 1) / 8e0
      val zval = cf(5) * lit(1e0) +
        cf(3) * (lit(2e0) * x) +
        cf(7) * (lit(2e0) * y) +
        cf(4) * (sqrt(lit(3e0)) * (lit(2e0) * r2 - 1e0)) +
        cf(6) * (sqrt(lit(6e0)) * (lit(2e0) * x * y)) +
        cf(2) * (sqrt(lit(6e0)) * (x * x - y * y))
      sources(s, dir, 20).select("src_id")
        .crossJoin(broadcast(ants))
        .select(col("src_id"), col("ant"), zval.as("zval"))
    },

    // -- M3 under the gate: the WSClean component-list READER
    //    (io/WSCleanReader — model/wsclean/file_model.py:19-266) run over
    //    an authored fixture exercising sexagesimal signs, fractional
    //    seconds, bracketed SPI lists (2/1/0 elements), case-folded
    //    types, empty-field defaults and the header reference frequency.
    //    The oracle is a VALUES table of the fixture's RAW field numbers
    //    with the conversion formulas restated — any field-split, sign,
    //    default-fallback or unit bug shifts the hash. All conversions
    //    are IEEE-exact arithmetic of identical literals (class (a)).
    Q("m03_wsclean_load",
      """WITH raw(name, ctype, sgn_ra, rh, rm, rs, sgn_de, dd, dm, ds,
        |         flux, spi0, n_spi, log_si, ref_freq, majas, minas, odeg) AS (
        |  VALUES
        |    ('s0','POINT',    1e0,  8e0, 18e0, 395e-1, -1e0, 12e0, 24e0, 432e-1,
        |     125e-2, -7e-1,  2, true,  14e8,     0e0,     0e0,     0e0),
        |    ('s1','GAUSSIAN',-1e0,  0e0, 30e0, 1575e-2, 1e0, 45e0, 10e0,  36e-1,
        |      25e-1, -55e-2, 1, false, 14e8, 1205e-1, 6025e-2, 3375e-2),
        |    ('s2','POINT',    1e0, 12e0,  0e0,    0e0,  1e0,  0e0,  0e0,    0e0,
        |      75e-2,   0e0,  0, false, 14e8,     0e0,     0e0,     0e0))
        |SELECT name, ctype,
        |  sgn_ra * (rh + rm/60e0 + rs/3600e0) * (pi()/12e0) AS ra,
        |  sgn_de * (dd + dm/60e0 + ds/3600e0) * (pi()/180e0) AS dec,
        |  flux, spi0, CAST(n_spi AS BIGINT) AS n_spi, log_si, ref_freq,
        |  majas * (pi()/648000e0) AS maj,
        |  minas * (pi()/648000e0) AS min_ax,
        |  (odeg * pi()) / 180e0 AS orient
        |FROM raw""".stripMargin) { (s, dir) =>
      val text =
        """Format = Name, Type, Ra, Dec, I, SpectralIndex, LogarithmicSI, ReferenceFrequency='1.4e9', MajorAxis, MinorAxis, Orientation
          |s0,POINT,08:18:39.5,-12.24.43.2,1.25,[-0.7,0.05],true,1.4e9,,,
          |s1,GAUSSIAN,-00:30:15.75,45.10.03.6,2.5,[-0.55],false,,120.5,60.25,33.75
          |s2,point,12:00:00,00.00.00,0.75,[],,,,,
          |""".stripMargin
      val path = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_wsclean_m03.txt")
      java.nio.file.Files.write(path.toPath,
        text.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      graft.io.WSCleanReader.read(s, path.getAbsolutePath)
        .select(col("name"), col("compType").as("ctype"), col("ra"),
          col("dec"), col("flux"),
          coalesce(expr("try_element_at(spi, 1)"), lit(0e0)).as("spi0"),
          size(col("spi")).cast("long").as("n_spi"),
          col("logSI").as("log_si"), col("refFreq").as("ref_freq"),
          col("majorAxis").as("maj"), col("minorAxis").as("min_ax"),
          col("orientation").as("orient"))
    },

    // -- R7 ingestion: the beam cube arrives as a REAL FITS file
    //    (MeqTrees layout, beam_factory.py:37-165) written and read by the
    //    pure-JVM graft.io.Fits — header-derived DEG→RAD axis grids,
    //    CRPIX/CRVAL/CDELT geometry, the GFREQ1..N irregular frequency
    //    grid, and big-endian double data. The oracle restates the
    //    generating model (deterministic Westerbork cos³ + closed-form
    //    jitter), so a hash match proves the whole read path: any header
    //    misparse, axis flip, or byte-order bug shifts values.
    // beam values are r4-rounded: the Spark side carries JVM cos³ baked
    // into the file while the oracle recomputes with DuckDB's libm — the
    // cube triples a 1-ulp disagreement, so the wide bucket applies.
    Q("r16_beam_fits", {
      import graft.core.Det.r4Sql
      s"""WITH px AS (SELECT CAST(n_nationkey AS BIGINT) AS x
         |            FROM nation WHERE n_nationkey < 9),
         |py AS (SELECT CAST(n_nationkey AS BIGINT) AS y
         |       FROM nation WHERE n_nationkey < 9),
         |pf AS (SELECT CAST(n_nationkey AS BIGINT) AS f
         |       FROM nation WHERE n_nationkey < 5),
         |g AS (
         |  SELECT x, y, f,
         |    ((CAST(x AS DOUBLE) - 4e0) * 375e-3) * (pi() / 180e0) AS l,
         |    ((CAST(y AS DOUBLE) - 4e0) * 375e-3) * (pi() / 180e0) AS m,
         |    856e6 + f * 214e6 + (CASE WHEN f = 0 OR f = 4 THEN 0e0
         |      ELSE ((f*3) % 5 - 2) * 1e5 END) AS freq
         |  FROM px, py, pf),
         |b AS (
         |  SELECT *, cos(LEAST(65e0 * (freq * 1e-9) * sqrt(l*l + m*m),
         |                      10881e-4)) AS bc
         |  FROM g)
         |SELECT x, y, f, l, m, freq, ${r4Sql("bc * bc * bc")} AS beam
         |FROM b""".stripMargin
    }) { (s, dir) =>
      import graft.io.BeamFixture
      val cube = graft.io.Fits.beamCube(
        BeamFixture.ensure(BeamFixture.defaultPath))
      val rows = for {
        f <- 0 until cube.nFreq
        y <- 0 until cube.npixY
        x <- 0 until cube.npixX
      } yield (x.toLong, y.toLong, f.toLong,
        cube.lGrid(x), cube.mGrid(y), cube.freqs(f), cube.value(x, y, f))
      import s.implicits._
      rows.toDF("x", "y", "f", "l", "m", "freq", "beam_raw")
        .select(col("x"), col("y"), col("f"), col("l"), col("m"), col("freq"),
          Det.r4(col("beam_raw")).as("beam"))
    },

    // -- the same cube through the DataSource V2 FITS source
    //    (`spark.read.format("fits")`): where r16 parses on the driver and
    //    parallelizes rows, this reads pixels EXECUTOR-side through the
    //    connector — the path a 1000-file beam library takes, one
    //    partition per file, pruning pushed into the reader
    //    (FitsSourceSpec). Same fixture, same r4 surface as r16.
    Q("f16_fits_source", {
      import graft.core.Det.r4Sql
      s"""WITH px AS (SELECT CAST(n_nationkey AS BIGINT) AS x
         |            FROM nation WHERE n_nationkey < 9),
         |py AS (SELECT CAST(n_nationkey AS BIGINT) AS y
         |       FROM nation WHERE n_nationkey < 9),
         |pf AS (SELECT CAST(n_nationkey AS BIGINT) AS f
         |       FROM nation WHERE n_nationkey < 5),
         |g AS (
         |  SELECT x, y, f,
         |    ((CAST(x AS DOUBLE) - 4e0) * 375e-3) * (pi() / 180e0) AS l,
         |    ((CAST(y AS DOUBLE) - 4e0) * 375e-3) * (pi() / 180e0) AS m,
         |    856e6 + f * 214e6 + (CASE WHEN f = 0 OR f = 4 THEN 0e0
         |      ELSE ((f*3) % 5 - 2) * 1e5 END) AS freq
         |  FROM px, py, pf),
         |b AS (
         |  SELECT x, y, f, cos(LEAST(65e0 * (freq * 1e-9) * sqrt(l*l + m*m),
         |                      10881e-4)) AS bc
         |  FROM g)
         |SELECT x, y, f, ${r4Sql("bc * bc * bc")} AS beam
         |FROM b""".stripMargin
    }) { (s, dir) =>
      import graft.io.BeamFixture
      s.read.format("fits").load(BeamFixture.ensure(BeamFixture.defaultPath))
        .select(col("x"), col("y"), col("plane").as("f"),
          Det.r4(col("value")).as("beam"))
    })
}
