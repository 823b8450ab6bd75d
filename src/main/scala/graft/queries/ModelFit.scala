package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * cube as a broadcast dimension table; bilinear (l, m) interpolation at
  * exact frequency planes via four corner joins (the reference's 8-corner
  * trilinear gather restricted to on-plane freqs; amplitude
  * renormalization omitted). All weights dyadic — exact.
  *
  * R8 (`zernike_dde`, africanus/rime/zernike.py:8-144): first six Noll
  * modes evaluated analytically per (source, antenna) with per-antenna
  * coefficients.
  */
object ModelFit {

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

    // -- R7: beam cube sampling — bilinear corner gather, exact dyadic.
    Q("r07_beam_cube", {
      val cube =
        """cube AS (
          |  SELECT CAST(li.n_nationkey AS BIGINT) AS li,
          |    CAST(mi.n_nationkey AS BIGINT) AS mi,
          |    CAST(fi.n_nationkey AS BIGINT) AS fi,
          |    ((li.n_nationkey*3 + mi.n_nationkey*5 + fi.n_nationkey*7) % 11 - 5) / 8e0 AS b_re,
          |    ((li.n_nationkey*7 + mi.n_nationkey*3 + fi.n_nationkey*5) % 9 - 4) / 8e0 AS b_im
          |  FROM nation li, nation mi, nation fi
          |  WHERE li.n_nationkey < 8 AND mi.n_nationkey < 8 AND fi.n_nationkey < 4)""".stripMargin
      s"""WITH src AS (${sourcesSql(20)}), ch AS (${channelsSql(4)}), $cube,
         |pt AS (
         |  SELECT src_id, chan,
         |    ((src_id * 5) % 28) / 4e0 AS lc,
         |    ((src_id * 3 + chan * 5) % 28) / 4e0 AS mc
         |  FROM src, ch),
         |pp AS (
         |  SELECT src_id, chan, lc, mc,
         |    CAST(FLOOR(lc) AS BIGINT) AS l0, CAST(FLOOR(mc) AS BIGINT) AS m0,
         |    lc - FLOOR(lc) AS dl, mc - FLOOR(mc) AS dm
         |  FROM pt)
         |SELECT pp.src_id, pp.chan,
         |  (1e0-dl)*(1e0-dm)*c00.b_re + (1e0-dl)*dm*c01.b_re
         |    + dl*(1e0-dm)*c10.b_re + dl*dm*c11.b_re AS e_re,
         |  (1e0-dl)*(1e0-dm)*c00.b_im + (1e0-dl)*dm*c01.b_im
         |    + dl*(1e0-dm)*c10.b_im + dl*dm*c11.b_im AS e_im
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
      val pt = sources(s, dir, 20).select("src_id")
        .crossJoin(broadcast(channels(s, dir, 4).select("chan")))
        .withColumn("lc", ((col("src_id") * 5) % 28) / 4e0)
        .withColumn("mc", ((col("src_id") * 3 + col("chan") * 5) % 28) / 4e0)
        .withColumn("l0", floor(col("lc")).cast("long"))
        .withColumn("m0", floor(col("mc")).cast("long"))
        .withColumn("dl", col("lc") - floor(col("lc")))
        .withColumn("dm", col("mc") - floor(col("mc")))
      def corner(nm: String, dli: Int, dmi: Int) =
        broadcast(cube.select(col("li").as(s"${nm}_li"), col("mi").as(s"${nm}_mi"),
          col("fi").as(s"${nm}_fi"), col("b_re").as(s"${nm}_re"),
          col("b_im").as(s"${nm}_im")))
      var j = pt
      for ((nm, dli, dmi) <- Seq(("c00", 0, 0), ("c01", 0, 1), ("c10", 1, 0), ("c11", 1, 1)))
        j = j.join(corner(nm, dli, dmi),
          col(s"${nm}_li") === col("l0") + dli && col(s"${nm}_mi") === col("m0") + dmi
            && col(s"${nm}_fi") === col("chan"))
      val dl = col("dl"); val dm = col("dm")
      def blend(sfx: String) =
        (lit(1e0) - dl) * (lit(1e0) - dm) * col(s"c00_$sfx") +
          (lit(1e0) - dl) * dm * col(s"c01_$sfx") +
          dl * (lit(1e0) - dm) * col(s"c10_$sfx") +
          dl * dm * col(s"c11_$sfx")
      j.select(col("src_id"), col("chan"),
        blend("re").as("e_re"), blend("im").as("e_im"))
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
    })
}
