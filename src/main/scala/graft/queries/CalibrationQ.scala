package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.core.{CxCol, Tables}
import graft.operators.Calibrate
import SyntheticMs._

/** Calibration queries — SURVEY §2.6 G5 (jhj/jhr) and G6 (gauss_newton).
  *
  * G5's defining shape: every row scatter-adds into the gain grid of BOTH
  * its antennas — a 2-way union keyed by (time_index, ant) followed by one
  * partial+final aggregation; no wide shuffle of the visibility data (the
  * output is gain-grid sized).
  */
object CalibrationQ {

  /** Per-(row, chan) model/observed vis + weight, all dyadic. */
  private def calRows(s: SparkSession, dir: String): DataFrame = {
    val ch = broadcast(Tables.nation(s, dir).filter(col("n_nationkey") < 4)
      .select(col("n_nationkey").cast("long").as("chan")))
    uvwRows(s, dir, 16).select("row_id", "time_index", "ant1", "ant2")
      .crossJoin(ch)
      .withColumn("m_re", ((col("row_id") * 13 + col("chan") * 5) % 19 - 9) / 16e0)
      .withColumn("m_im", ((col("row_id") * 17 + col("chan") * 7) % 11 - 5) / 16e0)
      .withColumn("v_re", ((col("row_id") * 19 + col("chan") * 3) % 23 - 11) / 16e0)
      .withColumn("v_im", ((col("row_id") * 23 + col("chan") * 9) % 17 - 8) / 16e0)
      .withColumn("wt", ((col("row_id") + col("chan")) % 4 + 1) / 4e0)
  }

  val qs: Seq[Q] = Seq(

    // -- G5: JᴴR / JᴴJ accumulation into the (time, ant, chan) gain grid.
    Q("g05_jhj_jhr",
      s"""WITH rws AS (${uvwRowsSql(16)}), g AS (${gainsSql()}),
         |ch AS (SELECT CAST(n_nationkey AS BIGINT) AS chan
         |       FROM nation WHERE n_nationkey < 4),
         |rc AS (
         |  SELECT rws.row_id, rws.time_index, rws.ant1, rws.ant2, ch.chan,
         |    ((rws.row_id * 13 + ch.chan * 5) % 19 - 9) / 16e0 AS m_re,
         |    ((rws.row_id * 17 + ch.chan * 7) % 11 - 5) / 16e0 AS m_im,
         |    ((rws.row_id * 19 + ch.chan * 3) % 23 - 11) / 16e0 AS v_re,
         |    ((rws.row_id * 23 + ch.chan * 9) % 17 - 8) / 16e0 AS v_im,
         |    ((rws.row_id + ch.chan) % 4 + 1) / 4e0 AS wt
         |  FROM rws, ch),
         |j AS (
         |  SELECT rc.*, gp.g_re AS gp_re, gp.g_im AS gp_im,
         |    gq.g_re AS gq_re, gq.g_im AS gq_im
         |  FROM rc JOIN g gp ON gp.time_index = rc.time_index AND gp.ant = rc.ant1
         |          JOIN g gq ON gq.time_index = rc.time_index AND gq.ant = rc.ant2),
         |t AS (
         |  SELECT *,
         |    (gp_re*m_re - gp_im*m_im)*gq_re + (gp_re*m_im + gp_im*m_re)*gq_im AS vm_re,
         |    (gp_re*m_im + gp_im*m_re)*gq_re - (gp_re*m_re - gp_im*m_im)*gq_im AS vm_im
         |  FROM j),
         |u AS (
         |  SELECT time_index, ant1 AS ant, chan,
         |    wt * (vm_re*(v_im - vm_im) - vm_im*(v_re - vm_re)) AS jhr_c,
         |    wt * (vm_re*vm_re + vm_im*vm_im) AS jhj_c
         |  FROM t
         |  UNION ALL
         |  SELECT time_index, ant2 AS ant, chan,
         |    -(wt * (vm_re*(v_im - vm_im) - vm_im*(v_re - vm_re))) AS jhr_c,
         |    wt * (vm_re*vm_re + vm_im*vm_im) AS jhj_c
         |  FROM t)
         |SELECT time_index, ant, chan, SUM(jhr_c) AS jhr, SUM(jhj_c) AS jhj,
         |  CAST(COUNT(*) AS BIGINT) AS n_terms
         |FROM u GROUP BY time_index, ant, chan""".stripMargin) { (s, dir) =>
      val t = Predict.withGains(calRows(s, dir), gains(s, dir))
      val gp = CxCol(col("gp_re"), col("gp_im"))
      val gq = CxCol(col("gq_re"), col("gq_im"))
      val m = CxCol(col("m_re"), col("m_im"))
      val v = CxCol(col("v_re"), col("v_im"))
      val vm = gp * m * gq.conj
      val r = v - vm
      val jhrTerm = col("wt") * (vm.re * r.im - vm.im * r.re)
      val jhjTerm = col("wt") * vm.abs2
      val withVm = t
      val p = withVm.select(col("time_index"), col("ant1").as("ant"),
        col("chan"), jhrTerm.as("jhr_c"), jhjTerm.as("jhj_c"))
      val q = withVm.select(col("time_index"), col("ant2").as("ant"),
        col("chan"), (-jhrTerm).as("jhr_c"), jhjTerm.as("jhj_c"))
      p.unionByName(q)
        .groupBy("time_index", "ant", "chan")
        .agg(sum(col("jhr_c")).as("jhr"), sum(col("jhj_c")).as("jhj"),
          count(lit(1)).as("n_terms"))
    },

    // -- G6: Gauss-Newton phase solver (iterative driver loop; no SQL
    //    oracle — convergence is asserted in CalibrateSpec; the driver
    //    records a rows-only check).
    Q.noOracle("g06_gauss_newton") { (s, dir) =>
      // observed vis predicted from known per-(time, ant) phases; the
      // solver must reproduce them (up to the global phase gauge).
      val base = calRows(s, dir).limit(2000)
      val truePhase = (t: org.apache.spark.sql.Column,
                       a: org.apache.spark.sql.Column) =>
        (t * 7 + a * 3) % 11 * 5e-2
      val php = truePhase(col("time_index"), col("ant1"))
      val phq = truePhase(col("time_index"), col("ant2"))
      val gp = CxCol(cos(php), sin(php))
      val gq = CxCol(cos(phq), sin(phq))
      val m = CxCol(col("m_re"), col("m_im"))
      val vm = gp * m * gq.conj
      val in = base.select(col("time_index"), col("ant1"), col("ant2"),
        col("m_re"), col("m_im"),
        vm.re.as("v_re"), vm.im.as("v_im"), col("wt").as("w"))
      Calibrate.gaussNewtonPhaseOnly(in, maxIter = 15, tol = 1e-12)
    })
}
