package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.CxCol

/** Phase-only gain calibration — SURVEY §2.6 G5/G6
  * (africanus/calibration/phase_only/phase_only.py:30-308).
  *
  * G5 building blocks: each visibility row contributes to the (time, ant)
  * gain grid of BOTH its antennas — implemented as a 2-way union (row
  * exploded into p- and q-keyed contributions) followed by one
  * groupBy(time_index, ant) partial+final aggregation:
  *   jhr_p = Σ w·Im(conj(v_model)·r),  jhr_q = −jhr_p's term,
  *   jhj   = Σ w·|v_model|²,           r = v − v_model.
  *
  * G6 driver loop: iterate jhr/jhj → φ += ½·jhr/jhj → re-predict, until
  * max|Δφ| < tol or maxIter. Each iteration is one Spark job over a cached
  * input; lineage growth is bounded by materializing the small phase table
  * to the driver each step (it is (time × ant) — dimension-table sized —
  * so this is a broadcast-scale collect, not a data collect).
  */
object Calibrate {

  /** Input df columns: time_index, ant1, ant2, m_re, m_im (model), v_re,
    * v_im (observed), w (weight). Returns (time_index, ant, phase). */
  def gaussNewtonPhaseOnly(df: DataFrame, maxIter: Int = 20,
                           tol: Double = 1e-10): DataFrame = {
    val spark = df.sparkSession
    val in = df.select("time_index", "ant1", "ant2",
      "m_re", "m_im", "v_re", "v_im", "w").cache()

    // phase grid: every (time, ant) appearing on either side
    var phases: Map[(Long, Long), Double] =
      in.select(col("time_index"), col("ant1").as("ant"))
        .union(in.select(col("time_index"), col("ant2").as("ant")))
        .distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> 0.0).toMap

    val s0 = spark
    import s0.implicits._

    var it = 0
    var maxDelta = Double.MaxValue
    while (it < maxIter && maxDelta > tol) {
      val phDf = phases.toSeq.map { case ((t, a), p) => (t, a, p) }
        .toDF("pt", "pa", "ph")
      val pp = broadcast(phDf.select(col("pt").as("tp"), col("pa").as("ap"),
        col("ph").as("php")))
      val pq = broadcast(phDf.select(col("pt").as("tq"), col("pa").as("aq"),
        col("ph").as("phq")))
      val withG = in
        .join(pp, col("time_index") === col("tp") && col("ant1") === col("ap"))
        .join(pq, col("time_index") === col("tq") && col("ant2") === col("aq"))
      val gp = CxCol(cos(col("php")), sin(col("php")))
      val gq = CxCol(cos(col("phq")), sin(col("phq")))
      val m = CxCol(col("m_re"), col("m_im"))
      val v = CxCol(col("v_re"), col("v_im"))
      val vm = gp * m * gq.conj
      val r = v - vm
      val jhrTerm = col("w") * (vm.re * r.im - vm.im * r.re)
      val jhjTerm = col("w") * vm.abs2
      val p = withG.select(col("time_index"), col("ant1").as("ant"),
        jhrTerm.as("jhr_c"), jhjTerm.as("jhj_c"))
      val q = withG.select(col("time_index"), col("ant2").as("ant"),
        (-jhrTerm).as("jhr_c"), jhjTerm.as("jhj_c"))
      val upd = p.unionByName(q)
        .groupBy("time_index", "ant")
        .agg((sum(col("jhr_c")) / sum(col("jhj_c"))).as("ratio"))
        .collect()
      maxDelta = 0.0
      val next = phases ++ upd.map { row =>
        val key = (row.getLong(0), row.getLong(1))
        val d = 0.5 * row.getDouble(2)
        maxDelta = math.max(maxDelta, math.abs(d))
        key -> (phases(key) + d)
      }
      phases = next
      it += 1
    }
    in.unpersist()
    phases.toSeq.map { case ((t, a), ph) => (t, a, ph) }
      .sortBy(r => (r._1, r._2))
      .toDF("time_index", "ant", "phase")
  }
}
