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
  * max|Δφ| < tol or maxIter. The phase grid lives as a DataFrame for the
  * whole solve: each iteration broadcasts it into the gather joins,
  * updates it with a LEFT join against the aggregated step, and truncates
  * lineage with an eager localCheckpoint. The ONLY driver-side value per
  * iteration is the scalar max|Δφ| — at the reference's real gain shape
  * (time × ant × chan × dir, phase_only.py:30-241) the grid never fits on
  * the driver, and nothing here requires it to.
  */
object Calibrate {

  /** Input df columns: time_index, ant1, ant2, m_re, m_im (model), v_re,
    * v_im (observed), w (weight). Returns (time_index, ant, phase). */
  def gaussNewtonPhaseOnly(df: DataFrame, maxIter: Int = 20,
                           tol: Double = 1e-10): DataFrame = {
    val spark = df.sparkSession
    val in = df.select("time_index", "ant1", "ant2",
      "m_re", "m_im", "v_re", "v_im", "w").cache()

    // phase grid: every (time, ant) appearing on either side — a cached
    // DataFrame, never collected
    var phases: DataFrame =
      in.select(col("time_index"), col("ant1").as("ant"))
        .union(in.select(col("time_index"), col("ant2").as("ant")))
        .distinct()
        .withColumn("phase", lit(0.0))
        .localCheckpoint()

    var it = 0
    var maxDelta = Double.MaxValue
    while (it < maxIter && maxDelta > tol) {
      val pp = broadcast(phases.select(col("time_index").as("tp"),
        col("ant").as("ap"), col("phase").as("php")))
      val pq = broadcast(phases.select(col("time_index").as("tq"),
        col("ant").as("aq"), col("phase").as("phq")))
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
      val step = p.unionByName(q)
        .groupBy("time_index", "ant")
        .agg((lit(0.5) * sum(col("jhr_c")) / sum(col("jhj_c"))).as("d"))
      // grid update entirely on the cluster; eager localCheckpoint
      // truncates lineage so iteration cost stays constant
      val ckpt = phases.join(step, Seq("time_index", "ant"), "left")
        .select(col("time_index"), col("ant"),
          (col("phase") + coalesce(col("d"), lit(0.0))).as("phase"),
          coalesce(col("d"), lit(0.0)).as("d"))
        .localCheckpoint()
      // rewrap the checkpointed RDD in a fresh DataFrame: localCheckpoint
      // keeps the child plan's STATISTICS, and this loop joins the grid
      // against two broadcasts of itself — the size estimate would cube
      // every iteration and Catalyst's BigInt stats arithmetic becomes the
      // (exponential) bottleneck after ~15 iterations
      val next = spark.createDataFrame(ckpt.rdd, ckpt.schema)
      // the ONE driver-side scalar per iteration
      maxDelta = next.agg(max(abs(col("d")))).head().getDouble(0)
      phases = next.drop("d")
      it += 1
    }
    in.unpersist()
    phases.orderBy("time_index", "ant")
  }
}
