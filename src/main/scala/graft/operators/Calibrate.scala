package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
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
  * whole solve — the ONLY driver-side value is the scalar max|Δφ|; at the
  * reference's real gain shape (time × ant × chan × dir,
  * phase_only.py:30-241) the grid never fits on the driver, and nothing
  * here requires it to.
  *
  * Iteration constants (the local-latency side of the distributed design):
  *  - ONE broadcast of the grid per iteration serves BOTH gather sides —
  *    the p- and q-joins reference the same broadcast plan through two
  *    aliases, and exchange reuse ships it once;
  *  - grid materialization (RDD localCheckpoint) and the max|Δφ|
  *    convergence scalar happen in the SAME job (the reduce runs as the
  *    checkpoint caches), halving the per-iteration job count.
  *    `checkEvery` > 1 would skip intermediate checkpoints, but the
  *    update plan contains the data-sized jhr/jhj aggregation — letting
  *    it stack makes every broadcast re-execute the stacked aggs, which
  *    measured 6× SLOWER than checkpointing each iteration; keep 1;
  *  - each materialized checkpoint is unpersisted as soon as its
  *    successor exists, so executor block storage holds ≤2 grid copies
  *    instead of one per iteration.
  */
object Calibrate {

  /** Input df columns: time_index, ant1, ant2, m_re, m_im (model), v_re,
    * v_im (observed), w (weight). Returns (time_index, ant, phase). */
  def gaussNewtonPhaseOnly(df: DataFrame, maxIter: Int = 20,
                           tol: Double = 1e-10,
                           checkEvery: Int = 1): DataFrame = {
    val spark = df.sparkSession
    val in = df.select("time_index", "ant1", "ant2",
      "m_re", "m_im", "v_re", "v_im", "w").cache()

    // phase grid: every (time, ant) appearing on either side — a
    // checkpointed RDD-backed DataFrame, never collected
    val grid0 = in.select(col("time_index"), col("ant1").as("ant"))
      .union(in.select(col("time_index"), col("ant2").as("ant")))
      .distinct()
      .withColumn("phase", lit(0.0))
    var ckptRdd: RDD[Row] = grid0.rdd.localCheckpoint()
    ckptRdd.count() // eager: downstream iterations read blocks, not lineage
    var prevRdd: RDD[Row] = null
    // fresh LogicalRDD wrap: localCheckpoint alone keeps the child plan's
    // STATISTICS, and this loop joins the grid against a broadcast of
    // itself — the size estimate would cube every iteration and Catalyst's
    // BigInt stats arithmetic becomes the (exponential) bottleneck
    var phases: DataFrame = spark.createDataFrame(ckptRdd, grid0.schema)

    var it = 0
    var maxDelta = Double.MaxValue
    while (it < maxIter && maxDelta > tol) {
      val b = broadcast(phases)
      val withG = in.as("x")
        .join(b.as("gp"), col("x.time_index") === col("gp.time_index")
          && col("x.ant1") === col("gp.ant"))
        .join(b.as("gq"), col("x.time_index") === col("gq.time_index")
          && col("x.ant2") === col("gq.ant"))
      val gp = CxCol(cos(col("gp.phase")), sin(col("gp.phase")))
      val gq = CxCol(cos(col("gq.phase")), sin(col("gq.phase")))
      val m = CxCol(col("m_re"), col("m_im"))
      val v = CxCol(col("v_re"), col("v_im"))
      val vm = gp * m * gq.conj
      val r = v - vm
      val jhrTerm = col("w") * (vm.re * r.im - vm.im * r.re)
      val jhjTerm = col("w") * vm.abs2
      val p = withG.select(col("x.time_index").as("time_index"),
        col("x.ant1").as("ant"), jhrTerm.as("jhr_c"), jhjTerm.as("jhj_c"))
      val q = withG.select(col("x.time_index").as("time_index"),
        col("x.ant2").as("ant"), (-jhrTerm).as("jhr_c"), jhjTerm.as("jhj_c"))
      val step = p.unionByName(q)
        .groupBy("time_index", "ant")
        .agg((lit(0.5) * sum(col("jhr_c")) / sum(col("jhj_c"))).as("d"))
      val updated = phases.join(step, Seq("time_index", "ant"), "left")
        .select(col("time_index"), col("ant"),
          (col("phase") + coalesce(col("d"), lit(0.0))).as("phase"),
          coalesce(col("d"), lit(0.0)).as("d"))
      it += 1
      if (it % checkEvery == 0 || it >= maxIter) {
        // materialize the grid AND compute the convergence scalar in one
        // job: localCheckpoint caches the partitions as this reduce runs
        val rdd = updated.rdd.localCheckpoint()
        maxDelta = rdd
          .map(row => math.abs(row.getDouble(3)))
          .fold(0.0)(math.max)
        if (prevRdd != null) prevRdd.unpersist(blocking = false)
        prevRdd = ckptRdd
        ckptRdd = rdd
        phases = spark.createDataFrame(rdd, updated.schema).drop("d")
      } else {
        // between checkpoints the plan stacks ≤(checkEvery−1) join
        // layers over the last checkpointed grid. WARNING (measured):
        // each of those layers re-executes its own data-sized joins and
        // nested broadcasts every time the stacked plan is broadcast
        // again — checkEvery = 3 ran 40× SLOWER than 1 on g06. Keep
        // checkEvery = 1 unless the fact table is large enough that the
        // per-iteration materialize job dominates the replayed joins.
        phases = updated.drop("d")
      }
    }
    in.unpersist()
    phases.orderBy("time_index", "ant")
  }
}
