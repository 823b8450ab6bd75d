package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Det
import graft.functions.Kernels
import graft.operators.WStack
import graft.queries.SyntheticMs._

/** Cost-vs-accuracy probe for the ε-controlled gridder: times the snapped
  * 5-tap path (the f09 oracle operating point) against the ES-kernel
  * fractional path at half-support 2 and 3 on the same sf0.1 load, at 1×
  * and a 10× in-memory replica. The fractional path scatters (2w+1)²
  * cells per visibility vs 25 — the probe records what that factor costs
  * in wall-clock next to what it buys in accuracy (see
  * WGridderAccuracySpec: snap floor 1.2e-3 → 1.9e-4 at w=2 → w-term-bound
  * 2.9e-5 at w=3). Results go to BASELINE.md.
  */
object GridProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    import graft.queries.GriddingQ.Taps

    val base = uvwRows(spark, sf, 16)
      .join(corrVis(spark, sf, 16), "row_id")
      .select(col("row_id"), col("w"), col("u"), col("v"),
        col("xx_re").as("re"), col("xx_im").as("im"))
    val maxId = base.agg(max("row_id")).collect()(0).getLong(0) + 1

    def repl(k: Int) = (0 until k)
      .map(i => base.withColumn("row_id", col("row_id") + lit(i * maxId)))
      .reduce(_ unionAll _)

    spark.range(1L << 22).selectExpr("sum(id * 3)").collect() // warmup
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    println("k,mode,cells_per_vis,seconds")
    for (k <- Seq(1, 10)) {
      val rows = repl(k)
      val snapped = rows.select(col("row_id"), col("w"),
        round(col("u") * 25e-2).cast("long").as("pu"),
        round(col("v") * 25e-2).cast("long").as("pv"),
        col("re"), col("im"))
      val frac = rows.select(col("row_id"), col("w"),
        (col("u") * 25e-2).as("cu"), (col("v") * 25e-2).as("cv"),
        col("re"), col("im"))
      val tSnap = time {
        WStack.planeGrids(snapped, Taps, nPlanes = 4, wMax = 5.0,
          eta = 1e-2, fsum = c => Det.fsum(c))
          .write.mode("overwrite").format("noop").save()
      }
      println(s"$k,snapped_5tap,25,$tSnap")
      for (w <- Seq(2, 3)) {
        val t = time {
          WStack.planeGridsFrac(frac, w, Kernels.esBeta(w),
            nPlanes = 4, wMax = 5.0, eta = 1e-2, fsum = c => Det.fsum(c))
            .write.mode("overwrite").format("noop").save()
        }
        println(s"$k,es_frac_w$w,${(2 * w + 1) * (2 * w + 1)},$t")
      }
      // the deep-ε tier: two-plane w-interp at W=5 (esTierFor(1e-6)) —
      // 2x the scatter rows of the snap path, nPlanes-free on sparse data
      val (w2, np2) = Kernels.esTierFor(1e-6)
      val tW2 = time {
        WStack.planeGridsFracW2(frac, w2, Kernels.esBeta(w2),
          nPlanes = np2, wMax = 5.0, fsum = c => Det.fsum(c))
          .write.mode("overwrite").format("noop").save()
      }
      println(s"$k,es_winterp_w$w2,${2 * (2 * w2 + 1) * (2 * w2 + 1)},$tW2")
    }
    spark.stop()
  }
}
