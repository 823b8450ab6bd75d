package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Det

/** Scaling probe: replicate the sf0.1 fact tables k× (keys shifted so
  * cardinalities scale too) and time the three canonical plan shapes —
  * scan+aggregate, fact-fact join+aggregate, and the broadcast-expansion
  * source sum — at k = 1, 2, 4, 10. Near-linear wall-clock in k means the
  * plan has no super-linear shuffle or driver bottleneck; results are
  * recorded in BASELINE.md.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    val li0 = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice", "l_discount", "l_returnflag", "l_quantity")
    val o0 = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey")
    val maxKey = li0.agg(max("l_orderkey")).collect()(0).getLong(0) + 1

    def repl(df: DataFrame, keyCol: String, k: Int): DataFrame =
      (0 until k).map(i => df.withColumn(keyCol, col(keyCol) + lit(i * maxKey)))
        .reduce(_ unionAll _)

    spark.range(1L << 22).selectExpr("sum(id * 3)").collect() // warmup

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    println("k,rows,agg_s,join_s,predict_s")
    for (k <- Seq(1, 2, 4, 10)) {
      val li = repl(li0, "l_orderkey", k)
      val o = repl(o0, "o_orderkey", k)
      val nRows = k * 600572L
      val tAgg = time {
        li.groupBy("l_returnflag")
          .agg(sum(Det.cents(col("l_extendedprice"))).as("c"),
            count(lit(1)).as("n"))
          .write.mode("overwrite").format("noop").save()
      }
      val tJoin = time {
        li.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_custkey")
          .agg(sum(Det.cents(col("l_extendedprice"))).as("c"))
          .write.mode("overwrite").format("noop").save()
      }
      val tPredict = time {
        // broadcast-expansion source sum over k x the row table
        val src = broadcast(spark.range(5).select(
          col("id").as("src_id"), (col("id") * 1e-2 - 2e-2).as("l"),
          (lit(1e-2) - col("id") * 5e-3).as("m")))
        val rws = li.select(col("l_orderkey").as("row_id"),
          ((col("l_orderkey") % 2001 - 1000) / 2e0).as("u"),
          ((col("l_orderkey") * 3 % 2001 - 1000) / 2e0).as("v"),
          ((col("l_orderkey") * 7 % 201 - 100) / 2e1).as("w"))
        val ph = graft.functions.Phase.phaseDelay(col("l"), col("m"),
          col("u"), col("v"), col("w"), lit(1.4e9))
        rws.crossJoin(src)
          .groupBy("row_id")
          .agg(sum(ph.re).as("vre"), sum(ph.im).as("vim"))
          .write.mode("overwrite").format("noop").save()
      }
      println(f"$k,$nRows,$tAgg%.2f,$tJoin%.2f,$tPredict%.2f")
    }
    spark.stop()
  }
}
