package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Pipeline observability via `Dataset.observe`: named data-quality
  * metrics (row counts, null counts, value bounds) accumulate ON the
  * existing pass — no second scan of a 100 TB input — and surface through
  * a `QueryExecutionListener` after each action (or
  * `StreamingQueryProgress.observedMetrics` per micro-batch on a stream).
  * This is the monitoring face a production ingest wraps around every
  * stage boundary: the metrics ride the job, the listener records them.
  */
object Observability {

  /** Attach a standard data-quality observation to a stage boundary:
    * row count plus per-column null counts for `cols`. */
  def observed(df: DataFrame, name: String, cols: String*): DataFrame = {
    val nulls = cols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    df.observe(name, count(lit(1)).as("rows"), nulls: _*)
  }

  /** Listener capturing every observation of every completed action,
    * keyed by observation name. Register once per session (idempotent by
    * instance). */
  final class MetricsListener extends QueryExecutionListener {
    private val metrics = new ConcurrentHashMap[String, Row]()

    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        metrics.put(name, row)
      }

    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = ()

    /** The last observed metrics row for `name`, if any action carrying
      * the observation has completed. */
    def get(name: String): Option[Row] = Option(metrics.get(name))

    def clear(): Unit = metrics.clear()
  }

  /** Install a fresh listener on the session and return it. */
  def install(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    l
  }
}
