package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from per-subsystem registries under graft.queries.
  */
object SparkEntry {

  /** All verifiable queries, in registration order. */
  def registry: Seq[Q] =
    _root_.graft.queries.Relational.qs ++
      _root_.graft.queries.Rime.qs ++
      _root_.graft.queries.Predict.qs ++
      _root_.graft.queries.AveragingQ.qs ++
      _root_.graft.queries.ArrayMsQ.qs ++
      _root_.graft.queries.BdaQ.qs ++
      _root_.graft.queries.TrainingData.qs ++
      _root_.graft.queries.CalibrationQ.qs ++
      _root_.graft.queries.GriddingQ.qs ++
      _root_.graft.queries.FusedRime.qs ++
      _root_.graft.queries.EventsQ.qs ++
      _root_.graft.queries.MediaQ.qs ++
      _root_.graft.queries.RimeMore.qs ++
      _root_.graft.queries.ModelFit.qs ++
      _root_.graft.queries.PredictFull.qs ++
      _root_.graft.queries.MultiMsQ.qs ++
      _root_.graft.queries.DeconvQ.qs ++
      _root_.graft.queries.PipelineQ.qs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.sql.map(q.name -> _)).toMap
}
