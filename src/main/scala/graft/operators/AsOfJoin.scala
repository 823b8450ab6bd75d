package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — for each left row, the most recent right row with
  * `rightTs <= leftTs` on the same key. Spark has no native operator for
  * this; the classic scale shape is the UNION-SORT trick:
  *
  *   tag both inputs, union them, and run ONE keyed window ordered by
  *   (ts, side) carrying `last_value(right payload, ignoreNulls)` forward
  *   — each left row then reads the latest right row at or before it.
  *
  * Cost: a single hash shuffle of |L| + |R| rows on the key plus a
  * per-partition sort — no range explosion, no per-key collect, skew
  * bounded by the hottest key exactly like any keyed window. This beats
  * the non-equi-join formulation (O(|L|·|R|) per key) at any scale, and
  * it is the same plan DuckDB's native ASOF JOIN lowers to.
  */
object AsOfJoin {

  /** @param left     rows to enrich
    * @param right    reference rows (e.g. state changes)
    * @param key      join key column name (same on both sides)
    * @param ts       event-time column name (same on both sides);
    *                 comparisons are `right.ts <= left.ts`
    * @param rightCols right-side payload columns to carry (renamed as
    *                 given); all other right columns are dropped
    * @return left rows + the matched right payload (null when no right
    *         row precedes the left row)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           rightCols: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val aliases = rightCols.values.toSeq
    val clash = aliases.toSet.intersect(leftCols.toSet)
    require(clash.isEmpty,
      s"right payload aliases collide with left columns: $clash")
    val reserved = Set("_side", "_pay")
    require(!leftCols.exists(reserved) && !aliases.exists(reserved) &&
      !reserved(key) && !reserved(ts),
      s"column names $reserved are reserved by asOf")
    require(!aliases.contains(key) && !aliases.contains(ts),
      "right payload aliases must not shadow the key/ts columns")
    // side 0 sorts before side 1 at equal ts → a right row AT the left
    // row's timestamp matches (the <= convention, DuckDB ASOF default)
    val r = right.select(
      col(key) +: col(ts) +: rightCols.toSeq.map { case (c, a) => col(c).as(a) }: _*)
      .withColumn("_side", lit(0))
    val l = left.withColumn("_side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // the payload columns extend the sort so EQUAL-TS right rows have a
    // deterministic winner (the greatest payload): without them the tie
    // falls to shuffle-arrival order, which differs across executor
    // layouts (round-12 multi-JVM finding). Left rows carry null aliases
    // — irrelevant to their order, _side already separates the sides.
    // AsOfJoinExec pins the identical rule via requiredChildOrdering.
    val w = Window.partitionBy(key)
      .orderBy(col(ts) +: col("_side") +: aliases.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the payload is carried as ONE struct built only on right-side rows:
    // `last(ignoreNulls)` then lands on the matched right ROW atomically,
    // so a NULL payload value inside the matched row stays null instead of
    // resurrecting a stale value from an earlier right row (and multiple
    // payload columns can never mix across rows)
    val payload = when(col("_side") === 0, struct(aliases.map(col): _*))
    val carried = unioned
      .withColumn("_pay", last(payload, ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        aliases.map(a => col(s"_pay.$a").as(a)): _*)
  }

  final case class AsOfEvent(key: Long, ts: Long, isRight: Boolean,
                             id: Long, payload: Long)
  final case class AsOfState(ts: Long, payload: Long)
  final case class AsOfMatch(id: Long, key: Long, matched: Option[Long])

  /** STREAMING as-of enrichment: one interleaved stream of left rows and
    * right (state-change) rows; every left row is matched to the latest
    * right row at or before it. Keyed state is ONE (ts, payload) pair —
    * constant in stream length, the streaming face of [[asOf]] exactly as
    * `EventOps.streamingSessions` is of the batch sessionizer. Rows
    * within a micro-batch are event-time sorted before the scan; across
    * batches the operator relies on per-key arrival order (watermarked
    * upstream sort), the same contract as the streaming BDA binner. */
  def streamingAsOf(ds: org.apache.spark.sql.Dataset[AsOfEvent])
      : org.apache.spark.sql.Dataset[AsOfMatch] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[AsOfState, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, events, state) =>
          // rights sort before lefts at equal ts — the <= convention
          val sorted = events.toSeq.sortBy(e => (e.ts, if (e.isRight) 0 else 1, e.id))
          var cur = state.getOption
          val out = Seq.newBuilder[AsOfMatch]
          for (e <- sorted) {
            if (e.isRight) {
              if (cur.forall(_.ts <= e.ts)) cur = Some(AsOfState(e.ts, e.payload))
            } else out += AsOfMatch(e.id, key, cur.map(_.payload))
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }
}
