package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream operators over the driver's `events` table (nanosecond
  * epoch `ts`). The reference is batch-only, but its A8 binner is a
  * session window in disguise (SURVEY §2.12) — these are the Structured
  * Streaming-facing counterparts our engine adds.
  */
object EventOps {

  /** Batch gap-based sessionization: a session closes when the gap to the
    * previous event exceeds `gapNanos`. One shuffle keyed by user; both
    * window passes share the partitioning. Scales: per-user state is a
    * running sum, never materialized per group. */
  def gapSessions(df: DataFrame, gapNanos: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    df.withColumn("new_s",
        when(col("ts") - lag(col("ts"), 1).over(w) > gapNanos, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("new_s")
  }

  final case class Ev(userId: Long, ts: Long, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class SessionOut(userId: Long, start: Long, end: Long, n: Long,
                              sum: Double)

  /** Streaming sessionization with explicit keyed state
    * (`flatMapGroupsWithState`): events for a user extend the open session
    * while within `gapNanos`; a larger gap emits the closed session and
    * opens a new one. Mirrors the A8 binner's greedy admit/close loop with
    * Spark-managed state instead of a per-group array. */
  def streamingSessions(ds: Dataset[Ev], gapNanos: Long): Dataset[SessionOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, events: Iterator[Ev], state: GroupState[SessionState]) =>
          // the per-trigger batch for one user must be time-ordered before
          // the greedy scan; memory here is bounded by ONE user's events in
          // ONE micro-batch (watermark-limited), not by observation length
          val sorted = events.toSeq.sortBy(e => (e.ts, e.value))
          var cur = state.getOption
          val out = Seq.newBuilder[SessionOut]
          for (e <- sorted) {
            cur match {
              case Some(s) if e.ts - s.last > gapNanos =>
                out += SessionOut(userId, s.start, s.last, s.n, s.sum)
                cur = Some(SessionState(e.ts, e.ts, 1L, e.value))
              case Some(s) =>
                cur = Some(SessionState(s.start, e.ts, s.n + 1L, s.sum + e.value))
              case None =>
                cur = Some(SessionState(e.ts, e.ts, 1L, e.value))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  final case class TypedEv(userId: Long, tus: Long, eventId: Long,
                           eventType: String)
  final case class TransState(lastType: String)
  final case class TransOut(prevType: String, eventType: String)

  /** Streaming face of the s15 Markov transition scan: per-user keyed
    * state is the LAST event type only — constant in stream length — and
    * each arriving event emits one (prev, next) pair. After any stream
    * prefix the emitted pair multiset equals the batch LAG over the
    * proven (tus, event_id) ordering, independent of micro-batch
    * boundaries (StreamingSpec proves parity across a mid-user split);
    * the downstream transition-count aggregation is an ordinary streaming
    * groupBy. */
  def streamingTransitions(ds: Dataset[TypedEv]): Dataset[TransOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.userId)
      .flatMapGroupsWithState[TransState, TransOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, events: Iterator[TypedEv], state: GroupState[TransState]) =>
          val sorted = events.toSeq.sortBy(e => (e.tus, e.eventId))
          var last = state.getOption.map(_.lastType)
          val out = Seq.newBuilder[TransOut]
          for (e <- sorted) {
            last.foreach(p => out += TransOut(p, e.eventType))
            last = Some(e.eventType)
          }
          last.foreach(t => state.update(TransState(t)))
          out.result().iterator
      }
  }

  final case class AttrState(ftId: Long, ltId: Long, ltTus: Long)
  final case class AttrOut(eventId: Long, userId: Long, ltId: Option[Long],
                           ftId: Option[Long], gapUs: Option[Long])

  /** Streaming face of s22 first/last-touch attribution: per-user keyed
    * state carries exactly three longs (first touch id, last touch id +
    * its µs timestamp), so a user of any history length streams with
    * constant state. Purchases emit their attribution row immediately;
    * touches (click/view) update the state. Rows inside a micro-batch are
    * (tus, event_id)-sorted to the batch query's proven ordering; across
    * batches the state carries the prefix. */
  def streamingAttribution(ds: Dataset[TypedEv]): Dataset[AttrOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.userId)
      .flatMapGroupsWithState[AttrState, AttrOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[TypedEv], state: GroupState[AttrState]) =>
          val sorted = events.toSeq.sortBy(e => (e.tus, e.eventId))
          var st = state.getOption.getOrElse(AttrState(-1L, -1L, -1L))
          val out = Seq.newBuilder[AttrOut]
          for (e <- sorted) {
            if (e.eventType == "purchase")
              out += AttrOut(e.eventId, user,
                if (st.ltId >= 0) Some(st.ltId) else None,
                if (st.ftId >= 0) Some(st.ftId) else None,
                if (st.ltTus >= 0) Some(e.tus - st.ltTus) else None)
            else if (e.eventType == "click" || e.eventType == "view") {
              st = AttrState(if (st.ftId >= 0) st.ftId else e.eventId,
                e.eventId, e.tus)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  final case class TsTypedEv(userId: Long, tus: Long, eventId: Long,
                             eventType: String, ts: java.sql.Timestamp)
  final case class TsTransOut(prevType: String, eventType: String,
                              late: Boolean)

  /** Watermark-reordered s15 Markov transitions (round 12): the
    * [[streamingTransitions]] pair scan under the [[ReorderBuffer]]
    * combinator — per user, events fold through the last-type state in
    * EVENT-TIME order once the watermark seals them, so any in-horizon
    * delivery yields the batch LAG pair multiset bit for bit (disorder
    * would otherwise emit (prev, next) pairs that never existed in event
    * time). A horizon-exceeding straggler folds at arrival after the
    * sealed rows (append-at-tail): it emits (lastSealedType, straggler)
    * flagged `late` and becomes the new prefix for FUTURE pairs — sealed
    * pairs are immutable, the same backfill contract as the attribution
    * face. State per user = one string + the in-horizon buffer. */
  def streamingTransitionsReordered(ds: Dataset[TsTypedEv],
                                    horizon: String = "10 seconds")
      : Dataset[TsTransOut] = {
    import ds.sparkSession.implicits._
    implicit val ord: Ordering[AttrBufRow] =
      Ordering.by(r => (r.tsMs, r.tus, r.eventId))
    ReorderBuffer.run[Long, TsTypedEv, AttrBufRow, TransState, TsTransOut](
      ds, "ts", horizon)(
      _.userId,
      e => AttrBufRow(e.ts.getTime, e.tus, e.eventId, e.eventType),
      _.tsMs)(
      TransState(null),
      (_, st, e, late) => (TransState(e.eventType),
        Option(st.lastType).map(p => TsTransOut(p, e.eventType, late))),
      lateBeforeRipe = false)
  }
  final case class AttrBufRow(tsMs: Long, tus: Long, eventId: Long,
                              eventType: String)
  final case class TsAttrOut(eventId: Long, userId: Long, ltId: Option[Long],
                             ftId: Option[Long], gapUs: Option[Long],
                             late: Boolean)

  /** Watermark-reordered s22 attribution (round 12, VERDICT item 2):
    * [[streamingAttribution]] made CORRECT under bounded disorder — the
    * face where disorder silently CHANGES answers (first/last-touch is
    * order-sensitive: a click delivered after the purchase it preceded
    * steals or loses the credit without any counter firing). Rides the
    * [[ReorderBuffer]] combinator: per user, events buffer until the
    * watermark seals them, then fold through the (first, last, last_tus)
    * state in EVENT-TIME order — so any delivery whose lateness stays
    * inside the horizon yields bit-identical attribution rows to ordered
    * delivery (= the batch s22 window semantics; StreamingSpec proves
    * both). A horizon-exceeding straggler folds at arrival after the
    * batch's sealed rows (append-at-tail policy), flagged `late` and
    * counted in [[StreamingMl.orderViolations]]: a late PURCHASE credits
    * the touch state as of its arrival; a late TOUCH updates state
    * forward only (sealed purchases keep their emitted credit) — exactly
    * the reconciliation a production backfill would re-derive. Event-time
    * ordering (tsMs, tus, eventId) equals the batch (tus, event_id) order
    * because tsMs = tus/1000 is monotone in tus. State per user = three
    * longs + the in-horizon buffer (horizon density, not history). */
  def streamingAttributionReordered(ds: Dataset[TsTypedEv],
                                    horizon: String = "10 seconds")
      : Dataset[TsAttrOut] = {
    import ds.sparkSession.implicits._
    implicit val ord: Ordering[AttrBufRow] =
      Ordering.by(r => (r.tsMs, r.tus, r.eventId))
    ReorderBuffer.run[Long, TsTypedEv, AttrBufRow, AttrState, TsAttrOut](
      ds, "ts", horizon)(
      _.userId,
      e => AttrBufRow(e.ts.getTime, e.tus, e.eventId, e.eventType),
      _.tsMs)(
      AttrState(-1L, -1L, -1L),
      (user, st, e, late) =>
        if (e.eventType == "purchase")
          (st, Some(TsAttrOut(e.eventId, user,
            if (st.ltId >= 0) Some(st.ltId) else None,
            if (st.ftId >= 0) Some(st.ftId) else None,
            if (st.ltTus >= 0) Some(e.tus - st.ltTus) else None, late)))
        else if (e.eventType == "click" || e.eventType == "view")
          (AttrState(if (st.ftId >= 0) st.ftId else e.eventId,
            e.eventId, e.tus), None)
        else (st, None),
      lateBeforeRipe = false)
  }

  final case class BdaRow(rowId: Long, ant1: Long, ant2: Long, time: Double,
                          ivl: Double, u: Double, v: Double, w: Double)
  final case class BdaState(bin: Long, tsLow: Double,
                            u0: Double, v0: Double, w0: Double)
  final case class BdaAssign(rowId: Long, ant1: Long, ant2: Long, bin: Long)

  /** Streaming face of the BDA binner (Bda.mapperWithPayload's close
    * rule): per-baseline keyed state carries only the open bin's scalars
    * (bin index, lower time edge, reference uvw), so an observation of
    * any length streams through with constant state. Rows inside one
    * micro-batch are time-sorted before the greedy scan; ACROSS batches
    * the binner relies on per-baseline arrival order, which a watermarked
    * upstream sort guarantees. Auto-correlations take the reference's
    * never-close fast path. */
  def streamingBdaBins(ds: Dataset[BdaRow], cfg: Bda.Config): Dataset[BdaAssign] = {
    import ds.sparkSession.implicits._
    val closeThresh = {
      val x = math.Pi * cfg.decorrelation
      if (x == 0.0) 1.0 else math.sin(x) / x
    }
    val fringeScale =
      cfg.maxChanFreq * math.sin(math.abs(cfg.maxLm)) * math.Pi / Bda.C
    ds.groupByKey(r => (r.ant1, r.ant2))
      .flatMapGroupsWithState[BdaState, BdaAssign](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, Long), rows: Iterator[BdaRow], state: GroupState[BdaState]) =>
          val (a1, a2) = key
          val sorted = rows.toSeq.sortBy(r => (r.time, r.rowId))
          var cur = state.getOption
          val out = Seq.newBuilder[BdaAssign]
          for (r <- sorted) {
            cur = cur match {
              case None =>
                Some(BdaState(0L, r.time - r.ivl / 2.0, r.u, r.v, r.w))
              case Some(s) if a1 != a2 =>
                val du = r.u - s.u0; val dv = r.v - s.v0; val dw = r.w - s.w0
                val halfPsi =
                  math.sqrt(du * du + dv * dv + dw * dw) * fringeScale + 1.0e-8
                val blDecorr = math.sin(halfPsi) / halfPsi
                val dt = r.time + r.ivl / 2.0 - s.tsLow
                if (blDecorr < closeThresh || dt > cfg.timeBinSecs)
                  Some(BdaState(s.bin + 1L, r.time - r.ivl / 2.0, r.u, r.v, r.w))
                else Some(s)
              case some => some // auto-corr: never closes
            }
            out += BdaAssign(r.rowId, a1, a2, cur.get.bin)
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }
}
