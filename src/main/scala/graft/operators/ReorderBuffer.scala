package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The watermarked reorder-buffer combinator — round-11's dedup/packing
  * pattern extracted once (round-12, VERDICT item 2) so every
  * order-SENSITIVE streaming face shares one proven buffer+frontier
  * implementation instead of re-deriving it per operator.
  *
  * Contract: rows carry an event time; per key the operator BUFFERS
  * arrivals and folds them into the caller's domain state in EVENT-TIME
  * order (ties broken by the caller's full ordering) once the stream's
  * watermark seals them — so any delivery order whose lateness stays
  * inside the watermark horizon yields bit-identical outputs to ordered
  * delivery. A row arriving BEHIND the already-emitted frontier (its
  * event-time slot was sealed — a horizon-exceeding straggler) cannot be
  * inserted retroactively: it is folded at arrival (stragglers sorted
  * among themselves), handed to the fold with `late = true`, and counted
  * in [[StreamingMl.orderViolations]] — the at-least-once caveat
  * documented there applies. Whether stragglers fold before or after the
  * batch's ripe rows is the per-operator `lateBeforeRipe` policy (dedup
  * counts copies first; packing appends at the current tail).
  *
  * Scale shape: state per key = the caller's domain state (constant by
  * contract) + the in-horizon buffer, bounded by rows-per-key within ONE
  * watermark horizon — (key cardinality × horizon density), the same
  * bound a shuffle-per-window batch job would hold, never stream length.
  * Buffered rows drain by event-time timeouts: a group with a non-empty
  * buffer re-fires as soon as the watermark reaches its oldest buffered
  * row, so outputs drain without new arrivals on that key.
  */
object ReorderBuffer {

  /** Keyed state: caller's domain fold state, the in-horizon buffer, and
    * the emission frontier (the LAST row folded as ripe — everything
    * ordered ≤ it has had its verdict emitted). */
  final case class State[S, R](domain: S, buf: List[R], frontier: Option[R])

  /** @param ds       watermark-ABLE input (must expose `tsField`)
    * @param tsField  the event-time column `withWatermark` binds to
    * @param horizon  watermark delay — the disorder bound the operator
    *                 corrects for
    * @param key      grouping key (the reorder scope)
    * @param toRow    projection to the buffered row type (keep it small —
    *                 this is what sits in the state store)
    * @param tsMs     event time of a buffered row, in epoch ms (must be
    *                 consistent with `tsField`'s watermark clock)
    * @param init     initial domain state for a fresh key
    * @param fold     (key, state, row, late) → (state', emitted row) —
    *                 called exactly once per input row, in sealed
    *                 event-time order for in-horizon rows
    * @param lateBeforeRipe straggler policy: fold stragglers before
    *                 (dedup-style) or after (packing-style append-at-tail)
    *                 the current batch's ripe rows
    * @param ord      TOTAL order on rows: event time first, then the
    *                 operator's deterministic tiebreak */
  def run[K: Encoder, I, R, S, O: Encoder](
      ds: Dataset[I], tsField: String, horizon: String)(
      key: I => K, toRow: I => R, tsMs: R => Long)(
      init: => S,
      fold: (K, S, R, Boolean) => (S, Option[O]),
      lateBeforeRipe: Boolean)(
      implicit ord: Ordering[R],
      stateEnc: Encoder[State[S, R]]): Dataset[O] = {
    val viol = StreamingMl.orderViolations(ds.sparkSession)
    ds.withWatermark(tsField, horizon)
      .groupByKey(key)
      .flatMapGroupsWithState[State[S, R], O](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: K, rows: Iterator[I], state: GroupState[State[S, R]]) =>
          val st0 = state.getOption.getOrElse(State(init, Nil, None))
          def sealedSlot(r: R): Boolean =
            st0.frontier.exists(f => ord.lteq(r, f))
          val incoming = rows.map(toRow).toList
          val (lateRows, fresh) = incoming.partition(sealedSlot)
          viol.add(lateRows.size)
          val wm = state.getCurrentWatermarkMs()
          val (ripe, stay) = (st0.buf ++ fresh).sorted(ord)
            .partition(r => tsMs(r) <= wm)
          var s = st0.domain
          def foldAll(rs: List[R], late: Boolean): List[O] = rs.flatMap { r =>
            val (s2, o) = fold(k, s, r, late); s = s2; o
          }
          val lateSorted = lateRows.sorted(ord)
          val out =
            if (lateBeforeRipe)
              foldAll(lateSorted, late = true) ::: foldAll(ripe, late = false)
            else
              foldAll(ripe, late = false) ::: foldAll(lateSorted, late = true)
          state.update(State(s, stay, ripe.lastOption.orElse(st0.frontier)))
          // re-fire this group the moment the watermark reaches the
          // oldest buffered row (min buffered ts > wm by construction)
          if (stay.nonEmpty) state.setTimeoutTimestamp(stay.map(tsMs).min)
          out.iterator
      }
  }
}
