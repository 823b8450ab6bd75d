package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming faces of the ML-pipeline aggregations: incremental per-label
  * centroid maintenance over an embedding stream — the online counterpart
  * of the e03 batch centroids (and the recompute step of e05's Lloyd
  * iteration), for pipelines that keep class prototypes current while
  * training data arrives.
  *
  * State per key is one quantized component-sum vector plus a count —
  * constant in stream length — and the sums are exact integer arithmetic
  * (the repo-wide quantized-embedding idiom), so after any prefix of the
  * stream the emitted centroid equals the batch average of the rows seen,
  * independent of micro-batch boundaries (StreamingSpec proves parity
  * against the e03 aggregation).
  */
object StreamingMl {

  final case class DocIn(source: String, shard: Long, docId: Long, nTok: Long)
  final case class PackState(cum: Long)
  final case class PackOut(docId: Long, source: String, nTok: Long,
                           packId: Long, packOffset: Long, nChunks: Long)

  /** Streaming face of t20 sequence packing: documents of one
    * (source, shard) stream are laid head-to-tail and cut into
    * fixed-capacity token packs as they arrive. Keyed state is ONE
    * running token count — constant in stream length — and the emitted
    * (pack, offset, span) triple equals the batch window-cumsum layout
    * after any prefix of the stream, independent of micro-batch
    * boundaries (exact integer arithmetic; StreamingSpec proves parity
    * against the t20 batch query). Rows within a micro-batch are
    * doc_id-sorted before the scan; across batches the operator relies
    * on per-key arrival order, the same contract as the streaming BDA
    * binner and as-of join. */
  def streamingPacking(ds: Dataset[DocIn], capacity: Long = 2048L)
      : Dataset[PackOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(d => (d.source, d.shard))
      .flatMapGroupsWithState[PackState, PackOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (String, Long), docs: Iterator[DocIn],
         state: GroupState[PackState]) =>
          val sorted = docs.toSeq.sortBy(_.docId)
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          val out = sorted.map { d =>
            val start = cum
            cum += d.nTok
            PackOut(d.docId, d.source, d.nTok, start / capacity,
              start % capacity, (cum - 1) / capacity - start / capacity + 1)
          }
          state.update(PackState(cum))
          out.iterator
      }
  }

  final case class VecIn(label: Int, qv: Seq[Long])
  final case class CentState(n: Long, sums: Seq[Long])
  final case class CentOut(label: Int, n: Long, centroidQ: Seq[Double])

  /** Running per-label centroids: one `mapGroupsWithState` update per
    * label per micro-batch, emitting the centroid over all rows seen so
    * far. Dimension is taken from the first vector of each label. */
  def streamingCentroids(ds: Dataset[VecIn]): Dataset[CentOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.label)
      .mapGroupsWithState[CentState, CentOut](GroupStateTimeout.NoTimeout) {
        (label: Int, rows: Iterator[VecIn], state: GroupState[CentState]) =>
          var st = state.getOption.getOrElse(CentState(0L, Nil))
          for (r <- rows) {
            require(st.n == 0L || st.sums.length == r.qv.length,
              s"embedding dimension changed mid-stream for label $label: " +
                s"${st.sums.length} vs ${r.qv.length}")
            val sums =
              if (st.n == 0L) r.qv
              else st.sums.lazyZip(r.qv).map(_ + _)
            st = CentState(st.n + 1L, sums)
          }
          state.update(st)
          CentOut(label, st.n, st.sums.map(_.toDouble / st.n))
      }
  }

  final case class ChunkIn(docId: Long, chunkIdx: Long, fp: Long)
  final case class DedupState(nSeen: Long)
  final case class DedupOut(docId: Long, chunkIdx: Long, fp: Long,
                            nSeen: Long, keep: Boolean)

  /** Streaming face of t01/t28 exact dedup — dedup-on-ingest: chunks
    * arrive keyed by fingerprint; the FIRST arrival is kept, later
    * copies flagged. State per fingerprint is one counter — constant in
    * stream length per key (at production scale the state store is
    * fingerprint-cardinality-sized; bound it with a timeout/TTL when the
    * dedup horizon is finite). Rows within a micro-batch are
    * (docId, chunkIdx)-sorted so a batch boundary never reorders
    * simultaneous arrivals; across batches first-arrival-wins — the
    * ingestion-order contract shared with the streaming packer. When the
    * stream arrives in doc order the kept set equals the batch
    * min-owner rule (StreamingSpec proves parity against t28). */
  def streamingDedup(ds: Dataset[ChunkIn]): Dataset[DedupOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.fp)
      .flatMapGroupsWithState[DedupState, DedupOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[ChunkIn], state: GroupState[DedupState]) =>
          val sorted = rows.toSeq.sortBy(r => (r.docId, r.chunkIdx))
          var n = state.getOption.map(_.nSeen).getOrElse(0L)
          val out = sorted.map { r =>
            n += 1
            DedupOut(r.docId, r.chunkIdx, r.fp, n, n == 1L)
          }
          state.update(DedupState(n))
          out.iterator
      }
  }

  final case class IngestDoc(docId: Long, source: String, text: String)

  /** The training-data INGEST path as one structured stream: quality
    * filter (stateless projection) → content-fingerprint dedup (keyed
    * counter state, first arrival wins) → sequence packing (keyed
    * running-offset state) — t25's batch pipeline recomposed from the
    * streaming faces, chained as two stateful operators inside a single
    * query. When the stream arrives in doc order the emitted pack layout
    * equals the batch t25 result row for row (StreamingSpec proves it);
    * at production scale each stage's state is constant per key
    * (fingerprint counter, shard offset) and the stream never widens —
    * the same per-key shuffles the batch plan makes, applied
    * incrementally. */
  def streamingIngest(ds: Dataset[IngestDoc], minTok: Long = 24L,
                      capacity: Long = 2048L): Dataset[PackOut] = {
    import ds.sparkSession.implicits._
    val scored = ds.map { d =>
      val nTok = d.text.count(_ == ' ') + 1L
      ChunkIn(d.docId, 0L, graft.expr.RollingFingerprint.compute(d.text)) ->
        (d.source, nTok)
    }.filter(_._2._2 >= minTok)
    val deduped = scored.groupByKey(_._1.fp)
      .flatMapGroupsWithState[DedupState, (Long, String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(ChunkIn, (String, Long))],
         state: GroupState[DedupState]) =>
          val sorted = rows.toSeq.sortBy(_._1.docId)
          var n = state.getOption.map(_.nSeen).getOrElse(0L)
          val out = sorted.flatMap { case (c, (src, nTok)) =>
            n += 1
            if (n == 1L) Some((c.docId, src, nTok)) else None
          }
          state.update(DedupState(n))
          out.iterator
      }
    streamingPacking(
      deduped.map { case (id, src, nTok) => DocIn(src, id / 8192L, id, nTok) },
      capacity)
  }

  final case class IvfIn(cid: Long, qv: Seq[Long])
  final case class IvfCellState(cids: Seq[Long], qvs: Seq[Seq[Long]],
                                n2s: Seq[Long])
  final case class IvfOut(cid: Long, cell: Long, nNear: Long,
                          pruned: Boolean, maxCos: Option[Double])

  /** The shared per-cell ingest fold of the streaming IVF face and its
    * batch twin: each arriving vector is compared against every EARLIER
    * member of its cell (exact integer dot, the SemDedup.prune cosine
    * formula verbatim: d / (√n2_earlier · √n2_arriving)) and emits its
    * SemDeDup verdict — n_near at τ, pruned, max cosine (None when the
    * vector opens the cell). ALL members enter the state (kept or pruned
    * — the batch greedy rule counts every lower-id member), so state per
    * cell is the cell population: bounded by the n/k ≈ 512 contract the
    * coarse seed count grows to maintain (t29). */
  private def ivfCellFold(sorted: Seq[(Long, Array[Long])],
      st0: IvfCellState, cell: Long, tau: Double)
      : (IvfCellState, Seq[IvfOut]) = {
    var ids = st0.cids.toVector
    var qvs = st0.qvs.map(_.toArray).toVector
    var n2s = st0.n2s.toVector
    val out = sorted.map { case (cid, qv) =>
      var n2 = 0L
      var j = 0
      while (j < qv.length) { n2 += qv(j) * qv(j); j += 1 }
      var nNear = 0L
      var maxCos = Option.empty[Double]
      var i = 0
      while (i < ids.length) {
        val o = qvs(i)
        var d = 0L
        var k = 0
        while (k < qv.length) { d += o(k) * qv(k); k += 1 }
        val cos = d.toDouble /
          (math.sqrt(n2s(i).toDouble) * math.sqrt(n2.toDouble))
        if (cos >= tau) nNear += 1
        if (maxCos.forall(_ < cos)) maxCos = Some(cos)
        i += 1
      }
      ids :+= cid; qvs :+= qv; n2s :+= n2
      IvfOut(cid, cell, nNear, nNear > 0, maxCos)
    }
    (IvfCellState(ids, qvs.map(_.toSeq), n2s), out)
  }

  /** Streaming IVF index maintenance — the INGEST face of the e04/e16
    * batch index build: new vectors are assigned to their coarse cell
    * with the broadcast seed matrix (the SAME primitive argmin as the
    * batch `nearest_centroid` expression — graft.expr.NearestCentroid
    * .computeArrays, ties to the lowest id) and flagged for SemDeDup
    * prune against the cell's existing members via one
    * `flatMapGroupsWithState` keyed by cell. Rows within a micro-batch
    * are cid-sorted; across batches the operator relies on per-key
    * arrival order (ascending ids), the contract shared with the
    * streaming packer/dedup — under it the emitted verdicts equal the
    * batch t29 greedy rule row for row (StreamingSpec proves parity
    * across micro-batch splits). `seeds` is the model-sized coarse table,
    * closure-broadcast like the batch LUT. */
  def streamingIvfIngest(ds: Dataset[IvfIn],
      seeds: Array[(Long, Array[Long])], tau: Double): Dataset[IvfOut] = {
    import ds.sparkSession.implicits._
    val sorted = seeds.sortBy(_._1)
    val ks = sorted.map(_._1)
    val cqs = sorted.flatMap(_._2)
    ds.groupByKey(v =>
        graft.expr.NearestCentroid.computeArrays(v.qv.toArray, ks, cqs))
      .flatMapGroupsWithState[IvfCellState, IvfOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (cell: Long, rows: Iterator[IvfIn], state: GroupState[IvfCellState]) =>
          val arr = rows.toSeq.sortBy(_.cid).map(v => v.cid -> v.qv.toArray)
          val st0 = state.getOption.getOrElse(IvfCellState(Nil, Nil, Nil))
          val (st1, out) = ivfCellFold(arr, st0, cell, tau)
          state.update(st1)
          out.iterator
      }
  }

  /** Batch twin of [[streamingIvfIngest]]: the same per-cell fold after
    * ONE shuffle on the cell key (`flatMapGroups` — the repo's
    * per-group-sequential idiom), each cell starting from an empty
    * index. Under ascending-cid arrival the stream and this batch form
    * emit identical rows, and both equal SemDedup.prune's greedy
    * verdicts — e20 puts this code path under the DuckDB hash gate. */
  def ivfIngestBatch(ds: Dataset[IvfIn],
      seeds: Array[(Long, Array[Long])], tau: Double): Dataset[IvfOut] = {
    import ds.sparkSession.implicits._
    val sorted = seeds.sortBy(_._1)
    val ks = sorted.map(_._1)
    val cqs = sorted.flatMap(_._2)
    ds.groupByKey(v =>
        graft.expr.NearestCentroid.computeArrays(v.qv.toArray, ks, cqs))
      .flatMapGroups { (cell: Long, rows: Iterator[IvfIn]) =>
        val arr = rows.toSeq.sortBy(_.cid).map(v => v.cid -> v.qv.toArray)
        ivfCellFold(arr, IvfCellState(Nil, Nil, Nil), cell, tau)._2.iterator
      }
  }

  final case class SnapDoc(docId: Long, fp: String, h1: String, h2: String,
                           isBase: Boolean)
  final case class BandState(nBase: Long)
  final case class BandHit(docId: Long, nBandHits: Long)
  final case class OwnerState(minBase: Long)
  final case class OwnerHit(docId: Long, baseExact: Option[Long])

  /** Streaming face of t50's incremental cross-snapshot dedup, band
    * half: per-(h1, h2) minhash band the keyed state carries ONE long —
    * how many BASE docs the band holds. Base docs build the index and
    * emit nothing; delta docs emit their base-candidate count at
    * arrival. Constant state per band at any history length; the
    * production ingest keeps exactly this index warm between batches. */
  def streamingBandHits(ds: Dataset[SnapDoc]): Dataset[BandHit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(d => (d.h1, d.h2))
      .flatMapGroupsWithState[BandState, BandHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (String, String), rows: Iterator[SnapDoc],
         state: GroupState[BandState]) =>
          val sorted = rows.toSeq.sortBy(_.docId)
          var n = state.getOption.map(_.nBase).getOrElse(0L)
          val out = Seq.newBuilder[BandHit]
          for (d <- sorted) {
            if (d.isBase) n += 1
            else out += BandHit(d.docId, n)
          }
          state.update(BandState(n))
          out.result().iterator
      }
  }

  /** Streaming face of t50's exact half: per-fingerprint state is the
    * MINIMUM base doc id; delta docs emit their exact-dup owner (None
    * when the base has no copy). */
  def streamingExactOwner(ds: Dataset[SnapDoc]): Dataset[OwnerHit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.fp)
      .flatMapGroupsWithState[OwnerState, OwnerHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[SnapDoc], state: GroupState[OwnerState]) =>
          val sorted = rows.toSeq.sortBy(_.docId)
          var min = state.getOption.map(_.minBase).getOrElse(Long.MaxValue)
          val out = Seq.newBuilder[OwnerHit]
          for (d <- sorted) {
            if (d.isBase) { if (d.docId < min) min = d.docId }
            else out += OwnerHit(d.docId,
              if (min == Long.MaxValue) None else Some(min))
          }
          state.update(OwnerState(min))
          out.result().iterator
      }
  }
}
