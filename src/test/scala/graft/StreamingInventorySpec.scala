package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 (VERDICT item 6): the streaming ORDER-SENSITIVITY inventory.
  *
  * Five faces ride [[graft.operators.ReorderBuffer]]; the rest are either
  * order-free by algebra or first-arrival-wins by documented design. This
  * spec CLOSES the classification: it scans `src/main` for every streaming
  * face (the `def streamingX` convention, plus a comment-stripped guard on
  * raw `GroupsWithState` call sites) and fails the build when
  *
  *  - a NEW streaming face ships without a classification entry here,
  *  - a classified face disappears (stale inventory), or
  *  - a new file acquires keyed streaming state without declaring a
  *    `def streaming*` face (naming-convention escape hatch closed).
  *
  * So a future order-sensitive face cannot ship silently unclassified —
  * adding it forces the author to state which of the three contracts it
  * honors, with the evidence line reviewed in the same diff.
  */
class StreamingInventorySpec extends AnyFunSuite {

  /** The three order contracts a streaming face may declare. */
  sealed trait OrderClass
  /** Output/state is a commutative-associative fold — ANY delivery order
    * yields the same sealed result by algebra alone. */
  case object OrderFree extends OrderClass
  /** Rides ReorderBuffer.run: event-time fold once the watermark seals,
    * bit-identical to ordered delivery for in-horizon disorder;
    * horizon-exceeding stragglers fold at arrival, loudly counted. */
  case object Reordered extends OrderClass
  /** First-arrival-wins / per-key arrival-order contract BY DESIGN,
    * documented in the face's scaladoc; verdict-bearing variants carry
    * the `orderViolations` accumulator so disorder is loud, and each has
    * (or is) a Reordered twin when verdicts must survive disorder. */
  case object ArrivalOrder extends OrderClass

  /** name -> (class, evidence). Evidence names the proof: the combinator
    * call, the algebraic argument, or the documented arrival contract +
    * its StreamingSpec proof. */
  private val classification: Map[String, (OrderClass, String)] = Map(
    // --- ReorderBuffer clients (bit-identity-under-disorder proofs in
    //     StreamingSpec "reordered ..." tests) -------------------------
    "streamingDedupReordered" ->
      (Reordered, "ReorderBuffer.run; StreamingSpec in-horizon permutation proofs"),
    "streamingPackingReordered" ->
      (Reordered, "ReorderBuffer.run; ordered-layout parity under disorder"),
    "streamingTransitionsReordered" ->
      (Reordered, "ReorderBuffer.run; batch-LAG multiset parity (s15)"),
    "streamingAttributionReordered" ->
      (Reordered, "ReorderBuffer.run; sealed credits immutable under backfill (s22)"),
    "streamingIvfIngestReordered" ->
      (Reordered, "ReorderBuffer.run; sealed keepers never un-pruned (e20)"),
    // --- order-free by algebra --------------------------------------
    "streamingCentroids" ->
      (OrderFree, "per-label (n, Σqv) is a commutative integer fold; " +
        "sealed centroid independent of delivery order (e03 parity test)"),
    // --- first-arrival-wins / per-key arrival order by design --------
    "streamingPacking" ->
      (ArrivalOrder, "layout IS arrival order (doc'd contract + viol counter); " +
        "disorder-correct twin: streamingPackingReordered"),
    "streamingDedup" ->
      (ArrivalOrder, "dedup-on-ingest keeps the FIRST copy by design (viol " +
        "counter); disorder-correct twin: streamingDedupReordered"),
    "streamingIngest" ->
      (ArrivalOrder, "composition of streamingDedup+streamingPacking; same " +
        "contract, same counter; t25 parity when ordered"),
    "streamingIvfIngest" ->
      (ArrivalOrder, "cell membership index grows in arrival order (viol " +
        "counter); disorder-correct twin: streamingIvfIngestReordered"),
    "streamingIvfIngestTwoLevel" ->
      (ArrivalOrder, "same contract as streamingIvfIngest (doc'd); e21 " +
        "two-level semantics are its own oracle"),
    "streamingBandHits" ->
      (ArrivalOrder, "t50 band index: base-before-delta is the snapshot " +
        "contract itself; viol counter on doc_id regressions"),
    "streamingExactOwner" ->
      (ArrivalOrder, "t50 exact half; min-base owner converges regardless, " +
        "emission reflects arrival prefix (doc'd); viol counter"),
    "streamingSessions" ->
      (ArrivalOrder, "in-batch time sort + per-key arrival order across " +
        "batches (doc'd; greedy gap-close is order-sensitive by definition)"),
    "streamingTransitions" ->
      (ArrivalOrder, "in-batch (tus,event_id) sort; prefix state across " +
        "batches (doc'd); disorder-correct twin: streamingTransitionsReordered"),
    "streamingAttribution" ->
      (ArrivalOrder, "same ordering contract as streamingTransitions; " +
        "disorder-correct twin: streamingAttributionReordered"),
    "streamingBdaBins" ->
      (ArrivalOrder, "greedy admit/close needs per-baseline time order " +
        "(doc'd: watermarked upstream sort contract)"),
    "streamingAsOf" ->
      (ArrivalOrder, "latest-right-at-or-before fold; per-key arrival " +
        "order contract shared with streamingBdaBins (doc'd)"))

  /** Files allowed to hold keyed streaming state without a
    * `def streaming*` face: the combinator itself. */
  private val stateFileAllowlist = Set("ReorderBuffer.scala")

  private def mainSources: Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    walk(new java.io.File("src/main/scala/graft"))
  }

  private def stripLineComments(src: String): String =
    src.linesIterator.map { l =>
      val i = l.indexOf("//")
      if (i >= 0) l.substring(0, i) else l
    }.mkString("\n")

  test("every streaming face is classified, and every classification " +
    "names a live face") {
    val defRe = """def\s+(streaming\w+)""".r
    val found = mainSources.flatMap { f =>
      val src = java.nio.file.Files.readString(f.toPath)
      defRe.findAllMatchIn(src).map(_.group(1))
    }.toSet
    val classified = classification.keySet
    val unclassified = found -- classified
    val stale = classified -- found
    assert(unclassified.isEmpty,
      s"streaming faces WITHOUT an order classification: $unclassified — " +
        "add each to StreamingInventorySpec.classification with its " +
        "contract (OrderFree / Reordered / ArrivalOrder) and evidence")
    assert(stale.isEmpty,
      s"classification entries with no matching face: $stale")
    assert(found.size == classification.size)
  }

  test("keyed streaming state only appears in files that declare a " +
    "streaming face (or the combinator itself)") {
    val offenders = mainSources.filter { f =>
      val src = stripLineComments(java.nio.file.Files.readString(f.toPath))
      src.contains("GroupsWithState[") &&
        !src.contains("def streaming") &&
        !stateFileAllowlist.contains(f.getName)
    }
    assert(offenders.isEmpty,
      s"files with GroupsWithState but no declared streaming face: " +
        s"${offenders.map(_.getName)} — declare a `def streamingX` face " +
        "and classify it in StreamingInventorySpec (or allowlist a new " +
        "combinator here with review)")
  }

  test("every Reordered face actually calls ReorderBuffer.run") {
    val reordered = classification.collect {
      case (n, (Reordered, _)) => n }.toSet
    val srcByFile = mainSources.map(f =>
      f -> java.nio.file.Files.readString(f.toPath)).toMap
    reordered.foreach { n =>
      // the face's body must reference the combinator within its file
      val file = srcByFile.find(_._2.contains(s"def $n"))
      assert(file.isDefined, s"face $n not found")
      assert(file.get._2.contains("ReorderBuffer.run"),
        s"$n is classified Reordered but its file never calls " +
          "ReorderBuffer.run")
    }
    assert(reordered.size == 5, s"expected the five round-12 reordered " +
      s"faces; got $reordered — update the count deliberately if adding one")
  }
}
