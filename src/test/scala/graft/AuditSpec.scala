package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runs the registry-wide codegen / single-partition audit
  * (`graft.Explain.auditFindings`) inside `sbt test`, so an interpreted
  * HOF sneaking into a hot path, a generated method past the 8 KB JIT
  * threshold, or a new AQE funnel (the t44 bug class: 18 s on one core
  * until an explicit repartition) fails CI instead of waiting for a
  * bench regression to be noticed.
  *
  * The allowlist freezes the REVIEWED findings: every entry was examined
  * and is a bounded, legitimate shape (one-long-per-partition count/sum
  * merges, model-sized final rollups, array-native HOF averaging whose
  * surfaces are dimension-bounded). A NEW query name appearing here, a
  * new finding category on an allowlisted query, or an oversized method
  * anywhere is a failure.
  */
class AuditSpec extends AnyFunSuite {

  // (interpreted-node max, single-partition-exchange max) per query —
  // counts frozen at the round-7 review; growth in either is a regression
  private val allowed: Map[String, (Int, Int)] = Map(
    "q20_upsert" -> (0, 1), // 520-row final merge
    "a10_bda_ragged_map" -> (0, 1), // ragged-map global offset scan (196 rows)
    // a11's interpreted consensus FOLD retired round 8 (codegen'd
    // chan_bin_avg); the remaining node is the fixture's array build
    // (transform over 8 chans — the a18 class)
    "a11_array_chan_avg" -> (1, 0),
    "a12_array_row_chan_avg" -> (1, 0), // array-native explode: chan-bounded
    "a13_weight_fallback" -> (2, 0), // same class
    // (chan, corr) nested-array fixture build: 16 lambda evals per row;
    // the unrolled-literal alternative generated a 19 KB method (worse)
    "a18_array_full_corr" -> (2, 0),
    "t16_bm25" -> (0, 1), // corpus-constant (avgdl) scalar merge
    // t18's interpreted subword aggregate() retired round 8 (codegen'd
    // subword_sum)
    "t19_decontamination" -> (0, 1), // bloom-sketch build: one bounded bitset merge
    "t23_source_mix" -> (0, 1), // 20-row mixing rollup
    // t31/t41's interpreted stop-token filter HOF retired round 8
    // (codegen'd token_ct_in)
    "t35_minhash_recall" -> (0, 3), // 1-row recall summary joins
    "t36_token_budget" -> (0, 1), // 20-row budget rollup
    "t37_prefix_join" -> (0, 1), // global df cap scalar
    "t43_dup_triangles" -> (0, 2), // 1-row triangle count merges
    // round-12 review: the census's 1-row family/wedge rollup merges —
    // the t43 class; every data-sized stage (edges, labels, family aggs)
    // stays keyed
    "t53_triangle_census" -> (0, 2),
    "t45_hash_split" -> (0, 1), // 3-row split summary
    // t46's interpreted tracking-param filter HOF retired round 8
    // (codegen'd drop_prefixed)
    "e11_pca_power" -> (0, 5), // d²-bounded scatter + 1-row max-abs merges
    "e19_rotated_sq" -> (0, 1), // 1-row per-axis min/max rollup (f14 class)
    "e12_pca_project" -> (0, 4), // same chain minus one iterate
    "f14_cell_size" -> (0, 1), // 1-row uv-extent reduction
    "i02_restore" -> (0, 1), // model-sized beam-fit scalar
    "s19_kmv_setops" -> (2, 1)) // 64-value sketch set-ops on 1 row
    // x04's interpreted aggregate() lambda retired round 8: the fused
    // projection now contracts through the codegen'd rime_source_sum

  test("registry-wide audit: no unreviewed interpreted nodes, funnels, or oversized methods") {
    // fresh session: the audit needs AQE off (AdaptiveSparkPlan hides
    // codegen markers until execution); newSession() scopes the conf
    // change away from the shared test session
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val findings = Explain.auditFindings(s, TestSpark.sf).filterNot(_.isEmpty)
    val problems = findings.flatMap { f =>
      val (maxI, maxF) = allowed.getOrElse(f.query, (0, 0))
      val issues = Seq.newBuilder[String]
      f.error.foreach(e => issues += s"plan failed: $e")
      if (f.oversized.nonEmpty)
        issues += s"generated method(s) past 8 KB JIT threshold: ${f.oversized.mkString(",")}"
      if (f.interpreted.length > maxI)
        issues += s"${f.interpreted.length} interpreted compute node(s) (allowed $maxI): " +
          f.interpreted.take(2).map(_.trim.take(70)).mkString(" | ")
      if (f.funnels.length > maxF)
        issues += s"${f.funnels.length} single-partition exchange(s) (allowed $maxF)"
      val is = issues.result()
      if (is.isEmpty) Nil else Seq(s"${f.query}: ${is.mkString("; ")}")
    }
    assert(problems.isEmpty,
      "audit regressions:\n  " + problems.mkString("\n  "))
    info(s"${findings.size} queries with reviewed findings, all within allowance")
  }
}
