package graft.spark

import graft.SparkSpec

/**
 * Institutionalized plan audit (VERDICT r6 item 3): every gate query in
 * [[graft.SparkEntry.queries]] is linted by [[PlanLint.checkGate]] —
 * cartesian products, broadcast nested-loop joins, global windows, and
 * mid-pipeline global sorts all fail the suite UNLESS the (query, rule)
 * pair is consciously enumerated in the allowlist below with its
 * boundedness argument. Any future query (or regression in an existing
 * operator) that plans a new scale antipattern breaks this spec.
 *
 * The presentation `ORDER BY` every gate query ends with (deterministic
 * oracle output over an already-reduced result) is handled inside
 * checkGate, not allowlisted here.
 */
class GateLintSpec extends SparkSpec {

  /**
   * The ONLY accepted (query → rules) scale-antipattern occurrences, each
   * with the argument for why it is bounded at 100 TB. Everything not
   * listed must plan clean.
   */
  private val allow: Map[String, Set[String]] = {
    // The documented exact-baseline shape: corpus × BROADCAST query/probe
    // side (tiny by contract) plans as BroadcastNestedLoopJoin. Pair
    // volume is |corpus|·|broadcast side|, linear in the corpus.
    val broadcastBaseline = Set("nested-loop-join")
    Map(
      // brute-force ANN baseline + every query that computes exact
      // ground truth via bruteForceTopK for its recall assertion
      "sim_topk_bruteforce" -> broadcastBaseline,
      "sim_topk_lsh" -> broadcastBaseline,
      "sim_topk_ivf" -> broadcastBaseline,
      "sim_topk_ivfpq" -> broadcastBaseline,
      "sim_knn_classify" -> broadcastBaseline,
      // queries × broadcast label-centroid model (rows = #labels, KBs)
      "sim_centroid_classify" -> broadcastBaseline,
      // documented all-pairs embedding baselines (broadcast side = the
      // corpus itself at gate SF; the scale path is dd_embedding_neardup's
      // RHP-LSH bucketing, asserted in its own recall row)
      "dd_embedding_threshold" -> broadcastBaseline,
      // one-row corpus-constant attaches (n_docs/avgdl for BM25, corpus
      // totals for LM/TF-IDF weighting, calibration scalars)
      "t_search_ranked" -> broadcastBaseline,
      "t_tfidf" -> broadcastBaseline,
      "t_unigram_lm" -> broadcastBaseline,
      "t_importance_weight" -> broadcastBaseline,
      // in-gate exactness baseline: the assertion half of the gate
      // compares the capped operator against an all-pairs sig check
      // (corpus × broadcast sigs — 8-byte rows, never pixels/text)
      "dd_simhash" -> broadcastBaseline,
      "mm_image_neardup" -> broadcastBaseline,
      "mm_image_clusters" -> broadcastBaseline,
      // one-row summary-row attaches (assertion scaffolding: counts,
      // planted/found totals, estimate-vs-exact single rows)
      "dd_containment" -> broadcastBaseline,
      // 1×1 attach of the persisted-vs-memory mismatch summary to the
      // query count (both sides single aggregate rows)
      "sim_topk_ivf_persisted" -> broadcastBaseline,
      "x_join_estimate" -> broadcastBaseline,
      "x_bloom_skipping" -> broadcastBaseline,
      "x_file_skipping" -> broadcastBaseline,
      "x_chisq" -> broadcastBaseline,
      "x_assoc_rules" -> broadcastBaseline,
      // broadcast trained-model attach (merge table / vocab — KBs)
      "t_bpe_encode" -> broadcastBaseline,
      // bounded global windows, each over provably pre-aggregated state:
      // skyline: bucket maxima (≤ #buckets rows) — ops/Skyline.scala
      "x_skyline" -> Set("global-window"),
      // score-histogram quantile gate: domain-bounded histogram rows —
      // ops/Corpus.scala (quantileGate); plus its one-row threshold attach
      "t_quality_gate" -> Set("global-window", "nested-loop-join"))
  }

  test("all 184 gate queries plan free of scale antipatterns " +
    "(explicit allowlist; any new cartesian/global-window/global-sort fails)") {
    val dir = graft.TestSpark.sf0001
    val results = graft.SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val findings =
          try PlanLint.checkGate(fn(spark, dir)).map(_.rule).toSet
          catch {
            case e: Throwable =>
              fail(s"$name failed to build/plan: ${e.getMessage}", e)
          }
        (name, findings)
    }
    val bad = results.collect {
      case (name, fs) if (fs -- allow.getOrElse(name, Set.empty)).nonEmpty =>
        s"$name: unallowed ${(fs -- allow.getOrElse(name, Set.empty)).mkString(", ")}"
    }
    assert(bad.isEmpty,
      s"\nqueries planning new scale antipatterns:\n  ${bad.mkString("\n  ")}")
    // the allowlist must not rot: every entry still corresponds to a real
    // finding (an entry whose shape was since fixed must be deleted here)
    val byName = results.toMap
    val stale = allow.toSeq.flatMap { case (name, rules) =>
      val actual = byName.getOrElse(name,
        fail(s"allowlist names unknown query '$name'"))
      (rules -- actual).map(r => s"$name: allowlisted '$r' no longer occurs")
    }
    assert(stale.isEmpty, s"\nstale allowlist entries:\n  ${stale.mkString("\n  ")}")
  }
}
