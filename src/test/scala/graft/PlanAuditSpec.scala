package graft

import org.apache.spark.sql.execution.window.WindowExec

/** Whole-surface plan tripwire: a NEW query (or an operator edit) that
  * introduces a loop join or a partition-less window anywhere in the
  * 90+-query surface must either justify itself onto the deliberate list
  * below or fix its plan — a silent scale regression can't ride in unnoticed.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // 1-row aggregated cross joins (j1/m3/n4/r13/t10 vocab), the exact
  // brute-force baseline (n1), and the ADC codes scans (n6 fixed
  // codebooks, n7 trained codebooks — same broadcast-LUT × codes shape)
  private val deliberateLoops = Set(
    "j1_cross_agg", "m3_tree_score", "n1_ann_topk", "n4_bm25",
    "n6_pq_probe", "n7_pq_trained", "n9_rp_prefilter",
    // n10: the 1-row-query broadcast relevance pass (the n1 shape)
    "n10_mmr_rerank",
    "r13_permanova_stat", "t10_ngram_lm",
    // t24: the t10 1-row vocab-count broadcast (CCNet train/apply split)
    "t24_perplexity_buckets",
    // m16: the PAVA minimax runs entirely on the bounded CELL frame —
    // k²/k³ range joins over ≲ dozens of calibration cells (r40 shape)
    "m16_isotonic",
    // n20: the n1 broadcast-query scan shape (sign words ride the scan)
    "n20_binary_hamming",
    // e26: the 1-row (n_days, total) broadcast over the day frame
    "e26_changepoint",
    // r60: the 1-row (n, ssq) × (c2) combine (the r33/j1 shape)
    "r60_fleiss_kappa",
    // r63: two 1-row broadcasts (total count, global median) onto the
    // value/classified frames (the j1 shape)
    "r63_mood_median",
    // q22: the 1-row pooled-direction broadcast onto the stratum frame
    "q22_simpson_audit",
    // r65: the 1-row (n, lo, hi) broadcast onto the value-cell frame
    "r65_ks_uniform",
    // r30: the 1-row MI × entropy × entropy combine (the j1 shape)
    "r30_mutual_info",
    // r33: the 1-row agree × margin-product combine (the j1 shape)
    "r33_cohen_kappa",
    // n12: the n1 brute-force truth leg (same broadcast-query shape)
    "n12_ann_recall",
    // n22: the same brute-force truth leg under the IVF-PQ eval
    "n22_ivfpq_recall",
    // n13: the n1 shape with the label-mismatch filter pre-aggregate
    "n13_hard_negatives",
    // t18: the n4 broadcast corpus-stats shape (1-row N cross join)
    "t18_tfidf",
    // m8: the broadcast 1-row global-prior cross join (the j1 shape)
    "m8_target_encode",
    // n14: both eval legs are the n1 brute-force broadcast-query shape
    "n14_trunc_eval",
    // r40: the dimension-sized cell self-join (the r13 triangular shape)
    // plus the 1-row stat combines
    "r40_kendall",
    // r35: the 1-row pooled-psi × stratum-frame combine (the j1 shape)
    "r35_breslow_day",
    // r44: the dimension-sized cell self-join (the r40 shape) plus the
    // 1-row total-weight and n combines
    "r44_theil_sen",
    // n15: the n1 broadcast-query dense leg inside the hybrid fusion
    "n15_rrf_fusion",
    // n17: three n12-shaped eval legs (brute-force truth + probe sweeps)
    "n17_probe_sweep",
    // r45: the 1-row class-totals cross join over the curve frame
    "r45_pr_curve",
    // m12: the 1-row class-prior cross join onto the cell frame (j1 shape)
    "m12_naive_bayes",
    // n18: the n1 broadcast-query brute-force shape under the vote census
    "n18_knn_classify",
    // e25: the 7-row lag broadcast onto the day frame (dimension-sized)
    "e25_crosscorr",
    // t22: the 1-row corpus-totals cross join (the t18/n4 shape)
    "t22_keyness",
    // r57: the 1-row global-power-sums broadcast onto the k-arm frame
    "r57_cuped",
    // m17: three 1-row broadcasts (OLS fit → residuals, ranks → quantile
    // pick, quantiles → coverage) — each the j1 shape
    "m17_conformal",
    // m18: the same 1-row OLS-fit broadcast onto the cal/test scans
    "m18_mondrian_conformal",
    // q23: the 1-row totals broadcast onto the frequency-cell frame
    "q23_key_skew",
    // r71: the 1-row Q/tau2 broadcast onto the 25-study frame (j1 shape)
    "r71_meta_dl",
    // m20: the 1-row good/bad-totals broadcast onto the category frame
    "m20_woe_iv",
    // r73: the k(k-1)/2 inequality self-join on the 5-row priority cell
    // frame (the r40 triangular shape)
    "r73_pairwise_welch",
    // q24: the dimension-sized period×bin grid cross + the 1-row
    // ref-period broadcast
    "q24_psi_drift",
    // m21: the 1-row train-counts broadcast onto the accuracy row
    "m21_learning_curve",
    // n24: the 1-row max-norm broadcast onto the augmentation scan
    "n24_mips",
    // g16/g18: the reference's cross-joined-cohort summary tables — the
    // j1 per-side-aggregate rewrite (1-row × 1-row cross join)
    "g16_suv_study_vs_control", "g18_technical_cross",
    // m24: the 1-row winner broadcast onto the ≤10-row trace frame
    "m24_tune_trace")

  // single source of truth: graft.tools.PlanAudit.deliberateGlobalWindows
  // (Bench.windowWarnWhitelist derives from the SAME registry, so the
  // subset relation that once drifted — the j10 incident — holds by
  // construction and needs no assertion)
  private val deliberateGlobalWindows =
    graft.tools.PlanAudit.deliberateGlobalWindows

  test("no query grows an undeclared loop join or partition-less window") {
    val loops = scala.collection.mutable.ArrayBuffer[String]()
    val globals = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val qe = fn(spark, dir).queryExecution
      val p = qe.executedPlan.toString
      if (p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"))
        loops += name
      if (qe.sparkPlan.collectFirst {
          case w: WindowExec if w.partitionSpec.isEmpty => w }.nonEmpty)
        globals += name
    }
    val newLoops = loops.toSet -- deliberateLoops
    val newGlobals = globals.toSet -- deliberateGlobalWindows
    assert(newLoops.isEmpty, s"undeclared loop joins in: $newLoops")
    assert(newGlobals.isEmpty, s"undeclared global windows in: $newGlobals")
    // and the lists don't go stale: everything declared still exists
    assert((deliberateLoops -- SparkEntry.queries.keySet).isEmpty)
    assert((deliberateGlobalWindows -- SparkEntry.queries.keySet).isEmpty)
    assert((graft.tools.PlanAudit.runtimeOnlyWindowWarns --
      SparkEntry.queries.keySet).isEmpty)
  }
}
