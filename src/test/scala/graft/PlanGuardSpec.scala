package graft

import org.scalatest.funsuite.AnyFunSuite

/** Permanent version of the per-round anti-pattern sweep: no registered
  * gate query may plan a cartesian product, and nested-loop joins are
  * allowed only in the explicitly declared exact baselines (the all-pairs
  * yardsticks) and the tiny-centroid k-means broadcast. A new operator
  * that accidentally degrades to an unbounded join fails HERE, not at
  * 100 TB. */
class PlanGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Exact all-pairs baselines (scaladoc-declared), IVF's centroid
    * cross join (k centroids, broadcast by construction), the KMV
    * set-op query's 1x1 scalar cross join (two single-row aggregates —
    * O(1) at any input scale), and CUPED's broadcast of its single-row
    * (θ, x̄) statistics frame against the per-user metrics — a 1xN
    * condition-free join that stays O(N) at any scale. The Bloom prune
    * needs no declaration: its filter rides in as a scalar subquery,
    * not a join. */
  private val declaredNestedLoop =
    Set("dedup_embedding_cosine", "sim_topk_bruteforce", "sim_topk_ivf",
      // IVF-PQ's centroid assignment is the same broadcast centroid
      // cross join as sim_topk_ivf (nlist rows, broadcast by
      // construction); its codebook joins are equi-joins on j. The PQ
      // storage encoder shares the identical assignment stage.
      // SemDeDup's coarse assignment is the same nlist-row broadcast
      // centroid cross join; its pair join is an equi-join on cid.
      // The incremental form assigns BOTH sides with that broadcast
      // (shared codebook), cross-side pair join stays an equi-join.
      "sim_topk_ivfpq", "sim_pq_encode", "dedup_semdedup",
      "dedup_semdedup_incremental",
      "sim_knn_classify", "sketch_kmv_setops", "sketch_hll_union",
      "stats_cuped_adjust",
      // single-row "n = max global rank" broadcasts (same O(N) shape
      // as CUPED's stats frame)
      "rfm_segmentation", "profile_skew_stats",
      // 1x1 scalar cross joins of per-table deleted/total count rows
      "gdpr_cascade_delete",
      // single-row total broadcasts against a data-sized frame
      "orders_abc_classification", "basket_lift_pairs",
      // 1x1 scalar join of the daily rollup row with the MAU row
      "behavior_dau_mau",
      // 1x1x1x1 scalar cross of the four health-report rollup rows
      "corpus_health_report",
      // 1-row order-count broadcast against the 9-digit rollup
      "profile_benford_digits",
      // candidates x (<=k)-row selected-set broadcast per greedy round
      "sim_diverse_maxmin",
      // 1-row (n_a, n_b) broadcast against the prefix-count frame
      "stats_ks_test", "stats_mannwhitney_u", "stats_wilcoxon_signed",
      // 1x1 scalar cross of the unit-fold row with the label-fold row
      "eval_krippendorff_alpha",
      // 1-row edge-count broadcast against the candidate frame
      "graph_louvain_move", "graph_louvain_rounds",
      // 1x1 scalar cross of the edge-threshold and node-threshold folds
      "graph_rich_club",
      // 1x1 scalar cross of the HT-estimate fold with the truth fold
      "corpus_ht_estimate",
      // 1x1 scalar cross of the edge count with the reciprocal count
      "graph_reciprocity",
      // IVF recall reruns the ivf pipeline (nlist-row centroid cross)
      "sim_ivf_recall",
      // 1-row total broadcast onto the <=maxHops-row distance histogram
      "graph_effective_diameter",
      // 1-row totals broadcast onto the <=64-row DSIR bucket histogram
      // (the corpus-sized feature frame joins that result by equi-key)
      "corpus_dsir_stats",
      // 1-row n_pos-total broadcast onto the distinct-score PR frame
      "eval_pr_curve", "eval_average_precision", "eval_log_loss",
      "eval_threshold_opt",
      // 1-row count broadcast onto the ranked frame
      "layout_range_boundaries",
      // 1-row (n_tot, denom) totals broadcast onto the |sources| frame
      "corpus_temperature_mix",
      // |catalog|-row (5 event types) broadcast slate cross per user
      "eval_rank_per_user", "eval_rank_summary",
      // 1-row total + 1x1x1 scalar crosses of the MI/entropy folds
      "profile_mutual_info",
      // 1-row edge-count broadcast onto the per-community rollup
      "graph_modularity",
      // 1-row per-feature totals broadcast onto each group rollup
      "eval_gini_stump",
      // 1-row totals broadcast onto the 10-row decile frame
      "eval_gains_table",
      // single-row order-total broadcast, as basket_lift_pairs
      "basket_rules",
      // 1-row doc-count broadcast onto the df frame (idf numerator)
      "text_tfidf_cosine", "text_tfidf_cosine_prefix",
      // 1-row L1-total broadcasts per HITS normalization step
      "graph_hits",
      // B-row bin-table range crosses (corpus-independent PAV segments)
      "eval_isotonic",
      // 1-row doc-count broadcast onto the <=C(vocabK,2) pair frame
      "text_pmi_topk",
      // 1-row totals broadcast onto the category-domain frame
      "profile_js_divergence",
      // cell-domain (≤5k rows) broadcast pair joins + 1-row mass frames
      "stats_kendall_tau",
      // 1-row norm/Rayleigh broadcasts per power-iteration round
      "sim_top_eigvec",
      // 1-row totals + chosen-segment broadcasts onto the source domain
      "corpus_epoch_budget",
      // 1-row totals broadcast onto the bin-domain frame (PSI fold)
      "profile_psi",
      // R×C category-domain cross + 1-row total (full chi-square grid)
      "profile_chi2",
      // 1-row sample-totals broadcast onto the value-domain CDF frame
      // (the ksStatistic/kendall discipline: domain-sized, never corpus)
      "stats_wasserstein1")

  test("no gate plans a cartesian; nested-loop joins only where declared") {
    Registry.all.foreach { q =>
      val plan = q.fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a CartesianProduct")
      if (!declaredNestedLoop(q.name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"${q.name} plans a BroadcastNestedLoopJoin")
    }
  }
}
