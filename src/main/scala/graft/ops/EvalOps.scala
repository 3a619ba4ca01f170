package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.ops.Staging.StagedDf

/** Classifier/filter EVALUATION tier — the measurements a curation team
  * runs before trusting a quality filter with 100 TB of corpus: exact
  * ROC AUC, the precision/recall operating curve, and the calibration
  * (reliability) table. The reference pipeline has no model-eval stage
  * (its filters are fixed predicates); these are the extension
  * operators a learned-filter pipeline needs, built on the same
  * exact-integer discipline as the stats tier: every statistic crosses
  * the gate as integer counts/rank-sums plus at most one IEEE division,
  * so DuckDB replays them bit-identically.
  *
  * Scale shape: AUC is one global midrank (the range-staged
  * [[StatOps.globalRowNumber]], never a single-partition window) plus
  * one rollup; the PR curve rolls the corpus up to DISTINCT-score rows
  * first (bounded by the score domain, not the corpus) and prefix-sums
  * those; calibration is one keyed rollup. Nothing here is all-pairs
  * and nothing holds corpus-sized state on the driver.
  */
object EvalOps {

  /** Exact ROC AUC as a rational: AUC = P(score⁺ > score⁻) + ½P(=),
    * which is the tie-averaged Mann-Whitney U of the positive class
    * over (n_pos · n_neg). Delegates the midrank machinery to
    * [[StatOps.mannWhitneyU]] (doubled integer rank sums — ties stay
    * exact) and derives the doubled U; the single IEEE division at the
    * end is the only float.
    *
    * @param labelCol boolean (or 0/1) ground-truth column
    * @param scoreCol the classifier score (any orderable type)
    * @param idCol    unique row id — the deterministic tiebreak the
    *                 global midrank stage sorts on
    * @return one row: (`n_pos`, `n_neg`, `u2_pos` = 2·U exact integer,
    *         `auc` = u2_pos / (2 n_pos n_neg))
    */
  def aucExact(
      df: DataFrame, labelCol: String, scoreCol: String,
      idCol: String): DataFrame =
    StatOps.mannWhitneyU(df, labelCol, scoreCol, idCol)
      .select(
        col("n_a").as("n_pos"), col("n_b").as("n_neg"),
        (col("r2_a") - col("n_a") * (col("n_a") + 1)).as("u2_pos"))
      .withColumn("auc",
        col("u2_pos").cast(DoubleType) /
          (lit(2.0) * col("n_pos") * col("n_neg")))

  /** Per-group exact AUC — the stratified report ("the filter is great
    * on source A, useless on B") that catches what one pooled AUC
    * hides. Same tie-averaged arithmetic as [[aucExact]], but the
    * within-group rank comes from ONE global midrank over
    * (group, score, id) minus each group's min-rank offset — never a
    * per-group window, whose partitions inherit the largest group's
    * skew at corpus scale (one language can be 40% of 100 TB).
    *
    * @return one row per group: (`groupCol`, `n_pos`, `n_neg`,
    *         `u2_pos`, `auc` — null when a group lacks both classes)
    */
  def aucExactByGroup(
      df: DataFrame, groupCol: String, labelCol: String, scoreCol: String,
      idCol: String): DataFrame = {
    val ranked = StatOps.globalRowNumber(
      df.select(col(groupCol), col(scoreCol), col(idCol),
        col(labelCol).cast("long").as("_y")),
      Seq(col(groupCol), col(scoreCol), col(idCol)), "_i")
    val offs = ranked.groupBy(col(groupCol)).agg(min("_i").as("_o"))
    val rg = ranked.join(offs, Seq(groupCol))
      .withColumn("_r", col("_i") - col("_o") + 1L)
    val ties = rg.groupBy(col(groupCol), col(scoreCol))
      .agg((min("_r") + max("_r")).as("_avg2"))
    rg.join(ties, Seq(groupCol, scoreCol))
      .groupBy(col(groupCol))
      .agg(
        sum("_y").as("n_pos"),
        (count(lit(1)) - sum("_y")).as("n_neg"),
        sum(when(col("_y") === 1L, col("_avg2")).otherwise(0L)).as("_r2"))
      .withColumn("u2_pos", col("_r2") - col("n_pos") * (col("n_pos") + 1))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("u2_pos").cast(DoubleType) /
            (lit(2.0) * col("n_pos") * col("n_neg"))))
      .select(col(groupCol), col("n_pos"), col("n_neg"), col("u2_pos"),
        col("auc"))
  }

  /** Precision/recall operating curve: one row per DISTINCT score
    * threshold t with the exact confusion counts of the rule
    * "keep iff score ≥ t" — `tp`/`fp` cumulative from the top score
    * down, `fn` = n_pos − tp. Precision and recall are emitted as the
    * two single divisions of those integers.
    *
    * The corpus collapses to per-score rows FIRST (one keyed rollup —
    * the curve's length is the score domain, not the corpus), then
    * [[StatOps.globalRunningSums]] prefix-sums positives and negatives
    * under (score desc): both stages are shuffles of bounded frames,
    * no single-partition window, no driver loop.
    */
  def prCurve(
      df: DataFrame, labelCol: String, scoreCol: String): DataFrame =
    confusionSweep(df, labelCol, scoreCol)
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        (col("tp").cast(DoubleType) / (col("tp") + col("fp"))).as("precision"),
        (col("tp").cast(DoubleType) / col("_p_total")).as("recall"))

  /** The confusion sweep every threshold-based evaluator shares
    * ([[prCurve]], [[averagePrecision]], [[optimalThreshold]]): one row
    * per DISTINCT score threshold t (ORIGINAL score type — never cast)
    * with the exact counts of "positive iff score >= t". The corpus
    * collapses to per-score rows first, then
    * [[StatOps.globalRunningSums]] prefix-sums under (score desc) — a
    * domain-sized frame, no single-partition window.
    *
    * @return (`threshold`, `_pos` the threshold's own positive count,
    *         `tp`, `fp`, `fn`, `_p_total`).
    */
  private def confusionSweep(
      df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val perScore = df.groupBy(col(scoreCol).as("threshold"))
      .agg(
        sum(col(labelCol).cast("long")).as("_pos"),
        (count(lit(1)) - sum(col(labelCol).cast("long"))).as("_neg"))
    val totals = perScore.agg(
      sum("_pos").as("_p_total")).select(col("_p_total"))
    StatOps.globalRunningSums(perScore, Seq(col("threshold").desc),
        Seq("_pos" -> "tp", "_neg" -> "fp"))
      .crossJoin(broadcast(totals)) // 1-row totals frame (declared)
      .select(col("threshold"), col("_pos"), col("tp"), col("fp"),
        (col("_p_total") - col("tp")).as("fn"), col("_p_total"))
  }

  /** Per-group PERCENT_RANK without a group window: the score
    * normalization behind "drop the bottom 20% per language/source" —
    * a raw-score threshold applied corpus-wide silently over-prunes
    * whichever group scores lower. Standard SQL semantics
    * ((rank−1)/(n−1), rank = tie-min, 0 for singleton groups), but the
    * within-group rank comes from the global rank minus per-group
    * offsets and the tie-min from a keyed rollup — no partition ever
    * holds a whole group.
    *
    * @return `df` + (`rank_min` tie-min rank, `group_n`, `pct_rank`).
    */
  def groupPercentRank(
      df: DataFrame, groupCol: String, valueCol: String,
      idCol: String): DataFrame = {
    val ranked = StatOps.globalRowNumber(df,
      Seq(col(groupCol), col(valueCol), col(idCol)), "_i")
    val offs = ranked.groupBy(col(groupCol))
      .agg(min("_i").as("_o"), count(lit(1)).as("group_n"))
    val rg = ranked.join(offs, Seq(groupCol))
      .withColumn("_r", col("_i") - col("_o") + 1L)
    val tieMin = rg.groupBy(col(groupCol), col(valueCol))
      .agg(min("_r").as("rank_min"))
    rg.join(tieMin, Seq(groupCol, valueCol))
      .withColumn("pct_rank",
        when(col("group_n") > 1L,
          (col("rank_min") - 1L).cast(DoubleType) /
            (col("group_n") - 1L).cast(DoubleType))
          .otherwise(lit(0.0)))
      .drop("_i", "_o", "_r")
  }

  /** Calibration (reliability) table over integer scores: fixed-width
    * score bins, each with its row count, positive count, and exact
    * integer score mass — the table whose (mean score vs positive rate)
    * plot says whether the filter's scores mean what they claim. Bin =
    * floor(score / binWidth) via double floor-division: exact for any
    * |score| < 2⁵², identical IEEE in every engine, and correct (floor,
    * not truncate) for negative scores. One keyed rollup, map-side
    * combinable.
    *
    * @return one row per occupied bin: (`bin`, `n`, `n_pos`,
    *         `score_sum`, `pos_rate`, `mean_score` — the two single
    *         divisions of the exact integers)
    */
  def calibrationBins(
      df: DataFrame, labelCol: String, scoreCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    df.groupBy(floor(col(scoreCol) / lit(binWidth.toDouble)).as("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("n_pos"),
        sum(col(scoreCol)).cast("long").as("score_sum"))
      .withColumn("pos_rate",
        col("n_pos").cast(DoubleType) / col("n").cast(DoubleType))
      .withColumn("mean_score",
        col("score_sum").cast(DoubleType) / col("n").cast(DoubleType))
  }

  /** Expected calibration error of the PERCENTILE-calibrated score:
    * predicted probability = global percent-rank of the raw score (the
    * monotone calibration that needs no held-out fit), binned into
    * `bins` equal-width probability bins; per bin the positive rate
    * (`acc`) is compared with the mean predicted probability (`conf`),
    * and ECE = Σ_b (n_b/N)·|acc_b − conf_b|.
    *
    * Exactness: percent-rank is the exact rational (rank−1)/(N−1)
    * ([[groupPercentRank]], window-free); `conf_b` is kept rational as
    * Σ(rank−1) / (n_b·(N−1)) — ONE division of exact integers, not a
    * float mean; the final ECE folds the ≤`bins` per-bin terms in
    * ascending-bin order. Requires N ≥ 2 rows.
    *
    * @return one row: (`n_bins` occupied bins, `n` rows, `ece`)
    */
  def expectedCalibrationError(
      df: DataFrame, labelCol: String, scoreCol: String, idCol: String,
      bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val pr = groupPercentRank(
      df.select(col(idCol), col(scoreCol), col(labelCol).cast("boolean")
          .as("_y"), lit(1).as("_g")),
      "_g", scoreCol, idCol)
    val per = pr
      .withColumn("_bin",
        least(floor(col("pct_rank") * lit(bins.toDouble)),
          lit((bins - 1).toLong)).cast("long"))
      .groupBy("_bin")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("_y"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("rank_min") - 1L).as("_r_sum"),
        max("group_n").as("_n_tot"))
      .withColumn("acc",
        col("n_pos").cast(DoubleType) / col("n").cast(DoubleType))
      .withColumn("conf",
        col("_r_sum").cast(DoubleType) /
          (col("n") * (col("_n_tot") - 1L)).cast(DoubleType))
      .withColumn("_term",
        col("n").cast(DoubleType) / col("_n_tot").cast(DoubleType) *
          abs(col("acc") - col("conf")))
    per.agg(
        count(lit(1)).as("n_bins"),
        max("_n_tot").as("n"),
        aggregate(
          transform(
            array_sort(collect_list(struct(col("_bin"), col("_term")))),
            x => x.getField("_term")),
          lit(0.0), (acc, x) => acc + x).as("ece"))
  }

  /** Cumulative gains table: rows bucketed into score deciles (decile
    * 0 = highest scores) via the exact global percent-rank, each row
    * carrying the cumulative positive share ("top 20% of scores
    * captures X% of positives") and its lift over random targeting —
    * the table behind every gains/lift chart and "review the top
    * decile first" policy.
    *
    * Window-free: percent-rank from [[groupPercentRank]] (global rank
    * minus offsets), cumulative counts from
    * [[StatOps.globalRunningSums]] over the `buckets`-row rollup, and
    * every share/lift is a fixed expression tree over exact integers
    * (`lift = gain / pop_share` reuses the two already-derived
    * doubles, same tree both sides).
    *
    * @return one row per occupied decile: (`decile`, `n`, `n_pos`,
    *         `cum_n`, `cum_pos`, `gain`, `pop_share`, `lift`)
    */
  def gainsTable(
      df: DataFrame, labelCol: String, scoreCol: String, idCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    val pr = groupPercentRank(
      df.select(col(idCol), col(scoreCol),
        col(labelCol).cast("boolean").as("_y"), lit(1).as("_g")),
      "_g", scoreCol, idCol)
    val per = pr
      .withColumn("_dec",
        least(floor((lit(1.0) - col("pct_rank")) * buckets),
          lit((buckets - 1).toLong)).cast("long"))
      .groupBy("_dec")
      .agg(count(lit(1)).as("n"),
        sum(when(col("_y"), 1L).otherwise(0L)).as("n_pos"))
    val cum = StatOps.globalRunningSums(per, Seq(col("_dec")),
      Seq("n" -> "cum_n", "n_pos" -> "cum_pos"))
    val tot = per.agg(sum("n").as("_n_tot"), sum("n_pos").as("_pos_tot"))
    cum.crossJoin(broadcast(tot)) // 1-row totals frame (declared)
      .withColumn("gain",
        col("cum_pos").cast(DoubleType) / col("_pos_tot").cast(DoubleType))
      .withColumn("pop_share",
        col("cum_n").cast(DoubleType) / col("_n_tot").cast(DoubleType))
      .withColumn("lift", col("gain") / col("pop_share"))
      .select(col("_dec").as("decile"), col("n"), col("n_pos"),
        col("cum_n"), col("cum_pos"), col("gain"), col("pop_share"),
        col("lift"))
  }

  /** Deterministic multiplier bootstrap of a binary metric: `b`
    * resamples, where resample `r` weights row `i` by the integer
    * `w_ir = md5(salt:r:id) nibble mod 4` ∈ {0..3} (mean 1.5 — the
    * random-weight bootstrap with a hash in place of the RNG, so every
    * engine and every rerun draws the SAME resamples). Per resample:
    * weighted accuracy `Σw·acc / Σw` — exact integer sums into one
    * division. The spread of these `b` means IS the sampling
    * uncertainty of the metric; [[bootstrapCi]] turns them into order-
    * statistic bounds.
    *
    * One row explode (×b) + one keyed rollup — nothing stateful, no
    * RNG, no driver loop; at 100 TB you bootstrap a per-shard metric
    * frame, not raw rows.
    *
    * @param correctCol boolean column: the per-row metric being
    *                   bootstrapped (e.g. prediction == label)
    * @return `b` rows: (`r`, `w_sum`, `n_hit_w`, `acc_w`)
    */
  def bootstrapAccuracy(
      df: DataFrame, correctCol: String, idCol: String, b: Int,
      salt: String): DataFrame = {
    require(b >= 2, s"need at least 2 resamples, got $b")
    df.select(col(idCol), col(correctCol).cast("boolean").as("_ok"))
      .withColumn("r", explode(sequence(lit(1), lit(b))))
      .withColumn("_h",
        md5(concat_ws(":", lit(salt), col("r").cast("string"),
          col(idCol).cast("string"))))
      // first hex nibble → 0..15, mod 4 → weight 0..3 (instr-based, the
      // portable nibble decode the classifier oracle already uses)
      .withColumn("_w",
        expr("(instr('0123456789abcdef', substring(_h, 1, 1)) - 1) % 4")
          .cast("long"))
      .groupBy("r")
      .agg(
        sum("_w").as("w_sum"),
        sum(when(col("_ok"), col("_w")).otherwise(0L)).as("n_hit_w"))
      .withColumn("acc_w",
        when(col("w_sum") > 0,
          col("n_hit_w").cast(DoubleType) / col("w_sum").cast(DoubleType)))
  }

  /** Order-statistic bounds over [[bootstrapAccuracy]]'s resample
    * means: sorts the `b` means and reads the `loIdx`/`hiIdx`-th
    * (1-based) — e.g. 2nd and 19th of 20 for a ~90% interval. Pure
    * selection, no float arithmetic beyond the means themselves.
    *
    * @return one row: (`b`, `lo`, `hi`)
    */
  def bootstrapCi(
      perResample: DataFrame, loIdx: Int, hiIdx: Int): DataFrame = {
    require(loIdx >= 1 && hiIdx >= loIdx, s"bad indices ($loIdx, $hiIdx)")
    perResample
      .agg(count(lit(1)).as("b"),
        sort_array(collect_list(col("acc_w"))).as("_means"))
      .select(col("b"),
        element_at(col("_means"), loIdx).as("lo"),
        element_at(col("_means"), hiIdx).as("hi"))
  }

  /** Decision-stump feature audit: for each candidate categorical
    * feature, the label's WEIGHTED GINI IMPURITY after splitting on it
    * — `Σ_g (n_g/n)·(1 − p_g² − q_g²)` — the argmin row is the feature
    * a depth-1 tree would split on, and the gap to the others is the
    * fastest "is any metadata column predictive of the label"
    * screening a curation team runs (CART's split criterion,
    * distributed as one rollup per feature).
    *
    * Exactness: group/label counts are integers; each group's term is
    * a fixed expression tree of two divisions and two squarings; terms
    * fold in group-key order (keys are cast to strings so both engines
    * sort identically). One keyed rollup per feature, map-side
    * combinable; nothing corpus-sized leaves the executors.
    *
    * @param features (name, expression) pairs; the expression is
    *                 evaluated against `df` and cast to string
    * @return one row per feature: (`feature`, `n_groups`, `gini`)
    */
  def giniSplit(
      df: DataFrame, labelCol: String,
      features: Seq[(String, Column)]): DataFrame = {
    require(features.nonEmpty, "giniSplit: no candidate features")
    val y = col(labelCol).cast("boolean")
    features.map { case (name, fexpr) =>
      val per = df.groupBy(fexpr.cast("string").as("_g"))
        .agg(
          count(lit(1)).as("_n_g"),
          sum(when(y, 1L).otherwise(0L)).as("_n_pos"))
      val tot = per.agg(sum("_n_g").as("_n"))
      per.crossJoin(broadcast(tot)) // 1-row total (declared)
        .withColumn("_p", col("_n_pos").cast("double") /
          col("_n_g").cast("double"))
        .withColumn("_q", (col("_n_g") - col("_n_pos")).cast("double") /
          col("_n_g").cast("double"))
        .withColumn("_t",
          col("_n_g").cast("double") / col("_n").cast("double") *
            (lit(1.0) - col("_p") * col("_p") - col("_q") * col("_q")))
        .agg(
          count(lit(1)).as("n_groups"),
          aggregate(
            transform(
              array_sort(collect_list(struct(col("_g"), col("_t")))),
              s => s.getField("_t")),
            lit(0.0), (acc, x) => acc + x).as("gini"))
        .select(lit(name).as("feature"), col("n_groups"), col("gini"))
    }.reduce(_.unionAll(_))
  }

  /** The NDCG rank-discount table `d_i = 1 / log2(i+1)`, `i = 1..k` —
    * computed ONCE here (JVM libm) and embedded as literals in both the
    * engine plan and the generated oracle SQL, so the two sides share
    * bit-identical constants without trusting two libms to agree. */
  def ndcgDiscounts(k: Int): Array[Double] =
    Array.tabulate(k)(i => 1.0 / (math.log(i + 2) / math.log(2.0)))

  /** Ideal-DCG prefix sums `P_j = ((0 + d_1) + d_2) + … + d_j` in the
    * SAME left-fold order the DCG fold uses — `IDCG@k` for a user with
    * `r` relevant items is `P_min(r,k)`. */
  def ndcgIdealPrefix(k: Int): Array[Double] =
    ndcgDiscounts(k).scanLeft(0.0)(_ + _).tail

  /** Offline ranking-quality battery — per user: hits@k, reciprocal
    * rank@k, DCG@k / IDCG@k / NDCG@k, precision@k and recall@k. The
    * measurements a retrieval or recommender eval runs against a
    * held-out interaction set before shipping a ranker.
    *
    * `ranked` holds one row per (user, candidate item) with a numeric
    * score — the full candidate slate per user, zero-scored items
    * included (rank is dense over the slate). Rank = score desc, item
    * asc tiebreak, assigned by ONE global range-partitioned row number
    * minus per-user offsets ([[StatOps.globalRowNumber]] — never a
    * per-user window, whose partitions inherit the heaviest user's
    * skew). `relevant` holds (user, item) ground-truth pairs; rows are
    * de-duplicated defensively.
    *
    * Exactness: DCG sums the irrational discounts `1/log2(rank+1)` in
    * ascending-rank left-fold order over a sorted collected array (≤ k
    * elements), IDCG is a literal prefix-table lookup at min(n_rel, k),
    * and every ratio is one IEEE division — the oracle replays all of
    * it with the same embedded constants via `list_reduce`.
    *
    * @return one row per ranked user: (`userCol`, `n_rel`, `hits`,
    *         `first_hit` rank of the first relevant in top-k or null,
    *         `rr`, `dcg`, `idcg`, `ndcg`, `precision_k`, `recall_k` —
    *         the NDCG family is null for users with no relevant items)
    */
  def rankingMetrics(
      ranked: DataFrame, userCol: String, itemCol: String, scoreCol: String,
      relevant: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val dArr = array(ndcgDiscounts(k).map(lit): _*)
    val pArr = array(ndcgIdealPrefix(k).map(lit): _*)
    val withRow = StatOps.globalRowNumber(
      ranked.select(col(userCol), col(itemCol), col(scoreCol)),
      Seq(col(userCol), col(scoreCol).desc, col(itemCol)), "_i")
    val offs = withRow.groupBy(col(userCol)).agg(min("_i").as("_o"))
    val rk = withRow.join(offs, Seq(userCol))
      .withColumn("_rnk", col("_i") - col("_o") + 1L)
    val rel = relevant.select(col(userCol), col(itemCol)).distinct()
    val nRel = rel.groupBy(col(userCol)).agg(count(lit(1)).as("n_rel"))
    val j = rk.join(rel.withColumn("_rel", lit(1)), Seq(userCol, itemCol),
        "left")
      .na.fill(0, Seq("_rel"))
    j.groupBy(col(userCol))
      .agg(
        sum(when(col("_rel") === 1 && col("_rnk") <= k, 1L).otherwise(0L))
          .as("hits"),
        min(when(col("_rel") === 1 && col("_rnk") <= k, col("_rnk")))
          .as("first_hit"),
        aggregate(
          sort_array(collect_list(
            when(col("_rel") === 1 && col("_rnk") <= k, col("_rnk")))),
          lit(0.0),
          (acc, r) => acc + element_at(dArr, r.cast("int"))).as("dcg"))
      .join(nRel, Seq(userCol), "left")
      .na.fill(0L, Seq("n_rel"))
      .withColumn("rr",
        coalesce(lit(1.0) / col("first_hit").cast(DoubleType), lit(0.0)))
      .withColumn("idcg",
        when(col("n_rel") >= 1L,
          element_at(pArr, least(col("n_rel"), lit(k.toLong)).cast("int"))))
      .withColumn("ndcg", col("dcg") / col("idcg"))
      .withColumn("precision_k",
        col("hits").cast(DoubleType) / lit(k.toDouble))
      .withColumn("recall_k",
        when(col("n_rel") >= 1L,
          col("hits").cast(DoubleType) / col("n_rel").cast(DoubleType)))
      .select(col(userCol), col("n_rel"), col("hits"), col("first_hit"),
        col("rr"), col("dcg"), col("idcg"), col("ndcg"),
        col("precision_k"), col("recall_k"))
  }

  /** Corpus-level rollup of [[rankingMetrics]]: evaluated users (those
    * with ≥ 1 relevant item), MRR, mean NDCG@k, and hit rate@k. The two
    * float means are ordered folds over users sorted by id (float
    * addition is order-sensitive; the oracle replays the same order),
    * divided once. */
  def rankingSummary(perUser: DataFrame, userCol: String): DataFrame = {
    val qual = perUser.filter(col("n_rel") >= 1L)
    qual.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("hits") >= 1L, 1L).otherwise(0L)).as("n_hit"),
        aggregate(
          transform(
            array_sort(collect_list(struct(col(userCol), col("rr")))),
            x => x.getField("rr")),
          lit(0.0), (acc, x) => acc + x).as("_rr_sum"),
        aggregate(
          transform(
            array_sort(collect_list(struct(col(userCol), col("ndcg")))),
            x => x.getField("ndcg")),
          lit(0.0), (acc, x) => acc + x).as("_ndcg_sum"))
      .select(col("n_users"), col("n_hit"),
        (col("_rr_sum") / col("n_users").cast(DoubleType)).as("mrr"),
        (col("_ndcg_sum") / col("n_users").cast(DoubleType)).as("mean_ndcg"),
        (col("n_hit").cast(DoubleType) / col("n_users").cast(DoubleType))
          .as("hit_rate"))
  }

  /** Cohen's kappa between two binary raters — chance-corrected
    * agreement `κ = (p_o − p_e)/(1 − p_e)`, the standard sanity check
    * before trusting "two filters agree" (two filters that both pass
    * 95% of a corpus agree 90%+ by chance alone; raw agreement is
    * meaningless there). Used to compare a learned filter against a
    * rule filter, or two annotator models against each other.
    *
    * One map-side-combinable rollup to the four confusion counts; p_o,
    * p_e and κ are fixed expression trees over those integers (two
    * divisions, one subtraction-quotient), so the oracle replays every
    * double bit-identically. κ is null when p_e = 1 (a degenerate
    * single-cell table, where kappa is undefined).
    *
    * @return one row: (`n11`, `n10`, `n01`, `n00`, `n`, `po`, `pe`,
    *         `kappa`)
    */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val a = col(aCol).cast("boolean")
    val b = col(bCol).cast("boolean")
    df.agg(
        sum(when(a && b, 1L).otherwise(0L)).as("n11"),
        sum(when(a && !b, 1L).otherwise(0L)).as("n10"),
        sum(when(!a && b, 1L).otherwise(0L)).as("n01"),
        sum(when(!a && !b, 1L).otherwise(0L)).as("n00"))
      .withColumn("n",
        col("n11") + col("n10") + col("n01") + col("n00"))
      .withColumn("po",
        (col("n11") + col("n00")).cast(DoubleType) /
          col("n").cast(DoubleType))
      .withColumn("pe",
        ((col("n11") + col("n10")) * (col("n11") + col("n01")) +
          (col("n01") + col("n00")) * (col("n10") + col("n00")))
          .cast(DoubleType) / (col("n") * col("n")).cast(DoubleType))
      .withColumn("kappa",
        when(col("pe") < 1.0,
          (col("po") - col("pe")) / (lit(1.0) - col("pe"))))
  }

  /** Krippendorff's alpha (nominal) — inter-rater agreement for ANY
    * number of raters with missing ratings, the generalization
    * [[cohensKappa]] (exactly 2 raters, no gaps) can't reach: α =
    * 1 − D_o/D_e over all pairable ratings, where units rated once
    * drop out and every rater pair within a unit counts.
    *
    * Exactness: the only rationals are the per-unit 1/(m_u − 1)
    * weights, and with rater counts bounded by `maxRaters` they all
    * divide L = lcm(1 … maxRaters−1) — so the observed-disagreement
    * numerator accumulates as the exact integer
    * Σ_u d_u · (L div (m_u − 1)) (d_u = disagreeing ordered pairs =
    * m_u(m_u−1) − Σ_c n_uc(n_uc−1)), the expected-disagreement
    * numerator is n² − Σ_c n_c², and
    * α = 1 − (n−1)·D_oL / (L·(n² − Σ n_c²)) is integer until ONE
    * final IEEE division. Units above `maxRaters` raise in-plan
    * rather than silently mis-weighting. n² and the products ride
    * DECIMAL(38,0) — 2⁶³ clears near 3·10⁹ ratings.
    *
    * Plan: one (unit, label) rollup (map-side combinable), a
    * unit-sized filter/rollup, a label-domain rollup off the same
    * pinned cells, two 1-row folds crossed (declared scalar
    * broadcast). Nothing corpus-global.
    *
    * @return one row: (`n` pairable ratings, `n_units`, `n_labels`,
    *         `do_num` = D_o·L·n (exact), `de_num` = n² − Σ n_c²,
    *         `alpha` — null when D_e = 0, where agreement is undefined)
    */
  def krippendorffAlpha(
      df: DataFrame, unitCol: String, labelCol: String,
      maxRaters: Int = 12): DataFrame = {
    require(maxRaters >= 2 && maxRaters <= 42,
      s"krippendorffAlpha: maxRaters must be in [2, 42], got $maxRaters")
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val L = (1 until maxRaters).foldLeft(1L)((acc, i) => acc / gcd(acc, i) * i)
    // Per-unit term bound with DIVIDE-FIRST weighting (L div (m−1) is
    // exact by construction): d_u·(L div (m_u−1)) ≤ m_u·L ≤ maxRaters·L.
    // Reject configurations where even one term could wrap a long —
    // found in review: the multiply-first form wrapped inside the
    // documented [2, 42] range.
    require(L <= Long.MaxValue / maxRaters,
      s"krippendorffAlpha: maxRaters = $maxRaters puts the lcm-weighted " +
        s"term bound ($maxRaters × $L) past 2^63 — use a smaller bound")
    val cells = df
      .groupBy(col(unitCol).as("_u"), col(labelCol).as("_c"))
      .agg(count(lit(1)).as("_nuc"))
      .stagePin() // two consumers: the unit rollup and the label totals
    val units = cells.groupBy("_u")
      .agg(sum("_nuc").as("_mu"),
        sum(col("_nuc") * col("_nuc")).as("_sq"))
      .filter(col("_mu") >= 2L)
      .select(col("_u"), col("_mu"),
        when(col("_mu") > lit(maxRaters.toLong),
          raise_error(concat(
            lit(s"krippendorffAlpha: a unit holds more than $maxRaters " +
              "ratings — raise maxRaters (lcm weighting is bounded); m_u = "),
            col("_mu").cast("string"))))
          .otherwise(expr(
            s"(_mu * (_mu - 1L) - (_sq - _mu)) * (${L}L div (_mu - 1L))"))
          .as("_do"))
      .stagePin() // two consumers: the scalar fold and the label semi join
    // sum in DECIMAL, not long: per-unit terms are wrap-free (the
    // require above) but their corpus sum is not
    val uTot = units.agg(sum("_mu").as("n"),
      count(lit(1)).as("n_units"),
      sum(col("_do").cast("decimal(38,0)")).cast("decimal(38,0)")
        .as("do_num"))
    val lTot = cells
      .join(units.select("_u"), Seq("_u"), "left_semi")
      .groupBy("_c").agg(sum("_nuc").as("_nc"))
      .agg(count(lit(1)).as("n_labels"),
        sum(col("_nc").cast("decimal(38,0)") *
          col("_nc").cast("decimal(38,0)")).cast("decimal(38,0)").as("_sc2"))
    uTot.crossJoin(broadcast(lTot)) // 1-row × 1-row scalar cross (declared)
      .select(col("n"), col("n_units"), col("n_labels"), col("do_num"),
        (col("n").cast("decimal(38,0)") * col("n").cast("decimal(38,0)") -
          col("_sc2")).cast("decimal(38,0)").as("de_num"))
      .withColumn("alpha",
        when(col("de_num") > 0,
          lit(1.0) -
            ((col("n") - 1L).cast("decimal(38,0)") * col("do_num"))
              .cast("double") /
            (lit(L).cast("decimal(38,0)") * col("de_num")).cast("double")))
  }

  /** Matthews correlation coefficient of a boolean prediction against a
    * boolean label — the confusion-matrix summary that stays honest
    * under class imbalance (accuracy and F1 both flatter a
    * majority-class guesser; MCC is the ±1-scaled determinant of the
    * 2×2 table). Exact to the last step:
    * MCC = (TP·TN − FP·FN) / √((TP+FP)(TP+FN)(TN+FP)(TN+FN)) with every
    * product in DECIMAL(38) — the 4-factor product can pass 2⁶³ at a
    * few hundred thousand rows, which is exactly the silent-overflow
    * trap a long formulation would hit — then one sqrt + one division.
    * One rollup, map-side combinable.
    *
    * @return one row: (`tp`, `fp`, `fn`, `tn`, `mcc` — null when any
    *         margin is empty, where the statistic is undefined).
    */
  def matthewsCorrelation(
      df: DataFrame, predCol: String, labelCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val p = col(predCol).cast("boolean")
    val y = col(labelCol).cast("boolean")
    df.agg(
        sum(when(p && y, 1L).otherwise(0L)).as("tp"),
        sum(when(p && !y, 1L).otherwise(0L)).as("fp"),
        sum(when(!p && y, 1L).otherwise(0L)).as("fn"),
        sum(when(!p && !y, 1L).otherwise(0L)).as("tn"))
      .withColumn("_den",
        (col("tp") + col("fp")).cast(d38) *
          (col("tp") + col("fn")).cast(d38) *
          (col("tn") + col("fp")).cast(d38) *
          (col("tn") + col("fn")).cast(d38))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("_den") > 0,
          (col("tp").cast(d38) * col("tn").cast(d38) -
            col("fp").cast(d38) * col("fn").cast(d38)).cast(DoubleType) /
            sqrt(col("_den").cast(DoubleType))).as("mcc"))
  }

  /** EXACT Brier score of the percentile-calibrated classifier:
    * mean((p − y)²) with p = the exact rational percent-rank
    * (rank_min − 1)/(N − 1) ([[groupPercentRank]]) — the proper scoring
    * rule that decomposes into calibration + refinement, judging the
    * same probability map [[expectedCalibrationError]] bins. Kept
    * integral to the last step: (p − y)² = d²/(N−1)² with
    * d = (rank_min − 1) − y·(N−1) an exact integer, so
    * Brier = Σd² / (N·(N−1)²) — DECIMAL sums, ONE double division.
    * |d| ≤ N keeps Σd² ≤ N³ inside 38 digits through ~10¹² rows.
    *
    * @return one row: (`n`, `brier`) — null when n ≤ 1 (percent-rank
    *         undefined).
    */
  def brierScore(
      df: DataFrame, labelCol: String, scoreCol: String,
      idCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val pr = groupPercentRank(
      df.select(col(idCol), col(scoreCol),
        col(labelCol).cast("boolean").as("_y"), lit(1).as("_g")),
      "_g", scoreCol, idCol)
    val nD = col("n").cast(d38)
    pr.select(col("rank_min"), col("group_n"), col("_y"))
      .withColumn("_d", (col("rank_min") - 1L) -
        when(col("_y"), col("group_n") - 1L).otherwise(0L))
      .agg(count(lit(1)).as("n"),
        sum(col("_d").cast(d38) * col("_d").cast(d38)).as("_sd2"))
      .select(col("n"),
        when(col("n") > 1L,
          col("_sd2").cast(DoubleType) /
            (nD * (nD - 1) * (nD - 1)).cast(DoubleType)).as("brier"))
  }

  /** EXACT isotonic (PAV) calibration over fixed-width score bins — the
    * held-out-fit-free monotone calibrator that turns a raw classifier
    * score into a probability while provably never un-ordering two
    * scores. Instead of the sequential pool-adjacent-violators sweep
    * (irreproducible to gate: pooling order is an implementation
    * detail), the fit uses the closed MINIMAX identity for isotonic
    * least squares:
    *
    *   iso(i) = max_{j ≤ i} min_{k ≥ i} mean(y over bins j..k)
    *
    * — equal to PAV's output by the classic result (Barlow et al. 1972).
    * Segment means are one IEEE division of exact integer sums, and
    * min/max are order-free, so the fit is a pure function of the bin
    * table on any engine.
    *
    * Scale: the corpus collapses to B bins in ONE keyed rollup; the
    * O(B³) segment enumeration runs on the B-row frame (corpus-
    * INDEPENDENT — B is bounded by the score range over the bin width,
    * tens in practice) via two broadcast range joins, declared
    * nested-loop like every other ≤B-row cross in the repo. Nothing
    * quadratic ever touches corpus-sized data.
    *
    * @return one row per occupied bin: (`bin`, `n`, `n_pos`,
    *         `pos_rate`, `iso`) with `iso` non-decreasing in `bin`.
    */
  def isotonicCalibration(
      df: DataFrame, labelCol: String, scoreCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val bins = df
      .groupBy(floor(col(scoreCol) / lit(binWidth.toDouble)).as("bin"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("n_pos"))
    // segment means a(j,k) = pos(j..k)/n(j..k), exact sums, one division
    val seg = bins.select(col("bin").as("j")).crossJoin(
        bins.select(col("bin").as("k")))
      .filter(col("j") <= col("k"))
      .join(bins, col("bin").between(col("j"), col("k")))
      .groupBy("j", "k")
      .agg((sum(col("n_pos")).cast(DoubleType) /
        sum(col("n")).cast(DoubleType)).as("a"))
    val iso = seg
      .join(bins.select(col("bin").as("i")),
        col("j") <= col("i") && col("k") >= col("i"))
      .groupBy("i", "j").agg(min(col("a")).as("_mn"))
      .groupBy("i").agg(max(col("_mn")).as("iso"))
    bins.join(iso, col("bin") === col("i"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast(DoubleType) / col("n").cast(DoubleType))
          .as("pos_rate"),
        col("iso"))
  }

  /** Exact average precision (area under the PR curve by the step rule):
    * AP = Σ_k ΔR_k · P_k over DESCENDING distinct score thresholds —
    * the single-number summary of [[prCurve]], and the metric that
    * (unlike ROC AUC) stays honest under the 1:10⁴ class imbalance a
    * dedup/quality filter actually faces.
    *
    * Each term collapses to ONE division of exact integers:
    * ΔR·P = (pos_k·tp_k) / (P·(tp_k+fp_k)) — pos_k is the threshold's
    * own positive count (the Δtp), tp/fp the running sums from the
    * range-staged [[StatOps.globalRunningSums]], never a
    * single-partition window. The term fold is pinned to threshold-
    * descending order on both engines. Score-DOMAIN-sized throughout.
    *
    * @return one row: (`n_pos`, `n_thresholds`, `average_precision`,
    *         null AP when no positives).
    */
  def averagePrecision(
      df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val cum = confusionSweep(df, labelCol, scoreCol)
      .withColumn("_term",
        // the P = 0 guard keeps ANSI mode from 0/0 on an all-negative
        // corpus; the final AP is null-gated on P anyway
        when(col("_p_total") > 0L,
          (col("_pos") * col("tp")).cast(DoubleType) /
            (col("_p_total") * (col("tp") + col("fp"))).cast(DoubleType))
          .otherwise(lit(0.0)))
    cum.agg(
      max("_p_total").as("n_pos"),
      count(lit(1)).as("n_thresholds"),
      when(max("_p_total") > 0L,
        aggregate(
          transform(
            // threshold-DESCENDING = reverse of the ascending struct
            // sort; keeps the confusionSweep contract that `threshold`
            // retains the ORIGINAL score type (any orderable type, no
            // numeric negation, no Long.MinValue overflow under ANSI)
            reverse(array_sort(collect_list(struct(col("threshold"),
              col("_term").as("_t"))))),
            x => x.getField("_t")),
          lit(0.0), (acc, x) => acc + x)).as("average_precision"))
  }

  /** Log-loss (cross-entropy) of the percentile-calibrated score with
    * Laplace smoothing p = rank_min/(N+1) — strictly inside (0, 1), so
    * both logs exist without an epsilon clip, and both are RATIONAL:
    * ln(p) = pln(rank, N+1) and ln(1−p) = pln(N+1−rank, N+1) via
    * [[graft.expr.PortableLnRatio]] (libm-free).
    *
    * Scale/determinism: rows collapse to the DISTINCT-score rollup
    * first (equal score ⇒ equal rank ⇒ equal term), each threshold
    * contributes pos·ln(p) + neg·ln(1−p) as one fixed expression tree,
    * and the fold over thresholds is pinned to score order — a
    * domain-sized ordered fold, never a corpus-sized one.
    *
    * @return one row: (`n`, `n_pos`, `log_loss`).
    */
  def logLoss(
      df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val perScore = df.groupBy(col(scoreCol).as("threshold"))
      .agg(count(lit(1)).as("_cnt"),
        sum(col(labelCol).cast("long")).as("_pos"))
    val totals = perScore.agg(sum("_cnt").as("_n"), sum("_pos").as("_np"))
    val pln = graft.expr.PortableLnRatio.ln _
    val terms = StatOps.globalRunningSums(perScore,
        Seq(col("threshold").asc), Seq("_cnt" -> "_cum"))
      .crossJoin(broadcast(totals)) // 1-row totals frame (declared)
      .withColumn("_rank", col("_cum") - col("_cnt") + 1L)
      .withColumn("_term",
        col("_pos").cast(DoubleType) *
          pln(col("_rank"), col("_n") + 1L) +
          (col("_cnt") - col("_pos")).cast(DoubleType) *
          pln(col("_n") + 1L - col("_rank"), col("_n") + 1L))
    terms.agg(
      max("_n").as("n"),
      max("_np").as("n_pos"),
      (-(aggregate(
        transform(
          array_sort(collect_list(struct(col("threshold"), col("_term").as("_t")))),
          x => x.getField("_t")),
        lit(0.0), (acc, x) => acc + x) /
        max("_n").cast(DoubleType))).as("log_loss"))
  }

  /** Cost-optimal decision threshold over the exact [[confusionSweep]]:
    * classify positive at score ≥ τ, cost(τ) = costFp·fp + costFn·fn,
    * minimized over every distinct score AND the never-alarm option
    * (τ = null, cost = costFn·P) — the operating-point pick behind
    * "review queue capacity costs 1, a missed duplicate costs 5".
    * Entirely integer (counts from the range-staged running sums, one
    * integer cost expression), argmin by an order-free struct-min with
    * ties to the LOWEST threshold (never-alarm LOSES ties to any real
    * threshold), so the pick is exact and hash-stable — no ROC tangent
    * geometry, no floats at all. The threshold keeps the score
    * column's ORIGINAL type, and never-alarm rides an out-of-band flag
    * — no sentinel value a real score could collide with, no cast a
    * fractional score could be truncated by.
    *
    * @return one row: (`threshold` null = never alarm, `tp`, `fp`,
    *         `fn`, `cost`).
    */
  def optimalThreshold(
      df: DataFrame, labelCol: String, scoreCol: String,
      costFp: Long, costFn: Long): DataFrame = {
    require(costFp >= 0 && costFn >= 0,
      s"optimalThreshold: negative costs ($costFp, $costFn)")
    val sweep = confusionSweep(df, labelCol, scoreCol)
      .select(col("threshold"), lit(false).as("_never"), col("tp"),
        col("fp"), col("fn"))
    // the never-alarm point needs only P = max(tp + fn), a one-row
    // aggregate of the domain-sized sweep — not another corpus scan
    val never = sweep
      .agg(coalesce(max(col("tp") + col("fn")), lit(0L)).as("fn"))
      .select(lit(null).cast(sweep.schema("threshold").dataType)
          .as("threshold"),
        lit(true).as("_never"), lit(0L).as("tp"), lit(0L).as("fp"),
        col("fn"))
    val swept = sweep.unionByName(never)
      .withColumn("cost",
        lit(costFp) * col("fp") + lit(costFn) * col("fn"))
    swept.agg(min(struct(col("cost"), col("_never"), col("threshold"),
        col("tp"), col("fp"), col("fn"))).as("_m"))
      .select(
        when(!col("_m._never"), col("_m.threshold")).as("threshold"),
        col("_m.tp").as("tp"), col("_m.fp").as("fp"),
        col("_m.fn").as("fn"), col("_m.cost").as("cost"))
  }

  /** Per-class precision/recall/F1 of a single-label multiclass
    * classifier. The class domain is the UNION of observed truth and
    * predicted labels (full outer join of the two marginals), so a
    * class the model never emits still gets its recall-0 row and a
    * hallucinated label gets its precision-0 row — both invisible to
    * an inner-join scorecard.
    *
    * Everything is exact integers until one division per statistic,
    * and F1 is computed as 2·tp / (n_true + n_pred) — algebraically the
    * harmonic mean of P and R but a SINGLE division, so no
    * division-of-divisions rounding and no 0/0 guard when tp = 0.
    *
    * Scale: one corpus-sized keyed rollup to the confusion cells, then
    * class-domain-sized equi-joins (broadcast at any realistic label
    * cardinality).
    *
    * @return one row per class: (`cls`, `n_true`, `n_pred`, `tp`,
    *         `precision` null when never predicted, `recall` null when
    *         never true, `f1`)
    */
  def multiclassF1(
      df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val cells = df
      .groupBy(col(labelCol).as("_y"), col(predCol).as("_p"))
      .agg(count(lit(1)).as("_n"))
    val truth = cells.groupBy(col("_y").as("cls"))
      .agg(sum("_n").as("n_true"))
    val pred = cells.groupBy(col("_p").as("cls"))
      .agg(sum("_n").as("n_pred"))
    val tp = cells.filter(col("_y") <=> col("_p"))
      .select(col("_y").as("cls"), col("_n").as("tp"))
    // null-SAFE join keys: a null label and a null prediction are the
    // same (missing) class — plain equi-joins would split it into a
    // recall-only and a precision-only row and double-count it in the
    // summary's n_classes
    truth
      .join(pred.withColumnRenamed("cls", "_pc"),
        col("cls") <=> col("_pc"), "full_outer")
      .select(coalesce(col("cls"), col("_pc")).as("cls"),
        col("n_true"), col("n_pred"))
      .join(tp.withColumnRenamed("cls", "_tc"),
        col("cls") <=> col("_tc"), "left_outer")
      .select(col("cls"), col("n_true"), col("n_pred"), col("tp"))
      .na.fill(0L, Seq("n_true", "n_pred", "tp"))
      .select(col("cls"), col("n_true"), col("n_pred"), col("tp"),
        when(col("n_pred") > 0L,
          col("tp").cast(DoubleType) / col("n_pred").cast(DoubleType))
          .as("precision"),
        when(col("n_true") > 0L,
          col("tp").cast(DoubleType) / col("n_true").cast(DoubleType))
          .as("recall"),
        (lit(2.0) * col("tp").cast(DoubleType) /
          (col("n_true") + col("n_pred")).cast(DoubleType)).as("f1"))
  }

  /** Corpus scorecard over [[multiclassF1]]'s per-class table: micro F1
    * (= accuracy for single-label multiclass — Σtp over N, one
    * division), macro F1 (unweighted class mean), and
    * support-weighted F1. The two means fold their per-class terms in
    * class order (the [[expectedCalibrationError]] ordered-aggregate
    * discipline) so both engines add the same doubles in the same
    * order.
    *
    * @return one row: (`n`, `n_classes`, `micro_f1`, `macro_f1`,
    *         `weighted_f1`)
    */
  def multiclassF1Summary(perClass: DataFrame): DataFrame = {
    def orderedSum(term: Column): Column =
      aggregate(
        transform(
          array_sort(collect_list(struct(col("cls"), term.as("_t")))),
          x => x.getField("_t")),
        lit(0.0), (acc, x) => acc + x)
    perClass.agg(
      sum("n_true").as("n"),
      count(lit(1)).as("n_classes"),
      (sum("tp").cast(DoubleType) / sum("n_true").cast(DoubleType))
        .as("micro_f1"),
      (orderedSum(col("f1")) / count(lit(1)).cast(DoubleType))
        .as("macro_f1"),
      (orderedSum(col("n_true").cast(DoubleType) * col("f1")) /
        sum("n_true").cast(DoubleType)).as("weighted_f1"))
  }
}
