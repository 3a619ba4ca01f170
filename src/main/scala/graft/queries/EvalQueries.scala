package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, T}
import graft.ops.{EvalOps, TextOps}

/** Model-evaluation gates: the hashed linear quality classifier scored
  * against the "is English" ground truth, then judged by the three
  * standard filter-evaluation lenses — exact AUC, the precision/recall
  * operating curve, and the calibration table. Every statistic is
  * integer counts / doubled rank sums plus single IEEE divisions, so
  * the DuckDB oracle replays inference AND evaluation bit-identically.
  */
object EvalQueries {

  /** Classifier score + binary label per document, STAGED per corpus
    * snapshot — six gates read this frame, and re-running full-corpus
    * inference per gate is exactly the unstaged shape that cost round 9
    * the incremental-delta regression. LRU-bounded like every other
    * shared frame. The join is a plain doc_id equi-join (broadcastable
    * at these SFs; key-shuffled at 100 TB). */
  private val scoredCache =
    new graft.ops.BoundedDfCache[(SparkSession, String)](maxEntries = 8)

  private def scored(s: SparkSession, d: String): DataFrame =
    scoredCache.getOrElseUpdate((s, d)) {
      val docs = T(s, d, "documents")
      TextOps.qualityClassifier(docs, "doc_id", "text")
        .join(docs.select(col("doc_id"), (col("lang") === "en").as("is_en"),
            col("source")),
          Seq("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** The classifier-inference CTE (the `text_quality_classifier` oracle
    * verbatim) extended with the label — shared by all three gates. */
  private val scoredCte =
    """s AS (
      |  SELECT doc_id, CAST(sum(w) AS BIGINT) AS score,
      |    any_value(pos) AS pos, any_value(src) AS src
      |  FROM (
      |    SELECT doc_id, lang = 'en' AS pos, source AS src,
      |      ((instr('0123456789abcdef', substr(b, 1, 1)) * 16 +
      |        instr('0123456789abcdef', substr(b, 2, 1)) - 17)
      |       * 37 + 11) % 17 - 8 AS w
      |    FROM (SELECT doc_id, lang, source, substr(md5(tok), 1, 2) AS b
      |          FROM (SELECT doc_id, lang, source,
      |                  unnest(string_split_regex(trim(text), ' +')) AS tok
      |                FROM documents)))
      |  GROUP BY doc_id)""".stripMargin

  val all: Seq[Q] = Seq(
    // Exact ROC AUC ([[EvalOps.aucExact]]): tie-averaged Mann-Whitney U
    // of the positive class over n_pos*n_neg, doubled rank sums so ties
    // stay integer. The oracle replays the midrank identity
    // 2*avg_rank = 2*RANK() + tie_count - 1 over the same score order.
    Q(
      "eval_auc_exact",
      (s, d) =>
        EvalOps.aucExact(scored(s, d), "is_en", "score", "doc_id")
          .orderBy("n_pos"),
      Some(s"""WITH $scoredCte,
              |r AS (SELECT pos, 2 * RANK() OVER (ORDER BY score) +
              |        count(*) OVER (PARTITION BY score) - 1 AS avg2
              |      FROM s),
              |t AS (SELECT
              |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n_pos,
              |    CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT)
              |      AS n_neg,
              |    CAST(sum(CASE WHEN pos THEN avg2 ELSE 0 END) AS BIGINT)
              |      AS r2
              |  FROM r)
              |SELECT n_pos, n_neg, r2 - n_pos * (n_pos + 1) AS u2_pos,
              |  CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE) /
              |    (2.0 * n_pos * n_neg) AS auc
              |FROM t ORDER BY n_pos""".stripMargin),
      "exact ROC AUC: tie-averaged rank statistic, doubled-integer U"),

    // Stratified AUC ([[EvalOps.aucExactByGroup]]): per-SOURCE AUC of
    // the English signal — the report that catches a filter working on
    // one ingestion source and failing on another. The within-group
    // rank comes from one GLOBAL midrank minus per-group offsets
    // (never a group window, which would inherit the largest group's
    // skew); the oracle gets to use the partitioned window the engine
    // avoids.
    Q(
      "eval_auc_by_group",
      (s, d) =>
        EvalOps.aucExactByGroup(scored(s, d), "source", "is_en", "score",
            "doc_id")
          .orderBy("source"),
      Some(s"""WITH $scoredCte,
              |r AS (SELECT src, pos,
              |    2 * RANK() OVER (PARTITION BY src ORDER BY score) +
              |      count(*) OVER (PARTITION BY src, score) - 1 AS avg2
              |  FROM s),
              |t AS (SELECT src AS source,
              |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n_pos,
              |    CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT)
              |      AS n_neg,
              |    CAST(sum(CASE WHEN pos THEN avg2 ELSE 0 END) AS BIGINT)
              |      AS r2
              |  FROM r GROUP BY src)
              |SELECT source, n_pos, n_neg,
              |  r2 - n_pos * (n_pos + 1) AS u2_pos,
              |  CASE WHEN n_pos > 0 AND n_neg > 0
              |    THEN CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE) /
              |      (2.0 * n_pos * n_neg) END AS auc
              |FROM t ORDER BY source""".stripMargin),
      "stratified AUC per source: global-midrank-minus-offset, no skewed group window"),

    // Per-source score normalization ([[EvalOps.groupPercentRank]]):
    // PERCENT_RANK of the classifier score within each source — the
    // primitive behind "drop the bottom 20% per source" (a raw
    // threshold over-prunes whichever source scores lower). Engine side
    // is window-free (global rank − offsets + tie-min rollup); the
    // oracle uses the group windows.
    Q(
      "eval_score_percentile",
      (s, d) =>
        EvalOps.groupPercentRank(
            scored(s, d).select("doc_id", "source", "score"),
            "source", "score", "doc_id")
          .withColumn("keep", col("pct_rank") >= 0.2)
          .select("doc_id", "source", "score", "rank_min", "group_n",
            "pct_rank", "keep")
          .orderBy("doc_id"),
      Some(s"""WITH $scoredCte,
              |g AS (SELECT doc_id, src AS source, score,
              |    CAST(RANK() OVER (PARTITION BY src ORDER BY score)
              |      AS BIGINT) AS rank_min,
              |    CAST(count(*) OVER (PARTITION BY src) AS BIGINT)
              |      AS group_n
              |  FROM s)
              |SELECT doc_id, source, score, rank_min, group_n,
              |  CASE WHEN group_n > 1
              |    THEN CAST(rank_min - 1 AS DOUBLE) / (group_n - 1)
              |    ELSE 0.0 END AS pct_rank,
              |  (CASE WHEN group_n > 1
              |    THEN CAST(rank_min - 1 AS DOUBLE) / (group_n - 1)
              |    ELSE 0.0 END) >= 0.2 AS keep
              |FROM g ORDER BY doc_id""".stripMargin),
      "per-source percentile normalization: drop-bottom-20%-per-source, window-free"),

    // PR operating curve ([[EvalOps.prCurve]]): exact confusion counts
    // for "keep iff score >= t" at every DISTINCT score — the corpus
    // collapses to per-score rows first, then the distributed prefix
    // sum walks the thresholds top-down. The oracle is one window over
    // the same per-score rollup.
    Q(
      "eval_pr_curve",
      (s, d) =>
        EvalOps.prCurve(scored(s, d), "is_en", "score")
          .orderBy("threshold"),
      Some(s"""WITH $scoredCte,
              |per AS (SELECT score AS threshold,
              |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS p,
              |    CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS ng
              |  FROM s GROUP BY score),
              |c AS (SELECT threshold,
              |    CAST(SUM(p) OVER w AS BIGINT) AS tp,
              |    CAST(SUM(ng) OVER w AS BIGINT) AS fp,
              |    CAST((SELECT sum(p) FROM per) AS BIGINT) AS ptot
              |  FROM per
              |  WINDOW w AS (ORDER BY threshold DESC
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              |SELECT threshold, tp, fp, ptot - tp AS fn,
              |  CAST(tp AS DOUBLE) / (tp + fp) AS precision,
              |  CAST(tp AS DOUBLE) / ptot AS recall
              |FROM c ORDER BY threshold""".stripMargin),
      "precision/recall curve: exact cumulative confusion counts per distinct threshold"),

    // Calibration table ([[EvalOps.calibrationBins]]): fixed-width score
    // bins (floor via double division — exact and floor-correct for
    // negative scores in both engines), integer counts and score mass.
    Q(
      "eval_calibration_bins",
      (s, d) =>
        EvalOps.calibrationBins(scored(s, d), "is_en", "score",
            binWidth = 8L)
          .orderBy("bin"),
      Some(s"""WITH $scoredCte
              |SELECT CAST(floor(score / 8.0) AS BIGINT) AS bin,
              |  CAST(count(*) AS BIGINT) AS n,
              |  CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_pos,
              |  CAST(sum(score) AS BIGINT) AS score_sum,
              |  CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE) /
              |    count(*) AS pos_rate,
              |  CAST(sum(score) AS DOUBLE) / count(*) AS mean_score
              |FROM s GROUP BY 1 ORDER BY 1""".stripMargin),
      "calibration bins: positive rate vs mean score per fixed-width score bin")
  )
}
