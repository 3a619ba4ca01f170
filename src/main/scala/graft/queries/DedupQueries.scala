package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, T}
import graft.ops.DedupOps

/** Deduplication battery over `documents` / `embeddings`: exact,
  * n-gram Jaccard, MinHash-LSH, SimHash, embedding-cosine. */
object DedupQueries {

  /** Shared DuckDB CTEs for distinct 3-token shingles + exact Jaccard
    * pairs — the ground truth both the exact and the LSH variants are
    * checked against. `cap` replicates `maxShingleFreq`: shingles present
    * in more than `cap` documents are dropped before sizes/intersections,
    * exactly as the Spark-side left-anti filter does. */
  private[queries] def jaccardPairCtes(
      threshold: Double, cap: Option[Int] = None,
      pairPred: String = "a.doc_id < b.doc_id"): String = {
    val capCtes = cap.fold("") { c =>
      s"""kept AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= $c),
         |shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN kept USING (shingle)),
         |""".stripMargin
    }
    val shTable = if (cap.isDefined) "shc" else "sh"
    s"""toks AS (SELECT doc_id, string_split_regex(text, ' +') AS t FROM documents),
       |sh AS (SELECT DISTINCT doc_id, shingle FROM (
       |  SELECT doc_id, unnest(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       |    ELSE list_transform(generate_series(1, len(t)-2),
       |                        i -> array_to_string(t[i:i+2], ' ')) END) AS shingle
       |  FROM toks)),
       |${capCtes}sizes AS (SELECT doc_id, count(*) AS n FROM $shTable GROUP BY 1),
       |common AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS c
       |  FROM $shTable a JOIN $shTable b ON a.shingle = b.shingle AND $pairPred
       |  GROUP BY 1, 2),
       |pairs AS (SELECT a, b, c * 1.0 / (sa.n + sb.n - c) AS jaccard
       |  FROM common
       |  JOIN sizes sa ON sa.doc_id = a
       |  JOIN sizes sb ON sb.doc_id = b
       |  WHERE c * 1.0 / (sa.n + sb.n - c) >= $threshold)""".stripMargin
  }

  private def jaccardSql(threshold: Double, cap: Option[Int] = None): String =
    s"""WITH ${jaccardPairCtes(threshold, cap)}
       |SELECT a, b, jaccard FROM pairs ORDER BY a, b""".stripMargin

  /** DuckDB replica of the banded sign-sketch near-dup gate: recompute
    * every sketch bit with `list_dot_product` (bit-identical to the
    * engine's sequential fold), band 8x8, join on shared bands, verify
    * candidates with exact cosine — the *operator* is oracled, not just
    * its output's intersection with the exhaustive baseline. */
  private def bandedCosineSql(threshold: Double): String =
    s"""WITH ${SketchOracle.bandsCtes},
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bh = y.bh AND x.vec_id < y.vec_id),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
       |SELECT c.a, c.b,
       |  list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) AS cosine
       |FROM cand c
       |JOIN n na ON na.vec_id = c.a
       |JOIN n nb ON nb.vec_id = c.b
       |WHERE list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) >= $threshold
       |ORDER BY a, b""".stripMargin

  val all: Seq[Q] = Seq(
    Q(
      "dedup_exact",
      (s, d) =>
        DedupOps
          .exactDedup(T(s, d, "documents"), "doc_id", Seq(col("text")))
          .select("doc_id", "n_dupes")
          .orderBy("doc_id"),
      Some("""SELECT min(doc_id) AS doc_id, count(*) AS n_dupes
             |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin),
      "exact dedupe: canonical min-id representative per identical text"),

    Q(
      "dedup_ngram_jaccard",
      (s, d) =>
        DedupOps
          .ngramJaccardPairs(T(s, d, "documents"), "doc_id", "text",
            k = 3, threshold = 0.8, reuseShingles = true)
          .orderBy("a", "b"),
      Some(jaccardSql(0.8)),
      "exact 3-gram Jaccard near-dup pairs (>= 0.8)"),

    // DIRECTIONAL containment C(src→dst) = |∩|/|S_src|
    // ([[DedupOps.containmentPairs]]): the subset/quote detector Jaccard
    // cannot express (a short doc inside a long one scores ~0 Jaccard,
    // 1.0 containment). One a<b intersection join on the SAME staged
    // shingle frame the Jaccard gates read; each candidate unfolds into
    // its two directional rows after the join.
    Q(
      "dedup_containment",
      (s, d) =>
        DedupOps.containmentPairs(T(s, d, "documents"), "doc_id", "text",
            k = 3, minContainment = 0.7)
          .orderBy("src", "dst"),
      Some(s"""WITH ${jaccardPairCtes(0.0)},
              |dir AS (
              |  SELECT a AS src, b AS dst, c, sa.n AS n_src
              |  FROM common JOIN sizes sa ON sa.doc_id = a
              |  UNION ALL
              |  SELECT b, a, c, sb.n
              |  FROM common JOIN sizes sb ON sb.doc_id = b)
              |SELECT src, dst, c, n_src,
              |  CAST(c AS DOUBLE) / CAST(n_src AS DOUBLE) AS containment
              |FROM dir
              |WHERE CAST(c AS DOUBLE) / CAST(n_src AS DOUBLE) >= 0.7
              |ORDER BY src, dst""".stripMargin),
      "directional n-gram containment pairs (>= 0.7): the quote/subset detector"),

    // Pair EVIDENCE ([[DedupOps.pairEvidence]]): the ≤3 lexicographically
    // smallest shared shingles per near-dup pair — what a review queue
    // displays next to the Jaccard score before a human confirms a drop.
    // The shared-shingle join is bounded by the pair list (never a
    // shingle-universe self-join); WindowGroupLimit caps the per-pair
    // sort. Reads the STAGED shingle and pair frames other gates share.
    // The evidence array crosses the gate as a joined string (the
    // repo-wide array-output convention: the external comparator cannot
    // sort raw array cells).
    Q(
      "dedup_pair_evidence",
      (s, d) =>
        DedupOps.pairEvidence(
            T(s, d, "documents"), "doc_id", "text",
            DedupOps.sharedNgramJaccardPairs(T(s, d, "documents"),
              "doc_id", "text", k = 3, threshold = 0.8),
            k = 3, topK = 3)
          .withColumn("evidence", array_join(col("evidence"), "|"))
          .orderBy("a", "b"),
      Some(s"""WITH ${jaccardPairCtes(0.8)},
              |shared AS (SELECT p.a, p.b, x.shingle
              |  FROM pairs p JOIN sh x ON x.doc_id = p.a
              |  JOIN sh y ON y.doc_id = p.b AND y.shingle = x.shingle),
              |r AS (SELECT a, b, shingle,
              |    ROW_NUMBER() OVER (PARTITION BY a, b ORDER BY shingle) AS rn
              |  FROM shared)
              |SELECT a, b, CAST(count(*) AS BIGINT) AS n_shared,
              |  array_to_string(
              |    list(shingle ORDER BY shingle) FILTER (WHERE rn <= 3), '|')
              |    AS evidence
              |FROM r GROUP BY a, b ORDER BY a, b""".stripMargin),
      "near-dup pair evidence: top-3 shared shingles per pair, pair-list-bounded join"),

    // Cross-source duplication matrix ([[DedupOps.crossSourceDupMatrix]]):
    // near-dup pair counts per unordered source pair off the STAGED pair
    // frame — which sources mirror each other vs re-crawl themselves.
    Q(
      "dedup_cross_source_matrix",
      (s, d) =>
        DedupOps.crossSourceDupMatrix(
            T(s, d, "documents"), "doc_id", "source",
            DedupOps.sharedNgramJaccardPairs(T(s, d, "documents"),
              "doc_id", "text", k = 3, threshold = 0.8))
          .orderBy("source_x", "source_y"),
      Some(s"""WITH ${jaccardPairCtes(0.8)},
              |ends AS (SELECT
              |    least(da.source, db.source) AS source_x,
              |    greatest(da.source, db.source) AS source_y
              |  FROM pairs p
              |  JOIN documents da ON da.doc_id = p.a
              |  JOIN documents db ON db.doc_id = p.b)
              |SELECT source_x, source_y,
              |  CAST(count(*) AS BIGINT) AS n_pairs
              |FROM ends GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      "cross-source duplication matrix: near-dup pair counts per unordered source pair"),

    // Threshold TUNING CURVE ([[DedupOps.thresholdSweep]]): pair and
    // affected-document counts per Jaccard band over [0.5, 1] from ONE
    // pair computation at the floor — the curve a curation team reads
    // before choosing the dedup threshold (its knee is the decision),
    // never one join per candidate threshold. Exact j = 1.0 folds into
    // the top band. On THIS corpus the curve is a single occupied band
    // (planted near-dups sit at j >= 0.9 and nothing else reaches 0.2 —
    // probed in DuckDB down to floor 0.2), so the gate hash-checks the
    // banding machinery; band spread is corpus-driven.
    Q(
      "dedup_threshold_sweep",
      (s, d) =>
        DedupOps.thresholdSweep(T(s, d, "documents"), "doc_id", "text",
            k = 3, minJaccard = 0.5)
          .orderBy("band_lo"),
      Some(s"""WITH ${jaccardPairCtes(0.5)},
              |bands AS (SELECT
              |    CAST(least(floor(jaccard * 10), 9) AS DOUBLE) / 10.0
              |      AS band_lo,
              |    a AS da, b AS db
              |  FROM pairs),
              |np AS (SELECT band_lo, CAST(count(*) AS BIGINT) AS n_pairs
              |  FROM bands GROUP BY band_lo),
              |nd AS (SELECT band_lo,
              |    CAST(count(DISTINCT d) AS BIGINT) AS n_docs
              |  FROM (SELECT band_lo, da AS d FROM bands
              |        UNION ALL SELECT band_lo, db AS d FROM bands) u
              |  GROUP BY band_lo)
              |SELECT band_lo, n_pairs, n_docs
              |FROM np JOIN nd USING (band_lo)
              |ORDER BY band_lo""".stripMargin),
      "dedup threshold tuning curve: pair/doc counts per Jaccard band, one pair pass"),

    // PPJoin prefix filter: candidates only from each doc's
    // n - ceil(t*n) + 1 globally-rarest shingles, verified by exact
    // per-candidate intersection. The filter is LOSSLESS, so the oracle
    // is the plain exact-join SQL — this gate hash-passes iff the
    // prefix-filter theorem actually holds in the implementation.
    Q(
      "dedup_prefix_filter",
      (s, d) =>
        DedupOps
          .prefixFilterJaccardPairs(T(s, d, "documents"), "doc_id", "text",
            k = 3, threshold = 0.8, reuseShingles = true)
          .orderBy("a", "b"),
      Some(jaccardSql(0.8)),
      "PPJoin prefix-filtered exact Jaccard: prefix-sized join, " +
        "exact-join results — oracled against the exact join itself"),

    // Production-path variant: shingles present in more than `cap` docs
    // are dropped before the self-join. At 100 TB this is what bounds the
    // join: a stop-shingle in 10^6 docs otherwise contributes 10^12
    // pairs. The oracle applies the identical frequency filter in SQL.
    Q(
      "dedup_ngram_jaccard_capped",
      (s, d) =>
        DedupOps
          .ngramJaccardPairs(T(s, d, "documents"), "doc_id", "text",
            k = 3, threshold = 0.8, maxShingleFreq = Some(4),
            reuseShingles = true)
          .orderBy("a", "b"),
      Some(jaccardSql(0.8, cap = Some(4))),
      "capped 3-gram Jaccard (df<=4 shingles only): the bounded-join scale path"),

    // Incremental dedup: the delta (odd doc_ids) checked against the
    // existing corpus (even doc_ids) — delta-proportional work, never
    // base×base. The oracle is the same shingle/cap/Jaccard SQL with the
    // pair predicate swapped from a<b to base-side × delta-side.
    Q(
      "dedup_incremental_delta",
      (s, d) => {
        // base and delta PARTITION the corpus by id parity, so both
        // sides slice the ONE staged CAPPED shingle index ([[DedupOps
        // .sharedCappedShingles]] — the combined-side df census this
        // operator specifies equals the whole-corpus census when the
        // sides partition it) instead of re-tokenizing half the corpus
        // and re-running the census each — the warehouse shape
        // (materialized index + delta filter), keeping this gate's
        // cost join-side rather than scan-side in the suite
        val sh = DedupOps.sharedCappedShingles(T(s, d, "documents"),
          "doc_id", "text", k = 3, cap = 4)
        DedupOps
          .ngramJaccardPairsBetweenShingled(
            sh.filter(pmod(col("doc_id"), lit(2)) === 0),
            sh.filter(pmod(col("doc_id"), lit(2)) === 1),
            "doc_id", threshold = 0.8)
          .orderBy("a", "b")
      },
      Some {
        s"""WITH ${jaccardPairCtes(0.8, cap = Some(4),
             pairPred = "a.doc_id % 2 = 0 AND b.doc_id % 2 = 1")}
           |SELECT a, b, jaccard FROM pairs ORDER BY a, b""".stripMargin
      },
      "incremental delta-vs-corpus near-dup (delta-proportional, capped)"),

    // MinHash-LSH: candidates from banded minhash signatures, verified
    // against true Jaccard. On this corpus LSH recall is exhaustive (the
    // planted near-dups sit at j~0.98 where 4-band/4-row miss probability
    // is ~4e-5 and the hash is a fixed deterministic function), so the
    // exact-Jaccard oracle applies verbatim — asserted, not assumed, by
    // tools/check.py and DedupSimilaritySpec.
    Q(
      "dedup_minhash_lsh",
      (s, d) =>
        DedupOps
          .minhashLshPairs(T(s, d, "documents"), "doc_id", "text",
            k = 3, threshold = 0.8, reuseShingles = true)
          .orderBy("a", "b"),
      Some(jaccardSql(0.8)),
      "MinHash-LSH near-dup: banded candidates + exact-Jaccard verify"),

    // The oracle replicates the engine's own FNV-1a+splitmix64 token hash
    // in SQL (constants emitted from graft.expr.Hash64 — the same pattern
    // dedup_embedding_lsh uses for its sign matrix) and selects all pairs
    // with Hamming <= 3, which the 4x16 banding provably also selects
    // (pigeonhole: <= 3 differing bits leave one band identical).
    Q(
      "dedup_simhash",
      (s, d) =>
        DedupOps
          .simhashPairs(T(s, d, "documents"), "doc_id", "text", maxHamming = 3)
          .orderBy("a", "b"),
      Some(Hash64Oracle.simhashPairsSql(maxHamming = 3)),
      "SimHash near-dup pairs (Hamming <= 3, 4x16 banding; native hash)"),

    // MOSS-style winnowing dedup: byte-k-gram fingerprint sets from the
    // native one-pass WinnowSet, df-capped, pairs sharing >= minShared.
    // Oracle: the same staged SQL replica of the engine hash that backs
    // text_winnow_native, extended with the cap + pair join.
    Q(
      "dedup_winnow",
      (s, d) =>
        DedupOps
          .winnowPairs(T(s, d, "documents"), "doc_id", "text",
            k = 8, w = 4, minShared = 3, maxFpFreq = Some(8))
          .orderBy("a", "b"),
      Some(Hash64Oracle.winnowPairsSql(k = 8, w = 4, minShared = 3, cap = 8)),
      "winnowing-fingerprint near-dup pairs (byte k-grams, df-capped, native)"),

    Q(
      "dedup_embedding_cosine",
      (s, d) =>
        DedupOps
          .embeddingNearDupPairs(T(s, d, "embeddings"), "vec_id", "embedding",
            threshold = 0.45)
          .orderBy("a", "b"),
      Some("""SELECT a.vec_id AS a, b.vec_id AS b,
             |  list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             |  (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
             |   sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cosine
             |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             |WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             |  (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
             |   sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.45
             |ORDER BY a, b""".stripMargin),
      "embedding-cosine near-dup pairs (exact baseline)"),

    // The 100 TB path for embedding near-dup: linear banded candidates +
    // exact-cosine verify, vectors re-joined only after the id-level
    // distinct. The oracle replicates the banding itself (sign matrix
    // emitted from the engine's own hash), so the gate is exact even
    // though LSH recall vs the exhaustive baseline is probabilistic —
    // recall is asserted separately in DedupSimilaritySpec.
    Q(
      "dedup_embedding_lsh",
      (s, d) =>
        graft.ops.SimilarityOps
          .bandedCosineNearDup(T(s, d, "embeddings"), "vec_id", "embedding",
            threshold = 0.45)
          .orderBy("a", "b"),
      Some(bandedCosineSql(0.45)),
      "bucketed embedding near-dup: sketch-band candidates + exact-cosine verify"),

    // SemDeDup (Abbas et al. 2023): embedding dedup with the all-pairs
    // cosine confined WITHIN coarse clusters — the equi-join on centroid
    // id bounds the pair cost at ~n²/nlist (shuffle-parallel per
    // cluster) instead of a global n² cross join. Deterministic
    // first-ids centroids make the whole operator oracle-replayable;
    // keep/drop policy: the lower id of every qualifying pair survives.
    // `kept` crosses the gate as 0/1 (comparator-stable like every
    // boolean gate column).
    Q(
      "dedup_semdedup",
      (s, d) =>
        graft.ops.SimilarityOps
          .semDedup(T(s, d, "embeddings"), "vec_id", "embedding",
            nlist = 16, threshold = 0.45)
          .withColumn("kept", col("kept").cast("int"))
          .orderBy("id"),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
             |cent AS (SELECT vec_id AS cid, v AS centv, nrm AS centn
             |         FROM n WHERE vec_id < 16),
             |asg AS (SELECT id, cid, v, nrm FROM (
             |  SELECT c.vec_id AS id, cent.cid, c.v, c.nrm,
             |    ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
             |      list_dot_product(c.v, cent.centv) / (c.nrm * cent.centn) DESC,
             |      cent.cid ASC) AS r
             |  FROM n c CROSS JOIN cent) t WHERE r = 1),
             |dropped AS (SELECT DISTINCT y.id FROM asg x JOIN asg y
             |  ON x.cid = y.cid AND x.id < y.id
             |  WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= 0.45)
             |SELECT a.id, a.cid,
             |  CAST(CASE WHEN d.id IS NULL THEN 1 ELSE 0 END AS INTEGER) AS kept
             |FROM asg a LEFT JOIN dropped d ON d.id = a.id
             |ORDER BY a.id""".stripMargin),
      "SemDeDup: within-cluster cosine dedup, cluster-bounded pair join"),

    // Per-ingest SemDeDup ([[SimilarityOps.semDedupBetween]]): the delta
    // (odd vec_ids) assigned to the EXISTING base codebook (the
    // deterministic first-ids slice of the even side — at scale the
    // materialized quantizer artifact), cross-side within-cluster cosine
    // pairs only — delta-proportional, never corpus × corpus. The
    // semantic tier's dedup_incremental_delta: an ingest loop that
    // embeds its delta must not re-cluster the corpus. The oracle
    // replays assignment (same cosine-argmax + cid tie-break) and the
    // cross-side pair join verbatim.
    Q(
      "dedup_semdedup_incremental",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        val base = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
        val delta = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
        graft.ops.SimilarityOps
          .semDedupBetween(base, delta, "vec_id", "embedding",
            graft.ops.SimilarityOps
              .firstIdsCodebook(base, "vec_id", "embedding", idBound = 32),
            threshold = 0.45)
          .withColumn("kept", col("kept").cast("int"))
          .orderBy("id")
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
             |cent AS (SELECT vec_id AS cid, v AS centv, nrm AS centn
             |         FROM n WHERE vec_id % 2 = 0 AND vec_id < 32),
             |basg AS (SELECT id, cid, v, nrm FROM (
             |  SELECT c.vec_id AS id, cent.cid, c.v, c.nrm,
             |    ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
             |      list_dot_product(c.v, cent.centv) / (c.nrm * cent.centn) DESC,
             |      cent.cid ASC) AS r
             |  FROM n c CROSS JOIN cent WHERE c.vec_id % 2 = 0) t WHERE r = 1),
             |dasg AS (SELECT id, cid, v, nrm FROM (
             |  SELECT c.vec_id AS id, cent.cid, c.v, c.nrm,
             |    ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
             |      list_dot_product(c.v, cent.centv) / (c.nrm * cent.centn) DESC,
             |      cent.cid ASC) AS r
             |  FROM n c CROSS JOIN cent WHERE c.vec_id % 2 = 1) t WHERE r = 1),
             |dropped AS (SELECT DISTINCT d.id FROM basg b JOIN dasg d USING (cid)
             |  WHERE list_dot_product(b.v, d.v) / (b.nrm * d.nrm) >= 0.45)
             |SELECT a.id, a.cid,
             |  CAST(CASE WHEN dr.id IS NULL THEN 1 ELSE 0 END AS INTEGER) AS kept
             |FROM dasg a LEFT JOIN dropped dr ON dr.id = a.id
             |ORDER BY a.id""".stripMargin),
      "per-ingest SemDeDup: delta assigned to the existing codebook, cross-side pairs only"),

    // Exact-substring tier (Lee et al. 2021): maximal shared token spans
    // ≥ 8 across document pairs, via positional 4-gram anchors matched on
    // one equi-join and merged per (pair, diagonal) with a gaps-and-
    // islands window ([[graft.ops.DedupOps.substringSpanPairs]]). Catches
    // the verbatim-paragraph-in-a-different-document case Jaccard misses.
    // Hot grams (boilerplate, > 8 docs) are capped out before the join —
    // the same discipline that bounds every shingle join here.
    Q(
      "dedup_substring_spans",
      (s, d) =>
        DedupOps
          .substringSpanPairs(T(s, d, "documents"), "doc_id", "text",
            k = 4, minLen = 8, maxGramFreq = Some(8))
          .orderBy("a", "b", "a_start", "b_start"),
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(trim(text), ' +') AS t
             |  FROM documents),
             |g0 AS (SELECT doc_id,
             |    unnest(list_transform(generate_series(1, len(t) - 3),
             |      i -> {'pos': i, 'gram': array_to_string(t[i:i+3], ' ')})) AS pg
             |  FROM toks WHERE len(t) >= 4),
             |g AS (SELECT doc_id, pg.pos AS pos, pg.gram AS gram FROM g0),
             |kept AS (SELECT gram FROM g GROUP BY gram
             |         HAVING count(DISTINCT doc_id) <= 8),
             |gk AS (SELECT g.* FROM g JOIN kept USING (gram)),
             |m AS (SELECT x.doc_id AS a, y.doc_id AS b, x.pos AS pa,
             |        x.pos - y.pos AS diag
             |      FROM gk x JOIN gk y ON x.gram = y.gram
             |        AND x.doc_id < y.doc_id),
             |i0 AS (SELECT a, b, diag, pa,
             |    CASE WHEN lag(pa) OVER w IS NULL
             |           OR pa - lag(pa) OVER w > 1 THEN 1 ELSE 0 END AS nw
             |  FROM m WINDOW w AS (PARTITION BY a, b, diag ORDER BY pa)),
             |i1 AS (SELECT a, b, diag, pa,
             |    SUM(nw) OVER (PARTITION BY a, b, diag ORDER BY pa
             |                  ROWS UNBOUNDED PRECEDING) AS isl
             |  FROM i0),
             |spans AS (SELECT a, b, min(pa) AS a_start,
             |    min(pa) - diag AS b_start,
             |    CAST(count(*) + 3 AS BIGINT) AS span_len
             |  FROM i1 GROUP BY a, b, diag, isl)
             |SELECT a, b, a_start, b_start, span_len FROM spans
             |WHERE span_len >= 8
             |ORDER BY a, b, a_start, b_start""".stripMargin),
      "maximal shared token spans (exact-substring dedup tier): gram anchors + diagonal islands"),

    // Corpus health report — the one-row dashboard a curation pipeline
    // publishes per snapshot: corpus size, exact-duplicate rate, near-dup
    // pair count and the fraction of documents entangled in a near-dup
    // cluster. Every input is a STAGED frame other gates already consume
    // (shared pair graph + shared component labels), so the report costs
    // three scalar rollups, not a recomputation of the dedup stack.
    Q(
      "corpus_health_report",
      (s, d) => {
        val docs = T(s, d, "documents")
        val nDocs = docs.agg(count(lit(1)).as("n_docs"))
        val exactDup = docs.groupBy("text").agg(count(lit(1)).as("c"))
          .agg(sum(when(col("c") > 1, col("c")).otherwise(0L))
            .as("n_exact_dup_docs"))
        val pairs = DedupOps.sharedNgramJaccardPairs(docs, "doc_id", "text",
          k = 3, threshold = 0.8)
        val nPairs = pairs.agg(count(lit(1)).as("n_near_pairs"))
        val clustered = graft.ops.GraphOps.sharedComponents(pairs, "a", "b")
          .agg(count(lit(1)).as("n_docs_in_clusters"))
        nDocs.crossJoin(exactDup).crossJoin(nPairs).crossJoin(clustered)
          .select(col("n_docs"), col("n_exact_dup_docs"),
            col("n_near_pairs"), col("n_docs_in_clusters"),
            (col("n_exact_dup_docs").cast("double") / col("n_docs"))
              .as("exact_dup_rate"),
            (col("n_docs_in_clusters").cast("double") / col("n_docs"))
              .as("near_dup_rate"))
      },
      Some(s"""WITH RECURSIVE ${jaccardPairCtes(0.8)},
              |edges AS (SELECT a AS u, b AS v FROM pairs
              |  UNION SELECT b AS u, a AS v FROM pairs),
              |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
              |ed AS (SELECT CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
              |         AS n_exact_dup_docs
              |       FROM (SELECT count(*) AS c FROM documents GROUP BY text)),
              |np AS (SELECT CAST(count(*) AS BIGINT) AS n_near_pairs FROM pairs),
              |nc AS (SELECT CAST(count(DISTINCT u) AS BIGINT)
              |         AS n_docs_in_clusters FROM edges)
              |SELECT n_docs, n_exact_dup_docs, n_near_pairs, n_docs_in_clusters,
              |  CAST(n_exact_dup_docs AS DOUBLE) / n_docs AS exact_dup_rate,
              |  CAST(n_docs_in_clusters AS DOUBLE) / n_docs AS near_dup_rate
              |FROM nd, ed, np, nc""".stripMargin),
      "one-row corpus health dashboard from the staged dedup frames: dup rates + cluster entanglement"),

    // Weighted (bag/multiset) Jaccard: the order-free complement of the
    // shingle tier — reordered text scores 1 (k-gram Jaccard ≈ 0),
    // doubled text drops to ≈ 1/2. Candidates from rare shared tokens
    // (df ≤ 32, the capped discipline — token df runs far above shingle
    // df, so the cap sits higher than the 3-gram gates'); Σ min runs
    // pair-bounded.
    Q(
      "dedup_bag_jaccard",
      (s, d) =>
        DedupOps
          .bagJaccardPairs(T(s, d, "documents"), "doc_id", "text",
            threshold = 0.5, maxTokenFreq = 32)
          .orderBy("a", "b"),
      Some("""WITH tc AS (
             |  SELECT doc_id, tok, count(*) AS c FROM (
             |    SELECT doc_id, unnest(string_split_regex(text, ' +')) AS tok
             |    FROM documents)
             |  GROUP BY doc_id, tok),
             |sizes AS (SELECT doc_id, sum(c) AS n FROM tc GROUP BY doc_id),
             |rare AS (SELECT tok FROM tc GROUP BY tok HAVING count(*) <= 32),
             |rtc AS (SELECT tc.doc_id, tc.tok FROM tc JOIN rare USING (tok)),
             |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
             |         FROM rtc x JOIN rtc y
             |           ON x.tok = y.tok AND x.doc_id < y.doc_id),
             |inter AS (
             |  SELECT cand.a, cand.b, sum(least(ta.c, tb.c)) AS inter
             |  FROM cand
             |  JOIN tc ta ON ta.doc_id = cand.a
             |  JOIN tc tb ON tb.doc_id = cand.b AND tb.tok = ta.tok
             |  GROUP BY cand.a, cand.b)
             |SELECT i.a, i.b, CAST(i.inter AS BIGINT) AS inter,
             |  CAST(sa.n AS BIGINT) AS na, CAST(sb.n AS BIGINT) AS nb,
             |  CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) AS bag_jaccard
             |FROM inter i JOIN sizes sa ON sa.doc_id = i.a
             |             JOIN sizes sb ON sb.doc_id = i.b
             |WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5
             |ORDER BY a, b""".stripMargin),
      "weighted (bag) Jaccard pairs: rare-token candidates, pair-bounded exact Σ min")
  )
}
