package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, T}
import graft.ops.DedupOps

/** Deduplication battery over `documents` / `embeddings`: exact,
  * n-gram Jaccard, MinHash-LSH, SimHash, embedding-cosine. */
object DedupQueries {

  /** Shared DuckDB CTEs for distinct 3-token shingles + exact Jaccard
    * pairs — the ground truth both the exact and the LSH variants are
    * checked against. */
  private def jaccardSql(threshold: Double): String =
    s"""WITH toks AS (SELECT doc_id, string_split_regex(text, ' +') AS t FROM documents),
       |sh AS (SELECT DISTINCT doc_id, shingle FROM (
       |  SELECT doc_id, unnest(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       |    ELSE list_transform(generate_series(1, len(t)-2),
       |                        i -> array_to_string(t[i:i+2], ' ')) END) AS shingle
       |  FROM toks)),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |common AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS c
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT a, b, c * 1.0 / (sa.n + sb.n - c) AS jaccard
       |FROM common
       |JOIN sizes sa ON sa.doc_id = a
       |JOIN sizes sb ON sb.doc_id = b
       |WHERE c * 1.0 / (sa.n + sb.n - c) >= $threshold
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
            k = 3, threshold = 0.8)
          .orderBy("a", "b"),
      Some(jaccardSql(0.8)),
      "exact 3-gram Jaccard near-dup pairs (>= 0.8)"),

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
            k = 3, threshold = 0.8)
          .orderBy("a", "b"),
      Some(jaccardSql(0.8)),
      "MinHash-LSH near-dup: banded candidates + exact-Jaccard verify"),

    Q(
      "dedup_simhash",
      (s, d) =>
        DedupOps
          .simhashPairs(T(s, d, "documents"), "doc_id", "text", maxHamming = 3)
          .orderBy("a", "b"),
      None,
      "SimHash near-dup pairs (Hamming <= 3, 4x16 banding; native hash)"),

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
      "embedding-cosine near-dup pairs (exact baseline)")
  )
}
