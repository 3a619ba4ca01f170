package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, T}
import graft.ops.SimilarityOps

/** Approximate-nearest-neighbor search over `embeddings.embedding`. */
object SimilarityQueries {

  val all: Seq[Q] = Seq(
    Q(
      "sim_topk_bruteforce",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        SimilarityOps
          .bruteForceTopK(
            emb.filter(col("vec_id") < 5), emb,
            "vec_id", "embedding", k = 10)
          .orderBy("qid", "rank")
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
             |scored AS (
             |  SELECT q.vec_id AS qid, c.vec_id AS nid,
             |         list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cosine
             |  FROM n q JOIN n c ON q.vec_id < 5 AND q.vec_id <> c.vec_id)
             |SELECT qid, rank, nid, cosine FROM (
             |  SELECT qid, nid, cosine, ROW_NUMBER() OVER (
             |    PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
             |  FROM scored) WHERE rank <= 10
             |ORDER BY qid, rank""".stripMargin),
      "exact cosine top-10 per query vector (brute-force baseline)"),

    Q(
      "sim_topk_lsh",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        SimilarityOps
          .lshTopK(
            emb.filter(col("vec_id") < 5), emb,
            "vec_id", "embedding", k = 10)
          .orderBy("qid", "rank")
      },
      None,
      "LSH-bucketed cosine top-10 (sign-sketch bands + exact re-rank; " +
        "recall vs brute force asserted in DedupSimilaritySpec)")
  )
}
