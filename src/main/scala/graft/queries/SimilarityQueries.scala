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
      // The oracle replicates the banded candidate generation itself (see
      // SketchOracle) and re-ranks candidates exactly — upgraded from the
      // round-1 rows-only check.
      Some(s"""WITH ${SketchOracle.bandsCtes},
              |cand AS (
              |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
              |  FROM bands q JOIN bands c
              |    ON q.band = c.band AND q.bh = c.bh
              |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
              |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
              |scored AS (
              |  SELECT cand.qid, cand.nid,
              |    list_dot_product(nq.v, nc.v) / (nq.nrm * nc.nrm) AS cosine
              |  FROM cand
              |  JOIN n nq ON nq.vec_id = cand.qid
              |  JOIN n nc ON nc.vec_id = cand.nid)
              |SELECT qid, rank, nid, cosine FROM (
              |  SELECT qid, nid, cosine, ROW_NUMBER() OVER (
              |    PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
              |  FROM scored) t WHERE rank <= 10
              |ORDER BY qid, rank""".stripMargin),
      "LSH-bucketed cosine top-10 (sign-sketch bands + exact re-rank; " +
        "oracle replicates the banding; recall vs brute force in DedupSimilaritySpec)"),

    // IVF ANN: inverted lists under a deterministic coarse quantizer (the
    // first nlist corpus vectors serve as centroids), nprobe=4 of 16
    // lists probed per query, exact re-rank. The oracle replicates the
    // assignment, the probes, and the re-rank — the whole operator.
    Q(
      "sim_topk_ivf",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        SimilarityOps
          .ivfTopK(
            emb.filter(col("vec_id") < 5), emb,
            "vec_id", "embedding", k = 10, nlist = 16, nprobe = 4)
          .orderBy("qid", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
             |cent AS (SELECT vec_id AS cid, v AS centv, nrm AS centn FROM n WHERE vec_id < 16),
             |lists AS (
             |  SELECT nid, cid FROM (
             |    SELECT c.vec_id AS nid, cent.cid,
             |      ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
             |        list_dot_product(c.v, cent.centv) / (c.nrm * cent.centn) DESC,
             |        cent.cid ASC) AS r
             |    FROM n c CROSS JOIN cent) t WHERE r = 1),
             |probes AS (
             |  SELECT qid, cid FROM (
             |    SELECT q.vec_id AS qid, cent.cid,
             |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
             |        list_dot_product(q.v, cent.centv) / (q.nrm * cent.centn) DESC,
             |        cent.cid ASC) AS r
             |    FROM n q CROSS JOIN cent WHERE q.vec_id < 5) t WHERE r <= 4),
             |scored AS (
             |  SELECT p.qid, l.nid,
             |    list_dot_product(nq.v, nc.v) / (nq.nrm * nc.nrm) AS cosine
             |  FROM probes p JOIN lists l ON p.cid = l.cid
             |  JOIN n nq ON nq.vec_id = p.qid
             |  JOIN n nc ON nc.vec_id = l.nid
             |  WHERE p.qid <> l.nid)
             |SELECT qid, rank, nid, cosine FROM (
             |  SELECT qid, nid, cosine, ROW_NUMBER() OVER (
             |    PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
             |  FROM scored) t WHERE rank <= 10
             |ORDER BY qid, rank""".stripMargin),
      "IVF-bucketed cosine top-10 (inverted lists + probe + exact re-rank; " +
        "oracle replicates assignment and probing)")
  )
}
