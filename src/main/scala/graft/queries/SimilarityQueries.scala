package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, T}
import graft.ops.SimilarityOps

/** Approximate-nearest-neighbor search over `embeddings.embedding`. */
object SimilarityQueries {

  /** The PQ encode cascade shared by the sim_topk_ivfpq and
    * sim_pq_encode oracles: coarse assignment → residuals → subspace
    * slices → codebook → per-subspace argmin codes (`enc`). Mirrors
    * [[graft.ops.SimilarityOps]]' PqState step for step. */
  private val pqEncCtes: String =
    """e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      |cent AS (SELECT vec_id AS cid, v AS centv, nrm AS centn FROM n WHERE vec_id < 16),
      |lists AS (
      |  SELECT nid, cid, rv FROM (
      |    SELECT c.vec_id AS nid, cent.cid,
      |      list_transform(generate_series(1, len(c.v)),
      |                     i -> c.v[i] - cent.centv[i]) AS rv,
      |      ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
      |        list_dot_product(c.v, cent.centv) / (c.nrm * cent.centn) DESC,
      |        cent.cid ASC) AS r
      |    FROM n c CROSS JOIN cent) t WHERE r = 1),
      |js AS (SELECT unnest(generate_series(0, 3)) AS j),
      |sub AS (
      |  SELECT nid, cid, j,
      |    rv[j*(len(rv)//4)+1 : (j+1)*(len(rv)//4)] AS sv
      |  FROM lists CROSS JOIN js),
      |cb AS (SELECT j, nid AS code, sv AS cbv FROM sub WHERE nid < 16),
      |enc AS (
      |  SELECT nid, cid, j, code FROM (
      |    SELECT s.nid, s.cid, s.j, cb.code,
      |      ROW_NUMBER() OVER (PARTITION BY s.nid, s.j ORDER BY
      |        list_dot_product(s.sv, s.sv) + list_dot_product(cb.cbv, cb.cbv)
      |          - 2.0 * list_dot_product(s.sv, cb.cbv) ASC,
      |        cb.code ASC) AS r
      |    FROM sub s JOIN cb ON cb.j = s.j) t WHERE r = 1)""".stripMargin

  val all: Seq[Q] = Seq(
    // PQ STORAGE codes ([[SimilarityOps.pqEncode]]): what a 100 TB
    // vector store persists per embedding — the coarse list id + m
    // subspace codes — instead of dim raw doubles (128× smaller at
    // dim 64 / m 4). The oracle replays assignment, residuals, and the
    // per-subspace argmin, then pivots codes into subspace order.
    Q(
      "sim_pq_encode",
      (s, d) =>
        SimilarityOps
          .pqEncode(T(s, d, "embeddings"), "vec_id", "embedding",
            nlist = 16, m = 4, ksub = 16)
          // codes cross the gate stringified (repo-wide array-output
          // convention); the storage tier itself keeps the array form
          .withColumn("codes",
            array_join(col("codes").cast("array<string>"), ","))
          .orderBy("id"),
      Some(s"""WITH $pqEncCtes
              |SELECT nid AS id, max(cid) AS cid,
              |  array_to_string(
              |  [max(CASE WHEN j = 0 THEN code END),
              |   max(CASE WHEN j = 1 THEN code END),
              |   max(CASE WHEN j = 2 THEN code END),
              |   max(CASE WHEN j = 3 THEN code END)], ',') AS codes
              |FROM enc GROUP BY nid ORDER BY id""".stripMargin),
      "PQ storage encoding: coarse list id + m subspace codes per vector"),

    // INT8 scalar quantization ([[SimilarityOps.sq8Encode]]): one byte
    // per dimension against per-dimension corpus min/max — the
    // full-fidelity storage tier beside PQ's subspace codes. The oracle
    // replays the affine code arithmetic over the same exact min/max.
    Q(
      "sim_sq8_encode",
      (s, d) =>
        SimilarityOps.sq8Encode(T(s, d, "embeddings"), "vec_id", "embedding")
          // stringified gate surface; the storage tier keeps the array
          .withColumn("codes",
            array_join(col("codes").cast("array<string>"), ","))
          .orderBy("id"),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |x AS (SELECT vec_id, i - 1 AS d, v[i] AS x
             |      FROM e, unnest(generate_series(1, len(v))) AS u(i)),
             |st AS (SELECT d, min(x) AS mn, max(x) AS mx FROM x GROUP BY d)
             |SELECT vec_id AS id,
             |  array_to_string(
             |  list(CAST(CASE WHEN mx = mn THEN 0
             |       ELSE least(floor((x - mn) * 255.0 / (mx - mn)), 255)
             |       END AS INTEGER) ORDER BY d), ',') AS codes
             |FROM x JOIN st USING (d)
             |GROUP BY vec_id ORDER BY id""".stripMargin),
      "int8 scalar-quantized embedding codes: per-dim affine vs exact corpus min/max"),

    // Exact population covariance matrix of the embedding corpus
    // ([[SimilarityOps.embeddingCovariance]]): the d×d statistic under
    // whitening / Mahalanobis / PCA prep and per-ingest feature-drift
    // tracking. covar_pop would be a scan-order float accumulation;
    // quantized DECIMAL moments make each entry two IEEE divisions.
    // Upper triangle only (2080 rows at d = 64), corpus-independent
    // output size.
    Q(
      "sim_covariance",
      (s, d) =>
        SimilarityOps.sharedEmbeddingCovariance(T(s, d, "embeddings"), "vec_id",
            "embedding", scale = 1e6)
          .orderBy("i", "j"),
      Some("""WITH q AS (SELECT vec_id AS id, CAST(gi AS INTEGER) AS i,
             |    CAST(floor(CAST(embedding[gi + 1] AS DOUBLE) * 1000000.0)
             |      AS BIGINT) AS q
             |  FROM embeddings,
             |    unnest(generate_series(0, len(embedding) - 1)) AS u(gi)),
             |m AS (SELECT a.i AS i, b.i AS j, CAST(count(*) AS BIGINT) AS n,
             |    sum(CAST(a.q AS HUGEINT)) AS si,
             |    sum(CAST(b.q AS HUGEINT)) AS sj,
             |    sum(CAST(a.q AS HUGEINT) * CAST(b.q AS HUGEINT)) AS p
             |  FROM q a JOIN q b ON a.id = b.id AND a.i <= b.i
             |  GROUP BY 1, 2)
             |SELECT i, j, n,
             |  CAST(n * p - si * sj AS DOUBLE) /
             |    CAST(CAST(n AS HUGEINT) * n AS DOUBLE) /
             |    CAST(1000000000000 AS DOUBLE) AS cov
             |FROM m ORDER BY i, j""".stripMargin),
      "exact embedding covariance triangle: quantized DECIMAL moments, two IEEE divisions"),

    // Top principal component by fixed-round power iteration
    // ([[SimilarityOps.powerIterationPC]]): an iterative NUMERIC
    // fixpoint that hash-gates because every sum is order-pinned — the
    // covariance entries are engine-identical (their own gate), each
    // matrix·vector row folds in j order, the norm folds in i order.
    // Everything after the covariance rollup is 64-row; the oracle
    // unrolls the identical four rounds.
    Q(
      "sim_top_eigvec",
      (s, d) =>
        SimilarityOps.powerIterationPC(T(s, d, "embeddings"), "vec_id",
            "embedding", iters = 4, scale = 1e6)
          .orderBy("i"),
      Some {
        val rounds = (1 to 4).map { k =>
          val p = k - 1
          s"""w$k AS (SELECT f.i,
             |    list_reduce(list(f.cov * p.v ORDER BY f.j),
             |      (a, b) -> a + b) AS w
             |  FROM fullm f JOIN v$p p ON p.i = f.j GROUP BY f.i),
             |n$k AS (SELECT list_reduce(list(w * w ORDER BY i),
             |    (a, b) -> a + b) AS n2 FROM w$k),
             |v$k AS (SELECT i, CASE WHEN n2 > 0 THEN w / sqrt(n2) END AS v
             |  FROM w$k, n$k)""".stripMargin
        }.mkString(",\n")
        s"""WITH q AS (SELECT vec_id AS id, CAST(gi AS INTEGER) AS i,
           |    CAST(floor(CAST(embedding[gi + 1] AS DOUBLE) * 1000000.0)
           |      AS BIGINT) AS q
           |  FROM embeddings,
           |    unnest(generate_series(0, len(embedding) - 1)) AS u(gi)),
           |m AS (SELECT a.i AS i, b.i AS j, CAST(count(*) AS BIGINT) AS n,
           |    sum(CAST(a.q AS HUGEINT)) AS si,
           |    sum(CAST(b.q AS HUGEINT)) AS sj,
           |    sum(CAST(a.q AS HUGEINT) * CAST(b.q AS HUGEINT)) AS p
           |  FROM q a JOIN q b ON a.id = b.id AND a.i <= b.i
           |  GROUP BY 1, 2),
           |cov AS (SELECT i, j,
           |    CAST(n * p - si * sj AS DOUBLE) /
           |      CAST(CAST(n AS HUGEINT) * n AS DOUBLE) /
           |      CAST(1000000000000 AS DOUBLE) AS cov
           |  FROM m),
           |fullm AS (SELECT i, j, cov FROM cov
           |  UNION ALL SELECT j, i, cov FROM cov WHERE i <> j),
           |v0 AS (SELECT DISTINCT i, CAST(1.0 AS DOUBLE) AS v FROM fullm),
           |$rounds,
           |uf AS (SELECT f.i,
           |    list_reduce(list(f.cov * p.v ORDER BY f.j),
           |      (a, b) -> a + b) AS w
           |  FROM fullm f JOIN v4 p ON p.i = f.j GROUP BY f.i),
           |lam AS (SELECT list_reduce(list(v.v * uf.w ORDER BY v.i),
           |    (a, b) -> a + b) AS lambda
           |  FROM v4 v JOIN uf ON uf.i = v.i)
           |SELECT v.i, v.v, lam.lambda FROM v4 v, lam
           |ORDER BY v.i""".stripMargin
      },
      "top eigenvector by 4 pinned power-iteration rounds over the exact covariance"),
    // Per-label centroid of fixed-point-quantized embeddings — the
    // feature-aggregation shape under classifier quality filters, IVF
    // codebook seeding, and class prototypes. Kept EXACT the only way a
    // float centroid can be: each element quantizes to floor(x * 1000)
    // (float→double is exact, one IEEE multiply, one floor — all
    // deterministic), sums ride in BIGINT, and the mean is a single
    // long→double division. A raw double mean would be partition-order-
    // dependent and could never hash-gate. Long format (label, pos)
    // rather than arrays: element-wise aggregation is one keyed rollup
    // at any scale, and the output is labels × dims rows regardless of
    // corpus size.
    Q(
      "sim_centroid_per_label",
      (s, d) =>
        T(s, d, "embeddings")
          .select(col("label"), posexplode(col("embedding")))
          .select(col("label"), (col("pos") + 1).as("pos"),
            floor(col("col").cast("double") * lit(1000.0)).cast("long")
              .as("q"))
          .groupBy("label", "pos")
          .agg(count(lit(1)).as("n"), sum(col("q")).as("sum_q"))
          .withColumn("mean_q", col("sum_q").cast("double") / col("n"))
          .orderBy("label", "pos"),
      Some("""SELECT label, i AS pos, count(*) AS n,
             |  CAST(SUM(CAST(floor(e[i] * 1000.0) AS BIGINT)) AS BIGINT)
             |    AS sum_q,
             |  CAST(SUM(CAST(floor(e[i] * 1000.0) AS BIGINT)) AS DOUBLE)
             |    / count(*) AS mean_q
             |FROM (SELECT label, embedding::DOUBLE[] AS e FROM embeddings),
             |     generate_series(1, 64) AS t(i)
             |GROUP BY label, i ORDER BY label, pos""".stripMargin),
      "per-label centroid over fixed-point-quantized embeddings: exact " +
        "integer accumulation, one keyed rollup"),

    // kNN majority-vote classification: for each query vector, the top-5
    // exact-cosine neighbors vote with their labels; deterministic
    // tie-break (votes desc, label asc). The classifier-based quality-
    // filter shape (label a corpus by its nearest curated exemplars) —
    // composed from the brute-force baseline here so the GATE is exact;
    // the production candidate source is the banded/IVF path gated
    // separately. Declared all-pairs (PlanGuardSpec), like its base.
    Q(
      "sim_knn_classify",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val emb = T(s, d, "embeddings")
        val nbrs = SimilarityOps
          .bruteForceTopK(emb.filter(col("vec_id") < 50), emb,
            "vec_id", "embedding", k = 5)
        val w = Window.partitionBy("qid")
          .orderBy(col("votes").desc, col("label"))
        nbrs
          .join(emb.select(col("vec_id").as("nid"), col("label")), "nid")
          .groupBy("qid", "label")
          .agg(count(lit(1)).as("votes"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") === 1)
          .join(emb.select(col("vec_id").as("qid"),
            col("label").as("true_label")), "qid")
          .select(col("qid"), col("label").as("pred_label"),
            col("votes"), col("true_label"))
          .orderBy("qid")
      },
      Some("""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e
             |           FROM embeddings),
             |n AS (SELECT vec_id, label, e,
             |        sqrt(list_dot_product(e, e)) AS nrm FROM v),
             |scored AS (
             |  SELECT q.vec_id AS qid, c.vec_id AS nid, c.label,
             |         list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cosine
             |  FROM n q JOIN n c ON q.vec_id < 50 AND q.vec_id <> c.vec_id),
             |top AS (SELECT qid, nid, label FROM (
             |  SELECT qid, nid, label, ROW_NUMBER() OVER (
             |    PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
             |  FROM scored) WHERE rank <= 5),
             |votes AS (SELECT qid, label, count(*) AS votes
             |          FROM top GROUP BY 1, 2),
             |win AS (SELECT qid, label, votes FROM (
             |  SELECT qid, label, votes, ROW_NUMBER() OVER (
             |    PARTITION BY qid ORDER BY votes DESC, label ASC) AS rnk
             |  FROM votes) WHERE rnk = 1)
             |SELECT w.qid, w.label AS pred_label, w.votes,
             |  v.label AS true_label
             |FROM win w JOIN v ON v.vec_id = w.qid
             |ORDER BY w.qid""".stripMargin),
      "kNN majority-vote labels from exact top-5 neighbors, " +
        "deterministic tie-break"),

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
        "oracle replicates assignment and probing)"),

    // Recall@10 of the IVF index against the exact brute-force ground
    // truth — the index-quality measurement every ANN deployment runs
    // before trusting a probe budget: per query |IVF ∩ exact| / k, the
    // accuracy half of the recall-vs-cost tradeoff nprobe buys. Pure
    // SET comparison (a semi join on (qid, nid)), so it gates on
    // integers regardless of cosine's last-ulp fate; the oracle reruns
    // both pipelines and intersects.
    Q(
      "sim_ivf_recall",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        val q = emb.filter(col("vec_id") < 5)
        val exact = SimilarityOps
          .bruteForceTopK(q, emb, "vec_id", "embedding", k = 10)
          .select(col("qid"), col("nid"))
        val approx = SimilarityOps
          .ivfTopK(q, emb, "vec_id", "embedding", k = 10,
            nlist = 16, nprobe = 4)
          .select(col("qid"), col("nid"))
        val hits = exact.join(approx, Seq("qid", "nid"), "left_semi")
          .groupBy("qid").agg(count(lit(1)).as("hits"))
        exact.groupBy("qid").agg(count(lit(1)).as("k"))
          .join(hits, Seq("qid"), "left_outer")
          .select(col("qid"), col("k"),
            coalesce(col("hits"), lit(0L)).as("hits"))
          .withColumn("recall",
            col("hits").cast("double") / col("k").cast("double"))
          .orderBy("qid")
      },
      Some("""WITH v0 AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v0),
             |bt AS (SELECT qid, nid FROM (
             |    SELECT q.vec_id AS qid, c.vec_id AS nid,
             |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
             |        list_dot_product(q.e, c.e) / (q.nrm * c.nrm) DESC,
             |        c.vec_id ASC) AS rank
             |    FROM n q JOIN n c ON q.vec_id < 5 AND q.vec_id <> c.vec_id)
             |  t WHERE rank <= 10),
             |cent AS (SELECT vec_id AS cid, e AS centv, nrm AS centn
             |  FROM n WHERE vec_id < 16),
             |lists AS (SELECT nid, cid FROM (
             |    SELECT c.vec_id AS nid, cent.cid,
             |      ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
             |        list_dot_product(c.e, cent.centv) / (c.nrm * cent.centn)
             |          DESC, cent.cid ASC) AS r
             |    FROM n c CROSS JOIN cent) t WHERE r = 1),
             |probes AS (SELECT qid, cid FROM (
             |    SELECT q.vec_id AS qid, cent.cid,
             |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
             |        list_dot_product(q.e, cent.centv) / (q.nrm * cent.centn)
             |          DESC, cent.cid ASC) AS r
             |    FROM n q CROSS JOIN cent WHERE q.vec_id < 5) t WHERE r <= 4),
             |iv AS (SELECT qid, nid FROM (
             |    SELECT p.qid, l.nid, ROW_NUMBER() OVER (
             |      PARTITION BY p.qid ORDER BY
             |        list_dot_product(nq.e, nc.e) / (nq.nrm * nc.nrm) DESC,
             |        l.nid ASC) AS rank
             |    FROM probes p JOIN lists l ON p.cid = l.cid
             |    JOIN n nq ON nq.vec_id = p.qid
             |    JOIN n nc ON nc.vec_id = l.nid
             |    WHERE p.qid <> l.nid) t WHERE rank <= 10),
             |h AS (SELECT bt.qid, CAST(count(*) AS BIGINT) AS hits
             |  FROM bt JOIN iv ON iv.qid = bt.qid AND iv.nid = bt.nid
             |  GROUP BY 1),
             |kk AS (SELECT qid, CAST(count(*) AS BIGINT) AS k
             |  FROM bt GROUP BY 1)
             |SELECT kk.qid, kk.k, coalesce(h.hits, 0) AS hits,
             |  CAST(coalesce(h.hits, 0) AS DOUBLE) / CAST(kk.k AS DOUBLE)
             |    AS recall
             |FROM kk LEFT JOIN h ON h.qid = kk.qid ORDER BY kk.qid""".stripMargin),
      "recall@10 of IVF vs brute-force ground truth: the index-quality set intersection"),

    // IVF-PQ: inverted lists + product-quantized RESIDUAL codes
    // ([[SimilarityOps.ivfPqTopK]]) — the memory-bounded tier above
    // sim_topk_ivf (m=4 one-byte codes per posting instead of the full
    // 64-dim vector). Asymmetric distance: exact query residual vs each
    // candidate's quantized one, summed over subspaces in FIXED order.
    // The oracle replays the whole pipeline — coarse assignment,
    // residuals, subspace slicing, codebook argmin encoding, ADC table,
    // fixed-order fold — as SQL over the same deterministic
    // first-ids codebooks, so the gate is a hash match, not rows-only.
    Q(
      "sim_topk_ivfpq",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        SimilarityOps
          .ivfPqTopK(
            emb.filter(col("vec_id") < 5), emb,
            "vec_id", "embedding", k = 10,
            nlist = 16, nprobe = 4, m = 4, ksub = 16)
          .orderBy("qid", "rank")
      },
      Some(s"""WITH $pqEncCtes,
             |probes AS (
             |  SELECT qid, cid, qrv FROM (
             |    SELECT q.vec_id AS qid, cent.cid,
             |      list_transform(generate_series(1, len(q.v)),
             |                     i -> q.v[i] - cent.centv[i]) AS qrv,
             |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
             |        list_dot_product(q.v, cent.centv) / (q.nrm * cent.centn) DESC,
             |        cent.cid ASC) AS r
             |    FROM n q CROSS JOIN cent WHERE q.vec_id < 5) t WHERE r <= 4),
             |qsub AS (
             |  SELECT qid, cid, j,
             |    qrv[j*(len(qrv)//4)+1 : (j+1)*(len(qrv)//4)] AS qsv
             |  FROM probes CROSS JOIN js),
             |adc AS (
             |  SELECT qid, cid, qsub.j, cb.code,
             |    list_dot_product(qsv, qsv) + list_dot_product(cb.cbv, cb.cbv)
             |      - 2.0 * list_dot_product(qsv, cb.cbv) AS qd2
             |  FROM qsub JOIN cb ON cb.j = qsub.j),
             |pairs AS (
             |  SELECT a.qid, e2.nid,
             |    max(CASE WHEN a.j = 0 THEN qd2 END) AS d0,
             |    max(CASE WHEN a.j = 1 THEN qd2 END) AS d1,
             |    max(CASE WHEN a.j = 2 THEN qd2 END) AS d2,
             |    max(CASE WHEN a.j = 3 THEN qd2 END) AS d3
             |  FROM adc a JOIN enc e2
             |    ON e2.cid = a.cid AND e2.j = a.j AND e2.code = a.code
             |  WHERE a.qid <> e2.nid
             |  GROUP BY a.qid, e2.nid),
             |scored AS (SELECT qid, nid, ((d0 + d1) + d2) + d3 AS adist2 FROM pairs)
             |SELECT qid, rank, nid, adist2 FROM (
             |  SELECT qid, nid, adist2, ROW_NUMBER() OVER (
             |    PARTITION BY qid ORDER BY adist2 ASC, nid ASC) AS rank
             |  FROM scored) t WHERE rank <= 10
             |ORDER BY qid, rank""".stripMargin),
      "IVF-PQ top-10: product-quantized residual codes + asymmetric distance; " +
        "oracle replays coarse assignment, encoding, and the ADC fold"),

    // Greedy max-min (k-center) diversity selection
    // ([[graft.ops.SimilarityOps.maxMinDiverse]]): 5 maximally-spread
    // exemplars by farthest-first traversal — the coreset/diversity
    // sampling step of embedding-based curation. Squared Euclidean via
    // the bit-identical fold dots (no sqrt), id tie-breaks; the oracle
    // unrolls the same 5 greedy rounds as MATERIALIZED CTEs with
    // `list_dot_product`.
    Q(
      "sim_diverse_maxmin",
      (s, d) =>
        SimilarityOps
          .maxMinDiverse(T(s, d, "embeddings"), "vec_id", "embedding", k = 5)
          .orderBy("sel_order"),
      Some {
        val k = 5
        val rounds = (2 to k).map { i =>
          val prev = s"p${i - 1}"
          s"""d$i AS MATERIALIZED (
             |  SELECT c.id,
             |    min(c.nn + s.nn - 2.0 * list_dot_product(c.v, s.v)) AS md
             |  FROM n c JOIN n s ON s.id IN (SELECT id FROM $prev)
             |  WHERE c.id NOT IN (SELECT id FROM $prev)
             |  GROUP BY c.id),
             |s$i AS MATERIALIZED (
             |  SELECT id, md FROM d$i ORDER BY md DESC, id LIMIT 1),
             |p$i AS MATERIALIZED (
             |  SELECT id FROM $prev UNION ALL SELECT id FROM s$i)""".stripMargin
        }.mkString(",\n")
        val out = (2 to k)
          .map(i => s"SELECT $i AS sel_order, id, md AS min_dist2 FROM s$i")
          .mkString("\nUNION ALL\n")
        s"""WITH n AS MATERIALIZED (
           |  SELECT vec_id AS id, embedding::DOUBLE[] AS v,
           |    list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nn
           |  FROM embeddings),
           |p1 AS MATERIALIZED (SELECT min(id) AS id FROM n),
           |$rounds
           |SELECT 1 AS sel_order, id, CAST(NULL AS DOUBLE) AS min_dist2 FROM p1
           |UNION ALL
           |$out
           |ORDER BY sel_order""".stripMargin
      },
      "farthest-first k-center diversity selection: 5 greedy rounds, unrolled-CTE oracle"),

    // Contrastive-training miners over the banded ANN candidates: the
    // oracle replicates the sign-sketch banding (SketchOracle), the
    // label filters, and the exact re-rank — the whole operator, like
    // sim_topk_lsh.
    Q(
      "sim_hard_negatives",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        SimilarityOps
          .hardNegatives(
            emb.filter(col("vec_id") < 8), emb,
            "vec_id", "embedding", "label", k = 5)
          .orderBy("qid", "rank")
      },
      Some(s"""WITH ${SketchOracle.bandsCtes},
              |lab AS (SELECT vec_id, label FROM embeddings),
              |cand AS (
              |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
              |  FROM bands q JOIN bands c
              |    ON q.band = c.band AND q.bh = c.bh
              |  JOIN lab ql ON ql.vec_id = q.vec_id
              |  JOIN lab cl ON cl.vec_id = c.vec_id
              |  WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id
              |    AND ql.label <> cl.label),
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
              |  FROM scored) t WHERE rank <= 5
              |ORDER BY qid, rank""".stripMargin),
      "hard-negative mining: top-5 most-similar DIFFERENT-label neighbors " +
        "(banded candidates + exact re-rank; oracle replays the banding)"),

    Q(
      "sim_contrastive_triplets",
      (s, d) =>
        SimilarityOps
          .contrastiveTriplets(
            T(s, d, "embeddings"), "vec_id", "embedding", "label")
          .orderBy("qid"),
      Some(s"""WITH ${SketchOracle.bandsCtes},
              |lab AS (SELECT vec_id, label FROM embeddings),
              |cand AS (
              |  SELECT DISTINCT q.vec_id AS qid, ql.label AS ql,
              |    c.vec_id AS nid, cl.label AS nl
              |  FROM bands q JOIN bands c
              |    ON q.band = c.band AND q.bh = c.bh
              |  JOIN lab ql ON ql.vec_id = q.vec_id
              |  JOIN lab cl ON cl.vec_id = c.vec_id
              |  WHERE q.vec_id <> c.vec_id),
              |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
              |scored AS (
              |  SELECT cand.qid, cand.nid,
              |    CASE WHEN cand.ql = cand.nl THEN 1 ELSE 0 END AS same,
              |    list_dot_product(nq.v, nc.v) / (nq.nrm * nc.nrm) AS cosine
              |  FROM cand
              |  JOIN n nq ON nq.vec_id = cand.qid
              |  JOIN n nc ON nc.vec_id = cand.nid),
              |top AS (
              |  SELECT qid, same, nid, cosine, ROW_NUMBER() OVER (
              |    PARTITION BY qid, same ORDER BY cosine DESC, nid ASC) AS r
              |  FROM scored)
              |SELECT p.qid, p.nid AS pos_id, p.cosine AS pos_cos,
              |       g.nid AS neg_id, g.cosine AS neg_cos
              |FROM top p JOIN top g ON p.qid = g.qid
              |WHERE p.same = 1 AND g.same = 0 AND p.r = 1 AND g.r = 1
              |ORDER BY p.qid""".stripMargin),
      "contrastive triplets: nearest same-label positive + hardest " +
        "different-label negative per anchor, one banded candidate pass")
  )
}
