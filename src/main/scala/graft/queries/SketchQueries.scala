package graft.queries

import graft.{Q, T}
import graft.ops.SketchOps

/** Cardinality-sketch gate: KMV approximate distinct. The sketch is a
  * deterministic function of the data (k smallest salted-hash values), so
  * unlike HLL the ESTIMATOR itself is hash-gated against DuckDB — the
  * oracle rebuilds the same 52-bit hashes, ranks them, and applies the
  * same unbiased (k-1)/U(k) arithmetic in exact IEEE doubles. Accuracy
  * (~1/sqrt(k) relative error) and merge associativity are asserted in
  * SketchOpsSpec; this gate proves the distributed plan computes the
  * sketch the specification says.
  */
object SketchQueries {

  private val K = 256

  val all: Seq[Q] = Seq(
    // Bottom-k row sample → discrete rank quantiles. Same deterministic
    // bottom-k-by-hash state as the KMV gate, carrying l_extendedprice;
    // the oracle rebuilds the identical sample and rank selection.
    Q(
      "sketch_quantile_bottomk",
      (s, d) => {
        import org.apache.spark.sql.functions.{col, concat_ws}
        SketchOps
          .bottomKQuantiles(T(s, d, "lineitem"),
            concat_ws("-", col("l_orderkey"), col("l_linenumber")),
            col("l_extendedprice"), Seq("l_returnflag"), K,
            ps = Seq(0.1, 0.5, 0.9))
          .orderBy("l_returnflag", "p")
      },
      Some(s"""WITH s AS (
              |  SELECT l_returnflag,
              |    CAST(('0x' || substr(md5('kq:' || CAST(l_orderkey AS VARCHAR)
              |      || '-' || CAST(l_linenumber AS VARCHAR)), 1, 13)) AS BIGINT) AS h,
              |    l_extendedprice AS v
              |  FROM lineitem),
              |r AS (SELECT l_returnflag, h, v,
              |        row_number() OVER (PARTITION BY l_returnflag ORDER BY h, v) AS rn
              |      FROM s),
              |smp AS (SELECT * FROM r WHERE rn <= $K),
              |rv AS (SELECT l_returnflag, v,
              |         row_number() OVER (PARTITION BY l_returnflag ORDER BY v, h) AS vr,
              |         count(*) OVER (PARTITION BY l_returnflag) AS n
              |       FROM smp)
              |SELECT l_returnflag, p, v AS q
              |FROM rv, (VALUES (CAST(0.1 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
              |                 (CAST(0.9 AS DOUBLE))) ps(p)
              |WHERE vr = CAST(floor((n - 1) * p) AS BIGINT) + 1
              |ORDER BY l_returnflag, p""".stripMargin),
      "bottom-k sample quantiles: deterministic uniform row sample, rank-selected"),

    // Count-Min frequency sketch, completing the sketch trio (distinct /
    // quantiles / frequencies): token counts estimated from 3x64 bounded
    // counters instead of one counter per distinct key. Deterministic
    // salted bucket hashes → the oracle rebuilds the identical counter
    // table and min-read; estimates are exact-or-over by construction
    // (asserted in SketchOpsSpec), and the gate emits exact counts next
    // to the estimates so the error is visible data.
    Q(
      "sketch_cms_freq",
      (s, d) => {
        import org.apache.spark.sql.functions.{col, count, explode, lit, split}
        val tok = T(s, d, "documents")
          .select(explode(split(col("text"), " +")).as("key"))
        val counters = SketchOps.cmsCounters(tok, col("key"), w = 64, d = 3)
        val est = SketchOps.cmsEstimate(counters, tok.distinct(), col("key"),
          w = 64, d = 3)
        tok.groupBy("key").agg(count(lit(1)).as("n_exact"))
          .join(est, "key")
          .select(col("key").as("token"), col("n_exact"), col("est_count"))
          .orderBy("token")
      },
      Some {
        def bucket(i: Int) =
          s"CAST(('0x' || substr(md5('cms$i:' || key), 1, 13)) AS BIGINT) % 64"
        val probes = (0 until 3).map(i =>
          s"SELECT key, $i AS seed, ${bucket(i)} AS bucket FROM tok")
          .mkString("\n  UNION ALL\n  ")
        val kprobes = (0 until 3).map(i =>
          s"SELECT key, $i AS seed, ${bucket(i)} AS bucket FROM keys")
          .mkString("\n  UNION ALL\n  ")
        s"""WITH tok AS (
           |  SELECT unnest(string_split_regex(text, ' +')) AS key FROM documents),
           |probes AS (
           |  $probes),
           |counters AS (
           |  SELECT seed, bucket, count(*) AS cnt FROM probes GROUP BY 1, 2),
           |keys AS (SELECT DISTINCT key FROM tok),
           |kp AS (
           |  $kprobes),
           |est AS (
           |  SELECT key, min(coalesce(cnt, 0)) AS est_count
           |  FROM kp LEFT JOIN counters USING (seed, bucket) GROUP BY key),
           |exact AS (SELECT key, count(*) AS n_exact FROM tok GROUP BY key)
           |SELECT key AS token, n_exact, est_count
           |FROM exact JOIN est USING (key)
           |ORDER BY token""".stripMargin
      },
      "count-min frequency sketch: bounded counters, min-read estimates vs exact"),

    Q(
      "sketch_kmv_distinct",
      (s, d) =>
        SketchOps
          .kmvDistinct(T(s, d, "orders"), "o_custkey",
            Seq("o_orderpriority"), K)
          .orderBy("o_orderpriority"),
      Some(s"""WITH h AS (
              |  SELECT DISTINCT o_orderpriority,
              |    CAST(('0x' || substr(md5('kmv:' || CAST(o_custkey AS VARCHAR)), 1, 13))
              |      AS BIGINT) AS h
              |  FROM orders),
              |r AS (SELECT o_orderpriority, h,
              |        row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
              |      FROM h)
              |SELECT o_orderpriority, count(*) AS n_sketch,
              |  CASE WHEN count(*) < $K THEN CAST(count(*) AS DOUBLE)
              |       ELSE ${K - 1}e0 * 4503599627370496e0 /
              |            max(CASE WHEN rn = $K THEN h END)
              |  END AS est_distinct
              |FROM r WHERE rn <= $K
              |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      "KMV distinct-count sketch per group: deterministic, mergeable, oracle-exact")
  )
}
