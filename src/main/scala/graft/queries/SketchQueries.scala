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
