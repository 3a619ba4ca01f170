package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, T}
import graft.ops.LayoutOps

/** Z-order layout gate: the Morton interleave, the tile split, and the
  * pruning payoff are all integer shift/and/or arithmetic, so the DuckDB
  * oracle reruns the IDENTICAL bit expressions — the gate proves the
  * layout delivers its skip-ratio, not just that z-values compute.
  */
object LayoutQueries {

  /** The same bit-interleave [[LayoutOps.zValue2]] emits, as SQL text. */
  private def zSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  val all: Seq[Q] = Seq(
    // 8-bit dims, 256 tiles (z high byte), rectangle x in [32,47] x
    // y in [64,95]: a z-layout pins both dims per tile, so file-level
    // min/max stats admit ~2 of 256 tiles. n_rows_scanned / n_rows is
    // what a stats-pruned scan reads; single-column sort would admit an
    // entire stripe of the second dimension instead.
    Q(
      "layout_zorder_prune",
      (s, d) =>
        LayoutOps.zPruneStats(T(s, d, "events"),
          col("user_id") % 256, col("event_id") % 256,
          bits = 8, tileBits = 8,
          xLo = 32, xHi = 47, yLo = 64, yHi = 95),
      Some {
        val z = zSql("x", "y", 8)
        s"""WITH pts AS (
           |  SELECT user_id % 256 AS x, event_id % 256 AS y FROM events),
           |t AS (SELECT x, y, ($z) >> 8 AS tile FROM pts),
           |s AS (SELECT tile, count(*) AS n_rows,
           |        min(x) AS min_x, max(x) AS max_x,
           |        min(y) AS min_y, max(y) AS max_y
           |      FROM t GROUP BY tile),
           |m AS (SELECT CAST(SUM(CASE WHEN x BETWEEN 32 AND 47
           |                            AND y BETWEEN 64 AND 95
           |                           THEN 1 ELSE 0 END) AS BIGINT)
           |        AS n_rows_matching FROM pts)
           |SELECT CAST(count(*) AS BIGINT) AS n_tiles,
           |  CAST(SUM(CASE WHEN max_x >= 32 AND min_x <= 47
           |                 AND max_y >= 64 AND min_y <= 95
           |                THEN 1 ELSE 0 END) AS BIGINT) AS n_candidate_tiles,
           |  CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           |  CAST(SUM(CASE WHEN max_x >= 32 AND min_x <= 47
           |                 AND max_y >= 64 AND min_y <= 95
           |                THEN n_rows ELSE 0 END) AS BIGINT) AS n_rows_scanned,
           |  any_value(m.n_rows_matching) AS n_rows_matching
           |FROM s, m""".stripMargin
      },
      "Z-order layout pruning: 2 of 256 tiles admit a 2-D rectangle query"),

    // The Hilbert-curve twin of the gate above — same points, same 256
    // tiles, same rectangle — so the two single-row summaries compare
    // the curves' pruning power directly. The oracle replays the
    // rotate-and-accumulate walk as 8 generated CTE stages of integer
    // CASE arithmetic ([[graft.expr.HilbertIndex.stagedSql]]).
    Q(
      "layout_hilbert_prune",
      (s, d) =>
        LayoutOps.hilbertPruneStats(T(s, d, "events"),
          col("user_id") % 256, col("event_id") % 256,
          bits = 8, tileBits = 8,
          xLo = 32, xHi = 47, yLo = 64, yHi = 95),
      Some {
        val h = graft.expr.HilbertIndex.stagedSql("pts", 8,
          carryCols = Seq("x", "y"))
        s"""WITH pts AS (
           |  SELECT user_id % 256 AS x, event_id % 256 AS y FROM events),
           |$h,
           |t AS (SELECT x, y, d >> 8 AS tile FROM hil),
           |s AS (SELECT tile, count(*) AS n_rows,
           |        min(x) AS min_x, max(x) AS max_x,
           |        min(y) AS min_y, max(y) AS max_y
           |      FROM t GROUP BY tile),
           |m AS (SELECT CAST(SUM(CASE WHEN x BETWEEN 32 AND 47
           |                            AND y BETWEEN 64 AND 95
           |                           THEN 1 ELSE 0 END) AS BIGINT)
           |        AS n_rows_matching FROM pts)
           |SELECT CAST(count(*) AS BIGINT) AS n_tiles,
           |  CAST(SUM(CASE WHEN max_x >= 32 AND min_x <= 47
           |                 AND max_y >= 64 AND min_y <= 95
           |                THEN 1 ELSE 0 END) AS BIGINT) AS n_candidate_tiles,
           |  CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           |  CAST(SUM(CASE WHEN max_x >= 32 AND min_x <= 47
           |                 AND max_y >= 64 AND min_y <= 95
           |                THEN n_rows ELSE 0 END) AS BIGINT) AS n_rows_scanned,
           |  any_value(m.n_rows_matching) AS n_rows_matching
           |FROM s, m""".stripMargin
      },
      "Hilbert layout pruning: the no-jump curve vs Z-order on the same rectangle"),

    // Small-file compaction planning ([[LayoutOps.compactionBins]]): the
    // documents manifest (bytes = text length) packed into 4 KiB rewrite
    // bins by the size-descending streaming rule. The assignment is a
    // pure prefix-sum function of the (bytes desc, key asc) total order,
    // so the oracle is ONE window running sum — while the engine side
    // computes the same prefix sum distributed (range staging +
    // broadcast per-partition offsets, no single-partition window).
    Q(
      "layout_compaction_bins",
      (s, d) =>
        LayoutOps.compactionBins(
            T(s, d, "documents")
              .select(col("doc_id"), length(col("text")).cast("long").as("bytes")),
            "doc_id", "bytes", targetBytes = 4096L)
          .orderBy("doc_id"),
      Some("""WITH f AS (
             |  SELECT doc_id, CAST(length(text) AS BIGINT) AS bytes
             |  FROM documents),
             |r AS (SELECT doc_id, bytes,
             |    -- SUM(BIGINT) is HUGEINT in DuckDB; pin back to BIGINT
             |    CAST(SUM(bytes) OVER (ORDER BY bytes DESC, doc_id ASC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bytes
             |      AS BIGINT) AS bin_start
             |  FROM f)
             |SELECT doc_id, bytes, bin_start, bin_start // 4096 AS bin
             |FROM r ORDER BY doc_id""".stripMargin),
      "compaction bin packing: size-descending streaming bins via distributed prefix sum"),

    // Exact range-partition boundaries ([[LayoutOps.rangeBoundaries]]):
    // the 15 composite split points that cut orders into 16 equal-row
    // buckets under (o_custkey, o_orderkey) — the key REPEATS (many
    // orders per customer), so the tie column is what lets a boundary
    // cut inside a tie run and keep buckets exactly equal. The
    // bucket-step test is pure integer arithmetic off the global rank,
    // so the oracle replays it off ROW_NUMBER verbatim.
    Q(
      "layout_range_boundaries",
      (s, d) =>
        LayoutOps.rangeBoundaries(T(s, d, "orders"),
            "o_custkey", "o_orderkey", nBuckets = 16)
          .orderBy("boundary_idx"),
      Some("""WITH r AS (SELECT o_custkey, o_orderkey,
             |    ROW_NUMBER() OVER (ORDER BY o_custkey, o_orderkey) AS rn,
             |    count(*) OVER () AS n
             |  FROM orders)
             |SELECT (rn * 16) // n AS boundary_idx,
             |  o_custkey AS boundary, o_orderkey AS boundary_tie
             |FROM r
             |WHERE rn < n AND (rn * 16) // n > ((rn - 1) * 16) // n
             |ORDER BY boundary_idx""".stripMargin),
      "exact balanced range-partition split points: composite boundaries cut inside duplicate-key runs"),

    // Rendezvous sharding ([[LayoutOps.rendezvousShard]]) and its
    // defining invariant in one gate: assignment at 8 shards, at 9
    // shards, and the moved flag — every moved doc must land on the NEW
    // shard (the minimal-movement guarantee mod-N hashing lacks). The
    // oracle replays hash64 over the 'rv:s:id' candidate strings
    // (vocabulary-sized recursive FNV+mix) and takes the same argmax.
    Q(
      "layout_rendezvous_shard",
      (s, d) =>
        LayoutOps.rendezvousShard(
            LayoutOps.rendezvousShard(
              T(s, d, "documents").select("doc_id"),
              "doc_id", nShards = 8, salt = "rv", outCol = "shard_8"),
            "doc_id", nShards = 9, salt = "rv", outCol = "shard_9")
          .withColumn("moved", col("shard_8") =!= col("shard_9"))
          .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE cand AS (
              |  SELECT doc_id, s,
              |    'rv:' || CAST(s AS VARCHAR) || ':' ||
              |      CAST(doc_id AS VARCHAR) AS f
              |  FROM documents, unnest(generate_series(0, 8)) AS u(s)),
              |${Hash64Oracle.hash64VocabCtes("cand")},
              |w AS (SELECT c.doc_id, c.s, h.hs
              |      FROM cand c JOIN hsig h USING (f)),
              |a8 AS (SELECT doc_id, s AS shard8 FROM (
              |    SELECT doc_id, s, ROW_NUMBER() OVER (PARTITION BY doc_id
              |        ORDER BY hs DESC, s DESC) AS r
              |    FROM w WHERE s < 8) WHERE r = 1),
              |a9 AS (SELECT doc_id, s AS shard9 FROM (
              |    SELECT doc_id, s, ROW_NUMBER() OVER (PARTITION BY doc_id
              |        ORDER BY hs DESC, s DESC) AS r
              |    FROM w) WHERE r = 1)
              |SELECT a8.doc_id,
              |  CAST(shard8 AS INTEGER) AS shard_8,
              |  CAST(shard9 AS INTEGER) AS shard_9,
              |  shard8 <> shard9 AS moved
              |FROM a8 JOIN a9 USING (doc_id) ORDER BY a8.doc_id""".stripMargin),
      "rendezvous sharding: 8->9 shard growth, moved docs land only on the new shard")
  )
}
