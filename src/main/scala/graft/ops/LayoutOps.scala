package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering and its pruning
  * payoff, computed as plain integer expressions so the whole technique is
  * oracle-checkable.
  *
  * Why this matters at 100 TB: file-level min/max statistics (parquet
  * footers, lakehouse manifests) prune a scan only if rows with nearby
  * values sit in the same files. Sorting by ONE column clusters that
  * column and destroys the other; interleaving the bits of two columns
  * (the Z-curve) clusters BOTH, so a range predicate on either — or both —
  * skips most files. This is exactly Delta/Iceberg `OPTIMIZE ZORDER BY`,
  * re-expressed as a Spark projection + range layout.
  *
  * Scale shape: [[zValue2]] is a pure codegen'd projection (no shuffle,
  * no UDF). The production write is `repartitionByRange(z)` + per-file
  * stats — the z-range IS the file id; no global sort or window is needed
  * because the curve's high bits already partition space into tiles
  * ([[zTile]] — a shift, not a window).
  */
object LayoutOps {

  /** Morton/Z-value of two non-negative ints using their low `bits` bits:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Built from
    * shift/and/or only — bit-identical in any engine, expressible in the
    * DuckDB oracle verbatim. */
  def zValue2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** The spatial tile a z-value belongs to: its high bits. With `bits`-bit
    * inputs and `tileBits` kept, space splits into 2^tileBits square-ish
    * tiles — the file/bucket boundary at write time, as a projection (no
    * window, no global sort). */
  def zTile(z: Column, bits: Int, tileBits: Int): Column = {
    // a negative shift distance silently reduces mod 64 (Java shift
    // semantics) and collapses every z into garbage tiles
    require(tileBits >= 0 && tileBits <= 2 * bits,
      s"tileBits=$tileBits out of range for $bits-bit inputs")
    shiftright(z, 2 * bits - tileBits)
  }

  /** Per-tile layout statistics (row count + min/max of both dimensions)
    * for a corpus laid out in z-order — the engine-side analog of parquet
    * footer stats per file. One groupBy on the tile id. */
  def zTileStats(
      df: DataFrame, xCol: Column, yCol: Column,
      bits: Int, tileBits: Int): DataFrame = {
    val z = zValue2(xCol, yCol, bits)
    df.select(xCol.as("x"), yCol.as("y"),
        zTile(z, bits, tileBits).as("tile"))
      .groupBy("tile")
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
  }

  /** Pruning effectiveness of the z-layout for a rectangle query
    * [xLo,xHi] × [yLo,yHi]: which tiles COULD contain matches (min/max
    * overlap — what a scan planner sees in file stats) vs the rows that
    * actually match. One summary row:
    * (n_tiles, n_candidate_tiles, n_rows, n_rows_scanned, n_rows_matching)
    * — `n_rows_scanned / n_rows` is the fraction of the corpus a
    * stats-pruned scan reads instead of 100%. */
  def zPruneStats(
      df: DataFrame, xCol: Column, yCol: Column, bits: Int, tileBits: Int,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    // ONE corpus scan: the per-tile match count rides the same aggregate
    // as the min/max stats, so the final roll-up never re-reads the data.
    val z = zValue2(xCol, yCol, bits)
    val inRect = xCol >= xLo && xCol <= xHi && yCol >= yLo && yCol <= yHi
    val stats = df
      .select(xCol.as("x"), yCol.as("y"),
        zTile(z, bits, tileBits).as("tile"), inRect.cast("long").as("m"))
      .groupBy("tile")
      .agg(count(lit(1)).as("n_rows"), sum(col("m")).as("n_match"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
    val candidate = col("max_x") >= xLo && col("min_x") <= xHi &&
      col("max_y") >= yLo && col("min_y") <= yHi
    stats.agg(
      count(lit(1)).as("n_tiles"),
      sum(candidate.cast("long")).as("n_candidate_tiles"),
      sum(col("n_rows")).as("n_rows"),
      sum(when(candidate, col("n_rows")).otherwise(0L)).as("n_rows_scanned"),
      sum(col("n_match")).as("n_rows_matching"))
  }

  /** [[zPruneStats]] with the HILBERT curve as the layout key
    * ([[graft.expr.HilbertIndex]]) — same corpus, same tile count, same
    * rectangle, so the two gates' summary rows are directly comparable:
    * the Hilbert curve's no-jump property typically admits fewer
    * candidate tiles for rectangles that straddle the Z-curve's
    * diagonal seams. Identical scale shape: a codegen'd projection, one
    * keyed rollup, one summary row. */
  def hilbertPruneStats(
      df: DataFrame, xCol: Column, yCol: Column, bits: Int, tileBits: Int,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    require(tileBits >= 0 && tileBits <= 2 * bits,
      s"tileBits=$tileBits out of range for $bits-bit inputs")
    val h = graft.expr.HilbertIndex.index(xCol, yCol, bits)
    val inRect = xCol >= xLo && xCol <= xHi && yCol >= yLo && yCol <= yHi
    val stats = df
      .select(xCol.as("x"), yCol.as("y"),
        shiftright(h, 2 * bits - tileBits).as("tile"),
        inRect.cast("long").as("m"))
      .groupBy("tile")
      .agg(count(lit(1)).as("n_rows"), sum(col("m")).as("n_match"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
    val candidate = col("max_x") >= xLo && col("min_x") <= xHi &&
      col("max_y") >= yLo && col("min_y") <= yHi
    stats.agg(
      count(lit(1)).as("n_tiles"),
      sum(candidate.cast("long")).as("n_candidate_tiles"),
      sum(col("n_rows")).as("n_rows"),
      sum(when(candidate, col("n_rows")).otherwise(0L)).as("n_rows_scanned"),
      sum(col("n_match")).as("n_rows_matching"))
  }

  /** Small-file compaction plan — the other half of lakehouse table
    * maintenance beside Z-order: group input files into target-size
    * rewrite bins (Delta/Iceberg `OPTIMIZE` bin packing). The rule is
    * the deterministic size-descending streaming pack: order files by
    * (bytes desc, key asc), take the global running byte offset, and
    * assign `bin = start_offset div targetBytes`. Every bin lands in
    * [targetBytes − max_file, targetBytes + max_file) except the last —
    * the bound real compactors accept — and unlike first-fit-decreasing
    * the assignment is a pure prefix-sum function of the order, so it
    * runs WITHOUT a sequential driver loop: [[StatOps.globalRunningSum]]
    * (checkpoint-pinned range repartition + per-partition sums +
    * broadcast offsets), never a single-partition window. A billion-file
    * manifest plans in two shuffles.
    *
    * @return one row per file: (`key`, `bytes`, `bin_start` = running
    *         offset before this file, `bin`).
    */
  def compactionBins(
      files: DataFrame, keyCol: String, bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    StatOps.globalRunningSum(
        files.select(col(keyCol), col(bytesCol).cast("long").as(bytesCol)),
        Seq(col(bytesCol).desc, col(keyCol).asc), bytesCol, "_cum")
      .select(col(keyCol), col(bytesCol),
        (col("_cum") - col(bytesCol)).as("bin_start"),
        expr(s"(_cum - $bytesCol) div ${targetBytes}L").as("bin"))
  }

  /** Rendezvous (highest-random-weight) shard assignment: shard =
    * argmax over s ∈ [0, nShards) of hash64("salt:s:id") — the
    * consistent-placement rule whose defining property is MINIMAL
    * MOVEMENT: growing nShards → nShards+1 moves exactly the docs whose
    * new shard wins (≈ n/(nShards+1)), and every moved doc lands ON the
    * new shard; nothing reshuffles between surviving shards (mod-N
    * hashing moves ~all docs instead). The op a 100 TB incremental
    * pipeline uses to grow its shard/bucket count without rewriting the
    * corpus.
    *
    * Shape: a pure codegen'd PROJECTION — nShards native hash64 calls
    * per row, argmax via `greatest` over (weight, s) structs (field
    * order makes ties, probability ≈ 0, break toward the higher s). No
    * shuffle, no state, embarrassingly parallel.
    */
  def rendezvousShard(
      df: DataFrame, idCol: String, nShards: Int, salt: String,
      outCol: String = "shard"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    import graft.expr.TextHashFunctions.hash64
    val cands = (0 until nShards).map { s =>
      struct(
        hash64(concat_ws(":", lit(salt), lit(s.toString),
          col(idCol).cast("string"))).as("w"),
        lit(s).as("s"))
    }
    val best =
      if (nShards == 1) cands.head else greatest(cands: _*)
    df.withColumn(outCol, best.getField("s"))
  }

  /** EXACT balanced range-partition boundaries: the `nBuckets - 1` split
    * points under the total order (`keyCol`, `tieCol`) such that every
    * bucket holds floor/ceil(n / nBuckets) rows — the planner output
    * that `repartitionByRange`'s reservoir SAMPLER approximates,
    * computed exactly for layout jobs where partition balance is worth
    * one pass (a skewed bucket at 100 TB is a straggler for every
    * downstream stage). Rank r closes bucket i when floor(r·N/n) steps
    * past floor((r−1)·N/n) — pure integer arithmetic, so the oracle
    * replays it off ROW_NUMBER verbatim.
    *
    * The split point is the COMPOSITE (`boundary`, `boundary_tie`):
    * rows whose (key, tie) sorts at-or-below it land left. When keys
    * repeat, the key alone cannot cut a tie run at the exact rank — the
    * tie value is what keeps the buckets exactly equal (splitting on
    * `boundary` alone degrades to "all equal keys left", the usual
    * range-partitioner behavior).
    *
    * Shape: one [[StatOps.globalRowNumber]] (range-staged, never a
    * single-partition window) + a 1-row count broadcast + a filter that
    * keeps exactly nBuckets − 1 rows. For sampled planning at petabyte
    * scale, compose [[graft.ops.CorpusOps.sampleByHash]] upstream — the
    * operator is unchanged.
    *
    * @return (`boundary_idx` 1..nBuckets−1, `boundary`, `boundary_tie`
    *         = the (key, tie) of the greatest row of bucket idx−1)
    */
  def rangeBoundaries(
      df: DataFrame, keyCol: String, tieCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val ranked = StatOps.globalRowNumber(
      df.select(col(keyCol), col(tieCol)),
      Seq(col(keyCol), col(tieCol)), "_r")
    val n = ranked.agg(count(lit(1)).as("_n"))
    ranked.crossJoin(broadcast(n)) // 1-row count frame (declared)
      .filter(col("_r") < col("_n") &&
        expr(s"(_r * $nBuckets) div _n") >
          expr(s"((_r - 1) * $nBuckets) div _n"))
      .select(expr(s"(_r * $nBuckets) div _n").as("boundary_idx"),
        col(keyCol).as("boundary"), col(tieCol).as("boundary_tie"))
  }
}
