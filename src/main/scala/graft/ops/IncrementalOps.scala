package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-warehouse operators: change-data-capture between two table
  * snapshots, and Type-2 slowly-changing-dimension maintenance. These are
  * the batch halves of the reference pipeline's *incremental* contract
  * (extract.py re-pulls a window, the warehouse converges): given the
  * previous snapshot and the new one, emit exactly what changed; given a
  * versioned dimension and an update batch, extend history without ever
  * rewriting it.
  *
  * Both operators are ONE keyed shuffle join over the inputs — linear in
  * the snapshot size, no driver state. On a real warehouse both sides are
  * bucketed by the key ([[graft.pipeline.Sinks.writeBucketedTable]]), so
  * the join co-locates with zero exchanges and the cost is a merge of
  * sorted buckets — the only plan that survives a 100 TB dimension.
  */
object IncrementalOps {

  /** Classify every key across two snapshots: `insert` (new only),
    * `delete` (old only), `update` (both, some compared column differs),
    * `unchanged` (both, all compared columns null-safe equal — dropped
    * unless `keepUnchanged`). One full-outer join on the key; compared
    * columns are surfaced as `old_<c>` / `new_<c>` so downstream sinks can
    * apply the delta without re-reading either snapshot.
    *
    * Null-safe comparison (`<=>`) throughout: a column transitioning
    * to/from NULL is an update, not an accidental `unchanged`.
    */
  def snapshotDiff(
      oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String],
      keepUnchanged: Boolean = false): DataFrame = {
    val o = oldSnap.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("_old", lit(1))
      .select(keyCols.map(col) ++
        compareCols.map(c => col(c).as(s"old_$c")) :+ col("_old"): _*)
    val n = newSnap.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("_new", lit(1))
      .select(keyCols.map(col) ++
        compareCols.map(c => col(c).as(s"new_$c")) :+ col("_new"): _*)
    val joined = o.join(n, keyCols, "full_outer")
    val differs = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val classified = joined.withColumn("change_type",
      when(col("_old").isNull, "insert")
        .when(col("_new").isNull, "delete")
        .when(differs, "update")
        .otherwise("unchanged"))
    val out =
      if (keepUnchanged) classified
      else classified.filter(col("change_type") =!= "unchanged")
    out.select(keyCols.map(col) ++ Seq(col("change_type")) ++
      compareCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** Apply an update batch to a Type-2 slowly-changing dimension.
    *
    * `dim` carries full history: key + tracked attributes + `valid_from`,
    * `valid_to` (NULL = the open, current version). `updates` carries one
    * row per key (the latest observed attributes). Semantics, per key in
    * the batch:
    *  - attributes differ from the open version → the open row CLOSES
    *    (`valid_to` = `effectiveTs`) and a new open row appends;
    *  - attributes null-safe equal → no-op (re-delivering a batch never
    *    grows history — idempotent like [[graft.pipeline.Sinks.mergeFrames]]);
    *  - key unseen → a new open row appends.
    * Closed history rows pass through untouched, ever — that is the Type-2
    * invariant (history is immutable; only the open generation moves).
    *
    * Plan shape: closed rows are a filter pass-through (no join); the open
    * generation joins the batch once on the key (full-outer, so unseen
    * keys and untouched keys fall out of the same join), then one
    * projection per output branch. Updates are assumed key-unique — dedupe
    * upstream with keep-last ordinal semantics if the source re-delivers.
    */
  def scdType2Apply(
      dim: DataFrame, updates: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String],
      effectiveTs: Column): DataFrame = {
    val closed = dim.filter(col("valid_to").isNotNull)
    val open = dim.filter(col("valid_to").isNull)

    val u = updates.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"u_$c")): _*)
      .withColumn("_u", lit(1))
    val o = open.select(keyCols.map(col) ++
      compareCols.map(col) :+ col("valid_from"): _*)
      .withColumn("_o", lit(1))
    val j = o.join(u, keyCols, "full_outer")
    val differs = compareCols
      .map(c => !(col(c) <=> col(s"u_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))

    // open rows that survive as-is: key not in batch, or batch equal
    val keptOpen = j.filter(col("_o").isNotNull &&
        (col("_u").isNull || !differs))
      .select(keyCols.map(col) ++ compareCols.map(col) ++
        Seq(col("valid_from"), lit(null).cast("timestamp").as("valid_to")): _*)
    // open rows the batch changes: close them at the effective timestamp
    val newlyClosed = j.filter(col("_o").isNotNull && col("_u").isNotNull && differs)
      .select(keyCols.map(col) ++ compareCols.map(col) ++
        Seq(col("valid_from"), effectiveTs.cast("timestamp").as("valid_to")): _*)
    // the replacement generation + brand-new keys: open from the batch
    val newOpen = j.filter(col("_u").isNotNull && (col("_o").isNull || differs))
      .select(keyCols.map(col) ++
        compareCols.map(c => col(s"u_$c").as(c)) ++
        Seq(effectiveTs.cast("timestamp").as("valid_from"),
          lit(null).cast("timestamp").as("valid_to")): _*)

    closed.select(keyCols.map(col) ++ compareCols.map(col) ++
        Seq(col("valid_from"), col("valid_to")): _*)
      .unionByName(keptOpen)
      .unionByName(newlyClosed)
      .unionByName(newOpen)
  }

  /** Groups whose aggregates a [[snapshotDiff]] change set dirties: every
    * old AND new value of the grouping column mentioned by the delta. A
    * group is touched when rows arrive, leave, change in place, or MOVE
    * between groups — a move dirties both the source and the destination
    * group, which is why both sides of the diff contribute. `groupCol`
    * must be among the diff's compared columns.
    *
    * Sides are selected by `change_type`, not by null-filtering: an
    * insert has no old side and a delete no new side (those NULLs mean
    * "absent", not "the NULL group"), while a genuinely NULL-valued group
    * IS a group Spark aggregates and must be refreshable like any other. */
  def touchedGroups(diff: DataFrame, groupCol: String): DataFrame =
    diff.filter(col("change_type").isin("delete", "update"))
      .select(col(s"old_$groupCol").as(groupCol))
      .unionByName(
        diff.filter(col("change_type").isin("insert", "update"))
          .select(col(s"new_$groupCol").as(groupCol)))
      .distinct()

  /** Incremental aggregate-view maintenance: refresh a per-group aggregate
    * table after a snapshot delta WITHOUT rescanning the unchanged groups.
    *
    *   newAgg = (prevAgg anti-join touched) ∪ agg(newSnap semi-join touched)
    *
    * Untouched groups keep their previous row verbatim; touched groups are
    * recomputed from the new snapshot only for the rows the semi-join
    * keeps. Groups that lose every row correctly vanish (anti-join drops
    * the stale row, the recompute emits nothing). With exact accumulators
    * (counts, DECIMAL sums) the result is bit-identical to aggregating the
    * full new snapshot — which is exactly what the
    * `agg_incremental_update` gate's oracle asserts.
    *
    * Cost at 100 TB: one semi-join of the snapshot against the (small)
    * touched-group set plus one aggregate over just those groups' rows —
    * delta-proportional, never a full-table rescan. With the snapshot and
    * aggregate table bucketed on the group key the joins co-locate with
    * zero exchanges. `aggs` must produce the same column names as
    * `prevAgg` for the union to line up. */
  def incrementalAggUpdate(
      prevAgg: DataFrame, newSnap: DataFrame, touched: DataFrame,
      groupCols: Seq[String], aggs: Seq[Column]): DataFrame = {
    // null-safe joins throughout: a NULL-valued group is a real group in
    // Spark aggregation, and plain equi-joins would never match it —
    // leaving its stale aggregate in place forever
    val t = touched
      .select(groupCols.map(c => col(c).as(s"_t_$c")): _*).distinct()
    val antiCond = groupCols.map(c => prevAgg(c) <=> t(s"_t_$c")).reduce(_ && _)
    val kept = prevAgg.join(t, antiCond, "left_anti")
    val semiCond = groupCols.map(c => newSnap(c) <=> t(s"_t_$c")).reduce(_ && _)
    val recomputed = newSnap
      .join(t, semiCond, "left_semi")
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    kept.unionByName(recomputed)
  }

  /** Type-2 dimension COMPACTION: merge runs of consecutive versions whose
    * attributes never actually changed. Re-delivered batches, effective-ts
    * churn, and per-batch "touch" updates all leave a dimension with
    * adjacent rows [t0,t1)+[t1,t2) carrying identical attributes — pure
    * storage and join-fanout waste a maintenance pass reclaims. Two rows
    * merge iff they are the SAME key, attribute-identical (null-safe), and
    * temporally adjacent (prev.valid_to = next.valid_from — a gap means
    * the key genuinely left the dimension and returned; compaction must
    * not erase the absence).
    *
    * Islands discipline ([[graft.ops.IntervalOps]]'s shape on version
    * history): per key in valid_from order, a row starts a new island when
    * its attributes differ from the previous row's OR the history has a
    * gap; island id = running sum of the start flags; one rollup per
    * island takes min(valid_from) and the open-aware end (any open row →
    * island stays open). All within-key windows + one keyed rollup —
    * partition-parallel, no corpus-global state, and idempotent
    * (compacting a compacted dimension is the identity, spec-pinned).
    *
    * @return one row per maximal run: keyCols ++ attrCols ++
    *         (`valid_from`, `valid_to` — null if the run is open)
    */
  def scd2Compact(
      dim: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("valid_from"))
    val cur = struct(attrCols.map(col): _*)
    val islands = dim
      .withColumn("_rn", row_number().over(w))
      .withColumn("_pvt", lag(col("valid_to"), 1).over(w))
      .withColumn("_pat", lag(cur, 1).over(w))
      .withColumn("_new",
        when(col("_rn") === 1, 1L)
          .when(col("_pvt").isNull || col("_pvt") =!= col("valid_from"), 1L)
          .when(!(col("_pat") <=> cur), 1L)
          .otherwise(0L))
      .withColumn("_isl", sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // attributes are identical within an island by construction, so
    // min() per attr just reads the shared value
    val aggCols: Seq[Column] =
      attrCols.map(c => min(col(c)).as(c)) ++ Seq(
        min(col("valid_from")).as("valid_from"),
        max(when(col("valid_to").isNull, 1L).otherwise(0L)).as("_open"),
        max(col("valid_to")).as("_vt"))
    islands
      .groupBy((keyCols.map(col) :+ col("_isl")): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .select(keyCols.map(col) ++ attrCols.map(col) ++ Seq(
        col("valid_from"),
        when(col("_open") === 1L, lit(null).cast("timestamp"))
          .otherwise(col("_vt")).as("valid_to")): _*)
  }
}
