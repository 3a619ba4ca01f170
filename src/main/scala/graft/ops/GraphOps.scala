package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph operators for duplicate-cluster resolution (SURVEY §7.4 endgame).
  *
  * Near-dup operators ([[DedupOps]]) emit *pairs*; acting on them at scale
  * requires grouping pairs into clusters and keeping one representative per
  * cluster — a connected-components problem over the pair graph.
  *
  * The implementation is iterative min-label propagation ("hash-to-min"):
  * every node starts labeled with its own id; each round every node takes
  * the minimum label in its closed neighborhood; fixpoint = every node
  * carries the minimum id of its component. Each round is ONE shuffle join
  * (edges x labels) plus one partial+final min-aggregate, and rounds are
  * bounded by the graph diameter. Near-dup graphs are band-clique unions
  * (LSH candidates within a band form cliques), so the diameter — and the
  * round count — is a small constant in practice; for adversarial
  * high-diameter graphs at 100 TB the known remedy is alternating
  * large-star/small-star contraction (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14) which converges in
  * O(log n) rounds with the same per-round join shape — the propagation
  * loop below is deliberately structured so a star-contraction step could
  * replace the body without touching callers.
  *
  * Every round persists its label frame and materializes it before the
  * convergence check, so plans stay one-round shallow (no lineage growth
  * across iterations) and the convergence predicate (`labels changed?`)
  * reads two cached frames. The driver-side loop holds only iteration
  * state, never data.
  */
object GraphOps {

  /** Connected components of the undirected graph given as an edge list.
    *
    * @return one row per distinct node id appearing in `edges`:
    *         (`id`, `component`) with `component` = min reachable node id.
    *         Nodes absent from `edges` (singletons) are the caller's
    *         concern — they are their own component by definition.
    */
  def connectedComponents(
      edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    val sym = edges
      .select(col(aCol).as("u"), col(bCol).as("v"))
      .union(edges.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = sym
      .select(col("u").as("id"))
      .distinct()
      .select(col("id"), col("id").as("component"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count()

    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      // Label of u flows across every edge (u, v); union the node's own
      // label so components never lose their minimum (closed neighborhood).
      val next = sym
        .join(labels.withColumnRenamed("id", "u"), "u")
        .select(col("v").as("id"), col("component"))
        .union(labels)
        .groupBy("id")
        .agg(min("component").as("component"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      converged = next.as("n")
        .join(labels.as("o"), "id")
        .filter(col("n.component") =!= col("o.component"))
        .isEmpty
      labels.unpersist()
      labels = next
      round += 1
    }
    sym.unpersist()
    require(converged,
      s"connectedComponents: no fixpoint after $maxIter rounds " +
        "(graph diameter exceeds the bound; raise maxIter or switch the " +
        "loop body to star contraction)")
    labels
  }

  /** Keep one representative (the min-id member) per duplicate cluster:
    * drops every row of `df` whose id is a non-representative member of a
    * connected component of `pairs`. Rows never mentioned in `pairs`
    * survive untouched. The dropped-id set is tiny relative to the corpus
    * (it is bounded by the number of near-dup pair members), so the
    * anti-join broadcasts at any scale where dedup is sane.
    */
  def keepClusterRepresentatives(
      df: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String = "a", bCol: String = "b"): DataFrame = {
    val losers = connectedComponents(pairs, aCol, bCol)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(broadcast(losers), Seq(idCol), "left_anti")
  }
}
