package graft.ops

import org.apache.spark.sql.DataFrame

/** Size-bounded, access-ordered (LRU) memo cache for staged persisted
  * DataFrames — the policy behind [[DedupOps.sharedShingles]],
  * [[DedupOps.sharedNgramJaccardPairs]] and
  * [[GraphOps.sharedComponents]].
  *
  * An unbounded DataFrame-keyed map would pin executor storage forever in
  * a long-lived session that touches many corpora / parameter combos
  * (each staged frame holds persisted blocks). Bounding with
  * unpersist-on-evict caps that at `maxEntries` frames per cache while
  * keeping the materialize-once-per-snapshot behavior for the hot keys.
  *
  * Evicting a frame a downstream plan still references is safe — Spark
  * recomputes unpersisted lineage — it just loses the staging speedup, so
  * the bound should comfortably exceed the number of corpus snapshots a
  * session works with (default 8 at the call sites).
  */
final class BoundedDfCache[K](maxEntries: Int, racingPlansIdentical: Boolean = true) {
  require(maxEntries > 0, "cache bound must be positive")

  private val map =
    new java.util.LinkedHashMap[K, DataFrame](16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(e: java.util.Map.Entry[K, DataFrame]): Boolean =
        if (size() > maxEntries) { e.getValue.unpersist(); true } else false
    }

  /** Memoized lookup. `make` runs OUTSIDE the lock: building a staged
    * frame can itself run Spark jobs (connected components checkpoints
    * per round), and holding a cache-wide monitor through that would
    * serialize unrelated corpora behind one computation. The cost is a
    * benign race — two threads missing on the same key both build, the
    * loser's frame is simply dropped. `make` must be deterministic per
    * key (all call sites build the same plan from the key), so the
    * racing persist() calls land on ONE CacheManager entry — which is
    * also why the loser must NOT be unpersisted when
    * `racingPlansIdentical` (the default): Spark caches by logical plan,
    * and unpersisting the identical-plan loser would silently uncache
    * the winner too. Caches whose frames are backed by run-unique
    * lineage (e.g. [[GraphOps.sharedComponents]] — each run checkpoints
    * fresh RDDs, so two racing builds have DISTINCT plans) must pass
    * `racingPlansIdentical = false`; there the loser's plan is its own
    * CacheManager entry and NOT unpersisting it would leak its storage
    * until session end. */
  def getOrElseUpdate(k: K)(make: => DataFrame): DataFrame = {
    synchronized {
      val cur = map.get(k)
      if (cur != null) return cur
    }
    val v = make
    synchronized {
      val cur = map.get(k)
      if (cur != null) {
        if (!racingPlansIdentical) v.unpersist()
        cur
      } else {
        map.put(k, v)
        v
      }
    }
  }

  def size: Int = synchronized(map.size())

  /** Unpersist and drop everything (test hygiene / session teardown). */
  def clear(): Unit = synchronized {
    map.values.forEach(df => { df.unpersist(); () })
    map.clear()
  }
}
