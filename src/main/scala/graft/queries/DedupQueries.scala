package graft.queries

import graft.Q

/** Deduplication battery over `documents`: exact, MinHash-LSH, SimHash,
  * n-gram Jaccard, embedding-cosine near-dup. */
object DedupQueries {
  val all: Seq[Q] = Seq()
}
