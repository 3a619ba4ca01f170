package graft.queries

import graft.Q

/** Similarity search over `embeddings`: brute-force cosine top-k baseline +
  * LSH-bucketed scale path. */
object SimilarityQueries {
  val all: Seq[Q] = Seq()
}
