package graft.queries

import graft.Q

/** Multimodal (binary-column) plumbing: opaque payloads + typed metadata,
  * batched decode/feature-extract with a deterministic stub decoder. */
object MultimodalQueries {
  val all: Seq[Q] = Seq()
}
