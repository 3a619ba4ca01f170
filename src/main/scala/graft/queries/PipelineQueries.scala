package graft.queries

import graft.Q

/** GitHub-pipeline-shaped queries (UUIDv5 keys, labels/topics array ops,
  * FK-resolution) phrased over testdata. Populated with the pipeline build. */
object PipelineQueries {
  val all: Seq[Q] = Seq()
}
