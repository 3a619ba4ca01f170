package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("connected components: path graph (diameter > 1) and separate clique") {
    import spark.implicits._
    // Path 1-2-3-4-5 (diameter 4 forces multiple propagation rounds),
    // plus disjoint pair 10-11; edges in arbitrary orientation.
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (11L, 10L))
      .toDF("a", "b")
    val got = GraphOps.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connected components: empty edge list converges to empty output") {
    import spark.implicits._
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(GraphOps.connectedComponents(edges, "a", "b").isEmpty)
  }

  test("keepClusterRepresentatives keeps min-id per cluster, untouched rows survive") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 99L).toDF("id")
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (11L, 10L))
      .toDF("a", "b")
    val kept = GraphOps.keepClusterRepresentatives(df, "id", pairs)
      .as[Long].collect().sorted.toSeq
    // cluster {1..5} -> keep 1; cluster {10,11} -> keep 10; 99 untouched
    assert(kept == Seq(1L, 10L, 99L))
  }
}
