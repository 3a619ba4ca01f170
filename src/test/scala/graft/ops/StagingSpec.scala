package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Reliable-checkpoint mode ([[Staging]]): the same iterative operators,
  * pinned to the checkpoint FILESYSTEM instead of executor-local blocks —
  * the cluster hardening for executor loss. Results must be identical in
  * both modes; only block durability changes. */
class StagingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def withReliable[A](body: => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft_reliable_cp")
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.conf.set(Staging.ReliableKey, "true")
    try body
    finally {
      spark.conf.unset(Staging.ReliableKey)
      // ls includes the per-app subdir Spark creates; leave files for the
      // temp reaper — the assertion below only needs them to EXIST
    }
  }

  test("iterative ops produce identical results under reliable checkpoints") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 3L), (9L, 10L), (10L, 5L))
    val rows = (1L to 50L).map(i => (i, (i * 7 % 13).toDouble))

    val ccLocal = GraphOps.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    val rnLocal = StatOps
      .globalRowNumber(rows.toDF("id", "v"), Seq(col("v"), col("id")), "rn")
      .select("id", "rn").as[(Long, Long)].collect().toMap
    def brandes() = {
      val (bw, eb) = GraphOps.landmarkBrandesUnits(
        edges.toDF("a", "b"), "a", "b",
        Seq(1L, 9L).toDF("id"), "id", maxHops = 3)
      (bw.as[(Long, Long)].collect().toMap,
        eb.as[(Long, Long, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap)
    }
    val brLocal = brandes()

    val (ccRel, rnRel, brRel, cpFiles) = withReliable {
      val cc = GraphOps.connectedComponents(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      val rn = StatOps
        .globalRowNumber(rows.toDF("id", "v"), Seq(col("v"), col("id")), "rn")
        .select("id", "rn").as[(Long, Long)].collect().toMap
      val br = brandes()
      val cpDir = new java.io.File(
        new java.net.URI(spark.sparkContext.getCheckpointDir.get))
      def count(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(count).sum else 1
      (cc, rn, br, count(cpDir))
    }
    assert(ccRel == ccLocal)
    assert(rnRel == rnLocal)
    assert(brRel == brLocal)
    assert(cpFiles > 0, "reliable mode wrote nothing to the checkpoint dir")
  }

  test("reliable mode preconditions fail fast at the driver") {
    import spark.implicits._
    // the guard is exercised through pinReliable's explicit parameters —
    // a context-level checkpoint dir can never be UNSET on the shared
    // session, so driving it through pin() would be order-dependent
    // (whichever test set the dir first would make this branch dead)
    val fresh = Seq((1L, 2L)).toDF("a", "b")
    val noDir = intercept[IllegalArgumentException] {
      Staging.pinReliable(fresh, dirDefined = false, cleanerEnabled = true)
    }
    assert(noDir.getMessage.contains("setCheckpointDir"))
    val noCleaner = intercept[IllegalArgumentException] {
      Staging.pinReliable(fresh, dirDefined = true, cleanerEnabled = false)
    }
    assert(noCleaner.getMessage.contains("cleanCheckpoints"))
  }
}
