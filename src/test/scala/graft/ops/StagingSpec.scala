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

  test("pin caps inflated origin stats on the checkpoint leaf") {
    // Direct unit assert for GraftColumnBridge.withCappedOriginStats —
    // until now the cap was proven only indirectly through PERF timings
    // (pagerank@5M 31.6 → 7.3 s), so a Spark upgrade breaking the
    // private[sql] LogicalRDD re-seat would resurface as a slow test
    // suite, not a failing test. The size-only stats visitor MULTIPLIES
    // child sizeInBytes across a join, so three self-joins of a pinned
    // 2^20-row long frame (~2^23 bytes each) estimate at ~2^69 — past
    // the 2^60 cap — while the actual joined data stays 2^20 rows.
    import org.apache.spark.sql.GraftColumnBridge
    val cap = BigInt(1) << 60
    val base = Staging.pin(spark.range(1L << 20).toDF("id"))
    val joined = base
      .join(base.withColumnRenamed("id", "id2"), col("id") === col("id2"))
      .join(base.withColumnRenamed("id", "id3"), col("id") === col("id3"))
      .filter(col("id") >= 0L)
      .select("id")
    val pre = GraftColumnBridge.freshOptimizedStats(joined).sizeInBytes
    assert(pre > cap,
      s"precondition: the join plan must estimate past the cap, got $pre")
    val pinned = Staging.pin(joined)
    val leaf = pinned.queryExecution.analyzed
    assert(leaf.children.isEmpty, "pin must produce a leaf plan")
    val capped = GraftColumnBridge.freshOptimizedStats(pinned)
    assert(capped.sizeInBytes <= cap,
      s"capped leaf still reports sizeInBytes ${capped.sizeInBytes}")
    assert(capped.rowCount.forall(_ <= cap))
    // the cap re-seat must PRESERVE origin constraints (not drop them to
    // None): the pre-pin filter's not-null/range facts stay on the leaf
    assert(leaf.constraints.nonEmpty,
      "capped leaf lost its origin constraints")
    // and a small pinned frame keeps its realistic estimate untouched —
    // stripping stats was measured 4x on hitsUnits when pinned frames
    // lost their broadcast-hash joins
    val small = Staging.pin(spark.range(100).toDF("id"))
    val s = GraftColumnBridge.freshOptimizedStats(small)
    assert(s.sizeInBytes > 0 && s.sizeInBytes < 1000000,
      s"small pinned frame should keep a realistic estimate, got ${s.sizeInBytes}")
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
