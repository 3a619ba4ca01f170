package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, T}

/** Plan-shape invariants for the corpus operators — the properties that
  * make them safe at 100 TB, asserted on the actual physical plan. */
class CorpusPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("sampling and chunking are shuffle-free narrow plans") {
    val sampled = CorpusOps.sampleByHash(
      T(spark, sf, "documents"), "doc_id", 0.5, "s")
    val chunked = CorpusOps.chunkDocs(
      T(spark, sf, "documents"), "doc_id", "text", 32, 8)
    for ((df, what) <- Seq((sampled, "sampleByHash"), (chunked, "chunkDocs"))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"$what must not shuffle — it's a per-row transform:\n$plan")
    }
  }

  test("hash-threshold sample prunes columns at the scan") {
    val pruned = CorpusOps.sampleByHash(
        T(spark, sf, "documents"), "doc_id", 0.37, "s1")
      .select("doc_id", "lang")
    val scan = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scan.contains("doc_id") && scan.contains("lang") &&
      !scan.contains("text"),
      s"scan must read only the projected columns, never text:\n$scan")
  }

  test("split assignment is a single codegen'd projection") {
    val split = CorpusOps.assignSplit(T(spark, sf, "documents"), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "s")
    val plan = split.queryExecution.executedPlan.toString
    // "*(N) Project" = inside whole-stage-codegen stage N
    assert(plan.contains("*(1) Project"), s"expected codegen'd projection:\n$plan")
    assert(!plan.contains("Exchange"), s"no shuffle for a projection:\n$plan")
  }

  test("pack_sequences shuffles exactly once (the shard window)") {
    val packed = graft.Registry.queryMap("corpus_pack_sequences")(spark, sf)
    val n = packed.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    // one hash-partition exchange for the per-shard window; the final
    // ORDER BY adds one range exchange — anything more means the window
    // or the split assignment introduced an unplanned shuffle.
    assert(n <= 2, s"expected <=2 exchanges (window + order), got $n")
  }

  test("token-budget mix: corpus side joins the totals by broadcast, no corpus shuffle") {
    import org.apache.spark.sql.functions.{col, size, split}
    val df = T(spark, sf, "documents")
      .withColumn("n_tokens", size(split(col("text"), " +")).cast("long"))
    val plan = CorpusOps
      .sampleToTokenBudget(df, "doc_id", "source", col("n_tokens"), 800L, "b")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"per-stratum totals must broadcast back, not shuffle the corpus:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the corpus side must never shuffle for the totals join:\n$plan")
  }

  test("segment dedup: hot-segment guard is a broadcast anti-join") {
    val plan = CorpusOps
      .dedupSegments(T(spark, sf, "documents"), "doc_id", "text", 8, 2)
      .queryExecution.executedPlan.toString
    // the >maxFreq segment set is tiny by construction — the guard must
    // plan as BroadcastHashJoin LeftAnti, not a shuffled anti-join
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"hot-segment guard must broadcast:\n$plan")
  }
}
