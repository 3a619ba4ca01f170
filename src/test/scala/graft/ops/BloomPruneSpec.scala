package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The `bloom_semi_prune` gate proves the Bloom path is LOSSLESS (its
  * oracle is the plain semi join); this spec proves it actually PRUNES —
  * the reason the operator exists — and that the filter never drops a
  * true match on its own.
  */
class BloomPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bloom pre-filter passes all matches and prunes most non-matches") {
    import spark.implicits._
    // 10k fact keys, dim = 200 of them: 2% true selectivity
    val fact = spark.range(0L, 10000L).toDF("k")
    val dim = spark.range(0L, 10000L, 50L).toDF("dk") // 200 keys
    val bf = SketchOps.bloomFilterOf(dim, col("dk"),
      expectedItems = 200L, numBits = 4000L)

    val passed = fact
      .where(SketchOps.bloomMightContain(bf, col("k")))
      .select("k").as[Long].collect().toSet

    val trueMatches = (0L until 10000L by 50L).toSet
    assert(trueMatches.subsetOf(passed),
      "a Bloom filter must never produce a false negative")
    // at 20 bits/item the FPP is well under 1%; leave a wide margin so
    // the assertion survives any future hash/width change that keeps
    // the filter USEFUL (pruning >=90% of non-matching rows)
    assert(passed.size <= trueMatches.size + 1000,
      s"filter passed ${passed.size} of 10000 rows for 200 matches — not pruning")
  }

  test("bloomSemiJoin equals the exact semi join on skewed duplicates") {
    import spark.implicits._
    val fact = Seq(1L, 1L, 2L, 3L, 5L, 8L, 13L, 21L, 21L).toDF("k")
    val dim = Seq(1L, 21L, 99L).toDF("dk")
    val got = SketchOps
      .bloomSemiJoin(fact, dim, "k", "dk", 10L, 200L)
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 1L, 21L, 21L),
      "duplicates preserved, non-members dropped, absent dim keys ignored")
  }
}
