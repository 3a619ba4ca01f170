package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bucketed range join == exact inequality join, including multi-bucket intervals") {
    import spark.implicits._
    val pts = Seq(
      (1L, "2026-01-01 00:00:00"),
      (2L, "2026-01-01 00:59:59"),
      (3L, "2026-01-01 01:00:00"),
      (4L, "2026-01-01 03:30:00"),
      (5L, "2026-01-01 07:00:01"))
      .toDF("pid", "t").select(col("pid"), to_timestamp(col("t")).as("ts"))
    // intervals: zero-length, 1-bucket, and one spanning 4 bucket borders
    val ivs = Seq(
      (10L, "2026-01-01 00:59:59", "2026-01-01 00:59:59"),
      (20L, "2026-01-01 00:30:00", "2026-01-01 01:15:00"),
      (30L, "2026-01-01 00:00:00", "2026-01-01 03:59:00"))
      .toDF("iid", "s", "e")
      .select(col("iid"), to_timestamp(col("s")).as("w_start"),
        to_timestamp(col("e")).as("w_end"))

    val bucketed = RangeJoin
      .pointInInterval(pts, ivs, "ts", "w_start", "w_end", bucketSecs = 3600L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pts.crossJoin(ivs)
      .filter(col("ts") >= col("w_start") && col("ts") <= col("w_end"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(bucketed == naive)
    assert(naive == Set((2L, 10L), (2L, 20L), (3L, 20L),
      (1L, 30L), (2L, 30L), (3L, 30L), (4L, 30L)))
  }

  test("randomized equivalence: 200 points x 50 intervals, odd bucket width") {
    import spark.implicits._
    val rng = new scala.util.Random(20260812L)
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    def ts(offsetSec: Long) = new java.sql.Timestamp(base + offsetSec * 1000L)
    val pts = (1 to 200).map(i => (i.toLong, ts(rng.nextInt(86400).toLong)))
      .toDF("pid", "ts")
    val ivs = (1 to 50).map { i =>
      val s = rng.nextInt(86400).toLong
      (i.toLong, ts(s), ts(s + rng.nextInt(14400).toLong)) // up to 4 h long
    }.toDF("iid", "w_start", "w_end")

    // 1017 s: deliberately no divisor relationship with interval lengths,
    // so intervals straddle bucket borders in every alignment
    val bucketed = RangeJoin
      .pointInInterval(pts, ivs, "ts", "w_start", "w_end", bucketSecs = 1017L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pts.crossJoin(ivs)
      .filter(col("ts") >= col("w_start") && col("ts") <= col("w_end"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive)
    assert(naive.nonEmpty, "seeded data should produce at least one match")
  }

  test("a point joins a covering interval exactly once (no bucket-replica dupes)") {
    import spark.implicits._
    val pts = Seq((1L, "2026-01-01 02:00:00")).toDF("pid", "t")
      .select(col("pid"), to_timestamp(col("t")).as("ts"))
    val ivs = Seq((9L, "2026-01-01 00:00:00", "2026-01-01 05:00:00"))
      .toDF("iid", "s", "e")
      .select(col("iid"), to_timestamp(col("s")).as("w_start"),
        to_timestamp(col("e")).as("w_end"))
    val out = RangeJoin.pointInInterval(pts, ivs, "ts", "w_start", "w_end", 3600L)
    assert(out.count() == 1)
  }
}
