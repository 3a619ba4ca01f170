package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of picks the latest right row at or before each left time") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2026-01-01 00:00:05")),
      (2L, 10L, ts("2026-01-01 00:00:10")),
      (3L, 10L, ts("2026-01-01 00:00:02")), // before any right row
      (4L, 20L, ts("2026-01-01 00:00:10"))) // exact-match time
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2026-01-01 00:00:03"), 100L),
      (10L, ts("2026-01-01 00:00:07"), 101L),
      (20L, ts("2026-01-01 00:00:10"), 200L)) // equal ts counts (<=)
      .toDF("user_id", "click_ts", "click_id")

    val out = AsOfJoin.asOf(left, right, "user_id", "ts", "click_ts",
      Seq("click_id" -> "click_id", "click_ts" -> "click_ts"))
      .orderBy("event_id")
      .collect()

    val got = out.map(r => (r.getLong(0),
      Option(r.get(3)).map(_.asInstanceOf[Long]))).toSeq
    assert(got == Seq(
      (1L, Some(100L)), // 00:05 -> right at 00:03
      (2L, Some(101L)), // 00:10 -> right at 00:07
      (3L, None),       // 00:02 -> nothing at or before
      (4L, Some(200L)))) // equal timestamp joins (<= semantics)
  }

  test("as-of carries a genuinely NULL newest payload, not a stale older one") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // right state: v=5 at 00:01, then v goes NULL at 00:02 (e.g. a field
    // cleared in the source) — a probe at 00:03 must see NULL, not 5
    val right = Seq(
      (1L, ts("2026-01-01 00:00:01"), Option(5L)),
      (1L, ts("2026-01-01 00:00:02"), Option.empty[Long]))
      .toDF("k", "rts", "v")
    val left = Seq((1L, ts("2026-01-01 00:00:03"), "probe"))
      .toDF("k", "lts", "tag")
    val out = AsOfJoin.asOf(left, right, "k", "lts", "rts",
      Seq("v" -> "v", "rts" -> "state_ts")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.isNullAt(r.fieldIndex("v")),
      "the newest state's NULL value must win over the older non-null")
    assert(r.getTimestamp(r.fieldIndex("state_ts")) == ts("2026-01-01 00:00:02"),
      "the carried row is still the newest one")
  }

  test("forward as-of picks the earliest right row at or after each left time") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2026-01-01 00:00:05")),
      (2L, 10L, ts("2026-01-01 00:00:01")),
      (3L, 10L, ts("2026-01-01 00:00:08")), // after every right row
      (4L, 20L, ts("2026-01-01 00:00:10"))) // exact-match time
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2026-01-01 00:00:03"), 100L),
      (10L, ts("2026-01-01 00:00:07"), 101L),
      (20L, ts("2026-01-01 00:00:10"), 200L)) // equal ts counts (>=)
      .toDF("user_id", "click_ts", "click_id")

    val out = AsOfJoin.asOfForward(left, right, "user_id", "ts", "click_ts",
      Seq("click_id" -> "click_id", "click_ts" -> "click_ts"))
      .orderBy("event_id")
      .collect()

    val got = out.map(r => (r.getLong(0),
      Option(r.get(3)).map(_.asInstanceOf[Long]))).toSeq
    assert(got == Seq(
      (1L, Some(101L)), // 00:05 -> next right at 00:07
      (2L, Some(100L)), // 00:01 -> next right at 00:03
      (3L, None),       // 00:08 -> nothing at or after
      (4L, Some(200L)))) // equal timestamp joins (>= semantics)
  }

  test("forward as-of carries the earliest following NULL payload as NULL") {
    import spark.implicits._
    // next state after the probe is NULL-valued; an older following
    // non-null (00:04) must NOT leapfrog it
    val right = Seq(
      (1L, ts("2026-01-01 00:00:02"), Option.empty[Long]),
      (1L, ts("2026-01-01 00:00:04"), Option(5L)))
      .toDF("k", "rts", "v")
    val left = Seq((1L, ts("2026-01-01 00:00:01"), "probe"))
      .toDF("k", "lts", "tag")
    val out = AsOfJoin.asOfForward(left, right, "k", "lts", "rts",
      Seq("v" -> "v", "rts" -> "state_ts")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.isNullAt(r.fieldIndex("v")),
      "the earliest following state's NULL value must win")
    assert(r.getTimestamp(r.fieldIndex("state_ts")) == ts("2026-01-01 00:00:02"),
      "the carried row is the earliest following one")
  }

  test("salted aggregation equals direct groupBy exactly") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 7L, i * 1.01)).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("v").cast("decimal(18,4)")).cast("double").as("total_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = SkewOps.saltedCountSum(df, "k", "v", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct)
  }
}
