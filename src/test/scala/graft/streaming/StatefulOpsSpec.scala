package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Custom keyed state across micro-batches: the counter must carry over
  * batch boundaries and reset on 'purchase'. */
class StatefulOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("events-since-purchase state survives across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 00:00:$sec%02d")

    val input = MemoryStream[StatefulOps.Ev]
    val out = StatefulOps.eventsSinceLastPurchase(input.toDS())
    val q = out.writeStream.format("memory").queryName("state_out")
      .outputMode(OutputMode.Append).start()

    input.addData(
      StatefulOps.Ev(1L, ts(1), "click"),
      StatefulOps.Ev(1L, ts(2), "view"),
      StatefulOps.Ev(2L, ts(1), "purchase"))
    q.processAllAvailable()
    input.addData(
      StatefulOps.Ev(1L, ts(3), "purchase"), // resets user 1
      StatefulOps.Ev(1L, ts(4), "click"),    // 1 after reset
      StatefulOps.Ev(2L, ts(5), "click"))    // 1 after batch-1 purchase
    q.processAllAvailable()

    val rows = spark.sql("SELECT user_id, ts, events_since_purchase FROM state_out")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.substring(17, 19), r.getLong(2)))
      .toSet
    q.stop()
    assert(rows == Set(
      (1L, "01", 1L), (1L, "02", 2L), (2L, "01", 0L),
      (1L, "03", 0L), (1L, "04", 1L), (2L, "05", 1L)))
  }

  test("streaming EWMA equals the batch operator for any batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 00:00:$sec%02d")
    val evs = Seq(
      StatefulOps.ValEv(1L, ts(1), 1L, 8.0),
      StatefulOps.ValEv(1L, ts(2), 2L, 4.0),
      StatefulOps.ValEv(2L, ts(1), 3L, 6.0),
      StatefulOps.ValEv(1L, ts(3), 4L, 2.0),
      StatefulOps.ValEv(2L, ts(4), 5L, 10.0))

    val input = MemoryStream[StatefulOps.ValEv]
    val out = StatefulOps.ewmaLevelStream(input.toDS(), alpha = 0.25)
    val q = out.writeStream.format("memory").queryName("ewma_out")
      .outputMode(OutputMode.Update).start()
    // split mid-stream for user 1: state must carry the level across
    input.addData(evs(0), evs(1), evs(2))
    q.processAllAvailable()
    input.addData(evs(3), evs(4))
    q.processAllAvailable()
    // LAST update per user = the final level
    val streamed = spark.sql(
      "SELECT user_id, n, last_value, ewma FROM ewma_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
      .groupBy(_._1).map { case (_, v) => v.maxBy(_._2) }.toSet
    q.stop()

    val batch = graft.ops.StatOps.ewmaLevel(
        evs.toDF(), "user_id", "ts", "event_id", "value", alpha = 0.25)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(streamed == batch, "stream/batch EWMA parity")
    // and the hand value: user 1 → 0.25*2 + 0.75*(0.25*4 + 0.75*8) = 5.75
    assert(streamed.exists(t => t._1 == 1L && t._4 == 5.75))
  }

  test("streaming Holt linear equals the batch operator for any batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 00:00:$sec%02d")
    val evs = Seq(
      StatefulOps.ValEv(1L, ts(1), 1L, 8.0),
      StatefulOps.ValEv(1L, ts(2), 2L, 4.0),
      StatefulOps.ValEv(2L, ts(1), 3L, 6.0),
      StatefulOps.ValEv(1L, ts(3), 4L, 2.0),
      StatefulOps.ValEv(2L, ts(4), 5L, 10.0))

    val input = MemoryStream[StatefulOps.ValEv]
    val out = StatefulOps.holtLinearStream(input.toDS(),
      alpha = 0.25, beta = 0.5)
    val q = out.writeStream.format("memory").queryName("holt_out")
      .outputMode(OutputMode.Update).start()
    // split MID-SERIES for user 1: level AND trend must carry across
    input.addData(evs(0), evs(1), evs(2))
    q.processAllAvailable()
    input.addData(evs(3), evs(4))
    q.processAllAvailable()
    val streamed = spark.sql(
      "SELECT user_id, n, level, trend, forecast1 FROM holt_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
      .groupBy(_._1).map { case (_, v) => v.maxBy(_._2) }.toSet
    q.stop()

    val batch = graft.ops.StatOps.holtLinear(
        evs.toDF(), "user_id", "ts", "event_id", "value",
        alpha = 0.25, beta = 0.5)
      .as[(Long, Long, Double, Double, Double)].collect().toSet
    assert(streamed == batch, "stream/batch Holt parity")
    // hand value: 8,4,2 @ (1/4, 1/2) → level 5.375, trend -1.0625
    assert(streamed.exists(t =>
      t._1 == 1L && t._3 == 5.375 && t._4 == -1.0625))
  }

  test("streaming CUSUM chart equals the batch operator for any batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 00:00:$sec%02d")
    // user 1 drifts up mid-series (alarm at i=3); user 2 dips below
    // target first (reset-through-zero), never alarms
    val evs = Seq(
      StatefulOps.ValEv(1L, ts(1), 1L, 10.0),
      StatefulOps.ValEv(1L, ts(2), 2L, 18.0),
      StatefulOps.ValEv(2L, ts(1), 3L, 5.0),
      StatefulOps.ValEv(1L, ts(3), 4L, 19.0),
      StatefulOps.ValEv(2L, ts(4), 5L, 16.0))

    val input = MemoryStream[StatefulOps.ValEv]
    val out = StatefulOps.cusumControlStream(input.toDS(),
      targetCents = 10L, slackCents = 0L, thresholdCents = 15L, scale = 1.0)
    val q = out.writeStream.format("memory").queryName("cusum_out")
      .outputMode(OutputMode.Update).start()
    // split MID-SERIES for both users: (s, minS, alarm index) carry across
    input.addData(evs(0), evs(1), evs(2))
    q.processAllAvailable()
    input.addData(evs(3), evs(4))
    q.processAllAvailable()
    val streamed = spark.sql(
      "SELECT user_id, n, g_final, g_max, first_alarm FROM cusum_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getInt(4))))
      .groupBy(_._1).map { case (_, v) => v.maxBy(_._2) }.toSet
    q.stop()

    val batch = graft.ops.StatOps.cusumControl(
        evs.toDF(), "user_id", "ts", "event_id", "value",
        targetCents = 10L, slackCents = 0L, thresholdCents = 15L,
        scale = 1.0)
      .as[(Long, Long, Long, Long, Option[Int])].collect().toSet
    assert(streamed == batch, "stream/batch CUSUM parity")
    // hand chart, user 1: x = 0, 8, 9 → g = 0, 8, 17 ≥ 15 at i = 3
    assert(streamed.exists(t =>
      t._1 == 1L && t._3 == 17L && t._4 == 17L && t._5 == Some(3)))
    // user 2: x = -5, 6 → g = 0, 6 (reset through zero), no alarm
    assert(streamed.exists(t =>
      t._1 == 2L && t._3 == 6L && t._4 == 6L && t._5 == None))
  }

  test("sessionizeStream: gap splits across batches, timeout flushes churned keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val input = MemoryStream[StatefulOps.ValEv]
    val out = StatefulOps.sessionizeStream(
      input.toDS().withWatermark("ts", "0 seconds"), gapSeconds = 10L)
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    // batch 1: user 1 opens a session (2 events inside the gap).
    // Timestamps start at 100s: the initial watermark is epoch 0 and
    // an event AT the watermark is dropped as late.
    input.addData(StatefulOps.ValEv(1L, ts(100), 1L, 0.0),
      StatefulOps.ValEv(1L, ts(105), 2L, 0.0))
    q.processAllAvailable()
    // batch 2: 35s jump closes [100, 105] and opens a session at 140
    input.addData(StatefulOps.ValEv(1L, ts(140), 3L, 0.0))
    q.processAllAvailable()
    // batch 3: another user far in the future advances the watermark
    // past 40 + gap -> user 1's open session flushes via TIMEOUT
    input.addData(StatefulOps.ValEv(2L, ts(10000), 4L, 0.0))
    q.processAllAvailable()
    input.addData(StatefulOps.ValEv(2L, ts(10001), 5L, 0.0))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT user_id, session_start, session_end, n_events FROM sess_out")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000L,
        r.getTimestamp(2).getTime / 1000L, r.getLong(3))).toSet
    q.stop()
    // user 2's session stays OPEN (watermark never passed it): absent
    assert(rows == Set((1L, 100L, 105L, 2L), (1L, 140L, 140L, 1L)))
  }

  test("sessionizeStream: within-watermark straggler extends a session BACKWARD") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val input = MemoryStream[StatefulOps.ValEv]
    // 1-hour watermark delay: a cross-batch out-of-order event is NOT
    // late, and must merge into the session it belongs to — the case
    // an emit-on-gap-jump design gets permanently wrong
    val out = StatefulOps.sessionizeStream(
      input.toDS().withWatermark("ts", "1 hour"), gapSeconds = 10L)
    val q = out.writeStream.format("memory").queryName("sess_ooo")
      .outputMode(OutputMode.Append).start()
    input.addData(StatefulOps.ValEv(3L, ts(1000), 1L, 0.0))
    q.processAllAvailable()
    // straggler 5s BEFORE the open session's start (within the gap)
    input.addData(StatefulOps.ValEv(3L, ts(995), 2L, 0.0))
    q.processAllAvailable()
    // far-future events push the watermark past end + gap twice
    input.addData(StatefulOps.ValEv(3L, ts(50000), 3L, 0.0))
    q.processAllAvailable()
    input.addData(StatefulOps.ValEv(3L, ts(60000), 4L, 0.0))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT user_id, session_start, session_end, n_events FROM sess_ooo")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000L,
        r.getTimestamp(2).getTime / 1000L, r.getLong(3))).toSet
    q.stop()
    assert(rows == Set((3L, 995L, 1000L, 2L), (3L, 50000L, 50000L, 1L)))
  }
}
