package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state over a stream: `flatMapGroupsWithState` — the
  * primitive for stateful logic Spark's built-in aggregations can't
  * express. Example operator: per-user "events since last purchase"
  * counter that survives across micro-batches (state = one Long per key;
  * memory is O(keys), independent of stream length). */
object StatefulOps {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  final case class SincePurchase(user_id: Long, ts: java.sql.Timestamp,
      events_since_purchase: Long)

  def eventsSinceLastPurchase(ds: Dataset[Ev]): Dataset[SincePurchase] = {
    implicit val outEnc = Encoders.product[SincePurchase]
    implicit val keyEnc = Encoders.scalaLong
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[Ev], state: GroupState[Long]) => {
          var n = state.getOption.getOrElse(0L)
          // micro-batch iterators carry no time order — impose it
          val ordered = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
          val out = ordered.map { e =>
            if (e.event_type == "purchase") n = 0L else n += 1L
            SincePurchase(uid, e.ts, n)
          }
          state.update(n)
          out.iterator
        })
  }

  final case class ValEv(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, value: Double)
  final case class EwmaState(n: Long, last: Double, ewma: Double)
  final case class EwmaLevel(user_id: Long, n: Long, last_value: Double,
      ewma: Double)

  /** Streaming twin of [[graft.ops.StatOps.ewmaLevel]]: the per-key
    * EWMA recurrence carried across micro-batches as O(1) state per
    * key (`sᵢ = α·xᵢ + (1−α)·sᵢ₋₁`, seeded at the first observation).
    * Within a micro-batch events are folded in (ts, event_id) order —
    * the SAME total order the batch operator pins — so for any
    * batch-boundary placement the emitted level equals the batch
    * result over the union of batches: the spec asserts that parity
    * exactly. Emits one updated level per key per micro-batch
    * (Update-mode semantics). */
  def ewmaLevelStream(
      ds: Dataset[ValEv], alpha: Double): Dataset[EwmaLevel] = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val beta = 1.0 - alpha
    implicit val outEnc = Encoders.product[EwmaLevel]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[EwmaState]
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[ValEv], state: GroupState[EwmaState]) => {
          val ordered = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          if (ordered.isEmpty) Iterator.empty
          else {
            var st = state.getOption.getOrElse(
              EwmaState(0L, 0.0, Double.NaN))
            ordered.foreach { e =>
              val s =
                if (st.n == 0L) e.value
                else alpha * e.value + beta * st.ewma
              st = EwmaState(st.n + 1L, e.value, s)
            }
            state.update(st)
            Iterator.single(EwmaLevel(uid, st.n, st.last, st.ewma))
          }
        })
  }

  final case class HoltState(n: Long, l: Double, b: Double)
  final case class HoltLevel(user_id: Long, n: Long, level: Double,
      trend: Double, forecast1: Double)

  /** Streaming twin of [[graft.ops.StatOps.holtLinear]]: the level+trend
    * recurrence carried across micro-batches as O(1) state per key,
    * folded within each batch in (ts, event_id) order — the identical
    * IEEE expression sequence as the batch operator (`α·x + (1−α)·(l+b)`
    * then `β·(l′−l) + (1−β)·b`), so for ANY batch-boundary placement the
    * emitted state equals the batch fold over the union of batches
    * (asserted exactly by the parity spec). Emits one updated
    * (level, trend, forecast) per key per micro-batch. */
  def holtLinearStream(
      ds: Dataset[ValEv], alpha: Double, beta: Double): Dataset[HoltLevel] = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta must be in [0, 1], got $beta")
    val a1 = 1.0 - alpha
    val g1 = 1.0 - beta
    implicit val outEnc = Encoders.product[HoltLevel]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[HoltState]
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[ValEv], state: GroupState[HoltState]) => {
          val ordered = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          if (ordered.isEmpty) Iterator.empty
          else {
            var st = state.getOption.getOrElse(HoltState(0L, 0.0, 0.0))
            ordered.foreach { e =>
              st =
                if (st.n == 0L) HoltState(1L, e.value, 0.0)
                else {
                  val newL = alpha * e.value + a1 * (st.l + st.b)
                  HoltState(st.n + 1L, newL,
                    beta * (newL - st.l) + g1 * st.b)
                }
            }
            state.update(st)
            Iterator.single(HoltLevel(uid, st.n, st.l, st.b, st.l + st.b))
          }
        })
  }

  final case class CusumState(n: Long, s: Long, minS: Long, gMax: Long,
      alarm: Long) // alarm = 0 until tripped (1-based index after)
  final case class CusumAlarm(user_id: Long, n: Long, g_final: Long,
      g_max: Long, first_alarm: Option[Int])

  /** Streaming twin of [[graft.ops.StatOps.cusumControl]]: the one-sided
    * CUSUM monitor as O(1) INTEGER state per key — (running drift sum,
    * running min incl. the empty prefix, max excursion, first-alarm
    * index). Integer arithmetic makes stream/batch parity EXACT by
    * construction, not just ulp-close: the spec asserts equality for an
    * arbitrary micro-batch split. Emits the current chart per key per
    * micro-batch — the shape an alerting sink consumes. */
  def cusumControlStream(
      ds: Dataset[ValEv], targetCents: Long, slackCents: Long,
      thresholdCents: Long, scale: Double = 100.0): Dataset[CusumAlarm] = {
    require(thresholdCents > 0,
      s"cusumControlStream: threshold must be > 0, got $thresholdCents")
    implicit val outEnc = Encoders.product[CusumAlarm]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[CusumState]
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[ValEv], state: GroupState[CusumState]) => {
          val ordered = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          if (ordered.isEmpty) Iterator.empty
          else {
            var st = state.getOption.getOrElse(CusumState(0L, 0L, 0L, 0L, 0L))
            ordered.foreach { e =>
              val x = math.floor(e.value * scale).toLong -
                targetCents - slackCents
              val s = st.s + x
              val minS = math.min(st.minS, s)
              val g = s - minS
              val n = st.n + 1L
              st = CusumState(n, s, minS, math.max(st.gMax, g),
                if (st.alarm == 0L && g >= thresholdCents) n else st.alarm)
            }
            state.update(st)
            Iterator.single(CusumAlarm(uid, st.n, st.s - st.minS, st.gMax,
              if (st.alarm == 0L) None else Some(st.alarm.toInt)))
          }
        })
  }

  final case class SessState(startUs: Long, endUs: Long, n: Long)
  final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /** Streaming sessionizer with an event-time gap — the streaming twin
    * of the batch `sessionize` gate's lag/gap reconstruction. State per
    * key = the one OPEN session (start, end, count); an arriving event
    * either extends it or CLOSES it (emitting the closed session) and
    * opens the next; a key silent past `gap` closes via event-time
    * timeout, so sessions of churned users still flush without waiting
    * for their next visit. Emits CLOSED sessions only (Append-mode
    * deterministic — an open session's end is unknowable).
    *
    * The caller's stream must carry a watermark on `ts` (event-time
    * timeouts are measured against it).
    */
  def sessionizeStream(
      ds: Dataset[ValEv], gapSeconds: Long): Dataset[ClosedSession] = {
    require(gapSeconds > 0, s"gapSeconds must be > 0, got $gapSeconds")
    val gapUs = gapSeconds * 1000000L
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[SessState]
    def toTs(us: Long) = new java.sql.Timestamp(us / 1000L)
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, evs: Iterator[ValEv], state: GroupState[SessState]) => {
          if (!evs.hasNext && state.hasTimedOut) {
            // watermark passed end + gap: flush the open session
            val st = state.get
            state.remove()
            Iterator.single(
              ClosedSession(uid, toTs(st.startUs), toTs(st.endUs), st.n))
          } else {
            val ordered = evs.toSeq
              .sortBy(e => (e.ts.getTime, e.event_id))
            val closed = scala.collection.mutable.Buffer[ClosedSession]()
            var st = state.getOption.orNull
            ordered.foreach { e =>
              val us = e.ts.getTime * 1000L
              if (st == null) st = SessState(us, us, 1L)
              else if (us - st.endUs > gapUs) {
                closed += ClosedSession(uid, toTs(st.startUs),
                  toTs(st.endUs), st.n)
                st = SessState(us, us, 1L)
              } else st = SessState(st.startUs, math.max(st.endUs, us),
                st.n + 1L)
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(st.endUs / 1000L + gapSeconds * 1000L)
            }
            closed.iterator
          }
        })
  }
}
