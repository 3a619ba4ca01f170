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
    * construction, not just ulp-close: the spec asserts equality for
    * ORDER-PRESERVING micro-batch splits. Like the EWMA/Holt twins
    * (and unlike [[sessionizeStream]], whose state can absorb
    * stragglers), a fold's state cannot be rewound: an event arriving
    * in a later batch than a (ts, id)-successor is folded out of
    * order. Feed it a watermarked, per-key-ordered stream, or accept
    * arrival order as the fold order — the standard monitoring
    * contract. Emits the current chart per key per micro-batch — the
    * shape an alerting sink consumes. */
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
  final case class OpenSessions(sessions: Seq[SessState])
  final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /** Streaming sessionizer with an event-time gap — the streaming twin
    * of the batch `sessionize` gate's lag/gap reconstruction, built the
    * way Append mode REQUIRES: a session is emitted only when the
    * watermark passes its end + gap, never on a gap-jump. (Emitting on
    * the jump looks right on in-order data but is unamendable — a
    * within-watermark straggler that belonged to the emitted session
    * would be silently folded into the wrong, later one. Measured in
    * review; this is why the state holds a LIST of open sessions.)
    *
    * Per key the state is the open sessions; an arriving event starts a
    * singleton session and the list re-normalizes by merging any two
    * sessions within `gap` of each other — so stragglers extend
    * sessions BACKWARD and can bridge two open sessions into one.
    * Sessions close in two places: inline when a batch's watermark has
    * already passed end + gap, and via event-time timeout for keys
    * gone silent. Events older than the watermark are dropped by Spark
    * before they reach the state function (the standard lateness
    * contract — size the watermark delay to the straggle you accept).
    *
    * The caller's stream must carry a watermark on `ts`.
    */
  def sessionizeStream(
      ds: Dataset[ValEv], gapSeconds: Long): Dataset[ClosedSession] = {
    require(gapSeconds > 0, s"gapSeconds must be > 0, got $gapSeconds")
    val gapMs = gapSeconds * 1000L
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[OpenSessions]
    def toTs(us: Long) = new java.sql.Timestamp(us / 1000L)
    def emit(uid: Long, s: SessState) =
      ClosedSession(uid, toTs(s.startUs), toTs(s.endUs), s.n)
    // closable iff even the earliest acceptable future event (just
    // above the watermark) could no longer merge: end + gap <= wm
    def split(open: Seq[SessState], wmMs: Long) =
      open.partition(s => s.endUs / 1000L + gapMs <= wmMs)
    def park(state: GroupState[OpenSessions], open: Seq[SessState]): Unit =
      if (open.isEmpty) state.remove()
      else {
        state.update(OpenSessions(open))
        state.setTimeoutTimestamp(open.map(_.endUs / 1000L).min + gapMs)
      }
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, evs: Iterator[ValEv], state: GroupState[OpenSessions]) => {
          val prior = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          val merged =
            if (!evs.hasNext) prior
            else {
              // every event is a singleton session; normalizing the
              // sorted list merges forward, backward, and bridges
              val all = (prior ++ evs.map { e =>
                val us = e.ts.getTime * 1000L
                SessState(us, us, 1L)
              }).sortBy(s => (s.startUs, s.endUs))
              all.foldLeft(List.empty[SessState]) { (acc, s) =>
                acc match {
                  case h :: t if s.startUs - h.endUs <= gapMs * 1000L =>
                    SessState(h.startUs, math.max(h.endUs, s.endUs),
                      h.n + s.n) :: t
                  case _ => s :: acc
                }
              }.reverse
            }
          val wm = state.getCurrentWatermarkMs()
          val (done, open) = split(merged, wm)
          park(state, open)
          done.sortBy(_.startUs).map(emit(uid, _)).iterator
        })
  }
}
