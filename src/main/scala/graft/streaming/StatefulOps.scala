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
}
