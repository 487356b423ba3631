package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the x75 event-type transition matrix: emits one
  * (user, prev_type, next_type) row per consecutive event pair, with the
  * LAST event per user held in keyed state so a pair that straddles two
  * micro-batches is emitted when its second half arrives.
  *
  * State is one tiny record per user — memory scales with the active-user
  * set, not event volume (the same bound as
  * [[EventsStream.sessionizeStateful]]). Within an invocation events sort
  * by (ts, event_id) — the identical total order to the batch lag window
  * — so on in-order batch delivery (the caller's watermark contract)
  * stream output equals the batch form row-for-row; the transition
  * MATRIX is then a downstream groupBy over this append-only feed.
  * Production deployments with unbounded user churn should evict idle
  * keys via a timeout; the contract here keeps NoTimeout so the batch
  * twin (one invocation per key, state never consulted again) and the
  * stream share one code path.
  */
object TransitionStream {

  final case class TEv(
      user_id: Long, event_id: Long, ts: java.sql.Timestamp, event_type: String)
  final case class LastEv(tsMs: Long, eventId: Long, eventType: String)
  final case class Transition(user_id: Long, prev_type: String, next_type: String)

  /** Consecutive-pair extraction over a (possibly streaming) event feed.
    * Batch and stream run the same function: batch invokes each key once
    * with all its events; streaming carries `LastEv` across batches. */
  def transitions(events: Dataset[TEv])(
      implicit spark: SparkSession): Dataset[Transition] = {
    import spark.implicits._

    def fn(userId: Long, evs: Iterator[TEv],
        state: GroupState[LastEv]): Iterator[Transition] = {
      val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var prev = state.getOption
      val out = Seq.newBuilder[Transition]
      sorted.foreach { e =>
        prev.foreach(p => out += Transition(userId, p.eventType, e.event_type))
        prev = Some(LastEv(e.ts.getTime, e.event_id, e.event_type))
      }
      prev.foreach(state.update)
      out.result().iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
