package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events table — the engine's
  * incremental path (the reference is batch-only; SURVEY.md §7.4 makes
  * the `events` fixture the streaming vehicle).
  *
  * Batch/stream parity: `windowedCounts` is the incremental twin of the
  * batch `x14_event_windows` query; `sessionizeStateful` reformulates the
  * W1 gaps-and-islands pattern as per-key state — the way a 100 TB
  * streaming pipeline detects sessions without a global ordered window.
  */
object EventsStream {

  /** Watermarked tumbling-window aggregation; works identically on a
    * `readStream` source (incremental) and a batch DataFrame. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Stream-stream interval join: purchases attributed to a click by the
    * same user within the preceding hour. Both sides carry watermarks so
    * join state is bounded; works identically on batch inputs. */
  def attributedPurchases(events: DataFrame): DataFrame = {
    val clicks = events
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(
      clicks,
      expr(
        """p_user = c_user AND
          |purchase_ts >= click_ts AND
          |purchase_ts <= click_ts + interval 1 hour""".stripMargin)
    )
  }

  /** Streaming exact dedup: drop replayed event_ids within the watermark
    * horizon — state is bounded by (horizon × arrival rate), the streaming
    * twin of the batch exact-dedup hash-groupBy (x01). */
  def dedupedEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicates("event_id")

  final case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(startUs: Long, lastUs: Long, n: Int)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Int)

  /** Per-user sessionization with `flatMapGroupsWithState`: closes a
    * session when the gap exceeds `gapMinutes`. State is one small record
    * per key — memory scales with active users, not event volume.
    *
    * Streaming contract (`batchMode = false`): sessions closed by an
    * in-batch gap are emitted immediately; the still-open session is held
    * in state with an event-time timeout of `gapMinutes` past its last
    * event, and emitted exactly once when the watermark passes that point
    * (so Append mode never re-emits an overlapping open session, and idle
    * keys are closed and their state freed). The caller must set
    * `.withWatermark("ts", …)` on the input in streaming mode.
    *
    * Batch contract (`batchMode = true`, the x13 twin): each key is
    * invoked exactly once with all its data and timeouts never fire, so
    * the final open session is emitted at the end of the invocation. */
  def sessionizeStateful(
      events: Dataset[Ev],
      gapMinutes: Int,
      batchMode: Boolean = true
  )(implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val gapMs = gapMinutes.toLong * 60L * 1000L

    def fn(userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        // streaming only: gap elapsed with no new events — close and free
        val s = state.get
        state.remove()
        Iterator.single(SessionOut(userId, s.startUs, s.lastUs, s.n))
      } else {
        val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var out = List.empty[SessionOut]
        var cur = state.getOption
        sorted.foreach { e =>
          val tUs = e.ts.getTime * 1000L
          cur match {
            case Some(s) if tUs - s.lastUs <= gapUs =>
              cur = Some(s.copy(lastUs = tUs, n = s.n + 1))
            case Some(s) =>
              out = SessionOut(userId, s.startUs, s.lastUs, s.n) :: out
              cur = Some(SessionState(tUs, tUs, 1))
            case None =>
              cur = Some(SessionState(tUs, tUs, 1))
          }
        }
        cur.foreach { s =>
          if (batchMode) {
            out = SessionOut(userId, s.startUs, s.lastUs, s.n) :: out
          } else {
            state.update(s)
            // timeout must sit strictly past the current watermark
            state.setTimeoutTimestamp(
              math.max(s.lastUs / 1000L + gapMs, state.getCurrentWatermarkMs + 1L))
          }
        }
        out.reverseIterator
      }
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append,
        if (batchMode) GroupStateTimeout.NoTimeout else GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
