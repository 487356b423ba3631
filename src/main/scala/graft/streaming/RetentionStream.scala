package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the x76 retention cohort matrix: per-user keyed
  * state holds the first-seen epoch day plus the set of days already
  * counted, and each micro-batch emits one (user, cohort_day,
  * day_offset) row per NEW active day — so re-delivery of a day the
  * user was already counted for emits nothing, and the running cohort
  * triangle is a plain groupBy-count over the append-only feed.
  *
  * State per user is one int plus the active-day set — bounded by days
  * the user was actually active (thousands over a decade), not event
  * volume. Day arithmetic is UTC epoch-day division, matching the batch
  * form's `to_date` under a UTC session. In-order batch delivery is the
  * caller's contract (shared with [[TransitionStream]]): the cohort day
  * is fixed by the first batch that shows the user.
  */
object RetentionStream {

  final case class REv(user_id: Long, ts: java.sql.Timestamp)
  final case class RetState(firstDay: Int, seen: Seq[Int])
  final case class CohortHit(user_id: Long, cohort_day: java.sql.Date, day_offset: Long)

  private val MsPerDay = 86400000L

  /** New-active-day extraction over a (possibly streaming) event feed.
    * Batch invokes each key once with all its events; streaming carries
    * (firstDay, seen) across batches. */
  def cohortHits(events: Dataset[REv])(
      implicit spark: SparkSession): Dataset[CohortHit] = {
    import spark.implicits._

    def fn(userId: Long, evs: Iterator[REv],
        state: GroupState[RetState]): Iterator[CohortHit] = {
      val days = evs.map(e => Math.floorDiv(e.ts.getTime, MsPerDay).toInt)
        .toSeq.distinct.sorted
      if (days.isEmpty) Iterator.empty
      else {
        val prev = state.getOption
        val first = prev.map(_.firstDay).getOrElse(days.head)
        val seen = prev.map(_.seen.toSet).getOrElse(Set.empty[Int])
        val fresh = days.filterNot(seen)
        state.update(RetState(first, (seen ++ fresh).toSeq))
        fresh.iterator.map { d =>
          CohortHit(userId,
            java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(first.toLong)),
            (d - first).toLong)
        }
      }
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
