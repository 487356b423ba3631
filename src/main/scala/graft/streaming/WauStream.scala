package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Streaming twin of the x122 trailing-7-day-active-users rollup.
  *
  * A rolling DISTINCT count is not mergeable from plain per-batch
  * counts — the same user can cover a report day twice, across batches
  * (re-delivery) or within one (two active days inside one window). So
  * the keyed state dedupes at exactly the granularity the count is
  * distinct over: per user it holds the set of REPORT days already
  * covered, and each micro-batch emits one (user, report_day) row per
  * report day newly covered by that user's fresh activity. Every
  * (user, report_day) pair crosses the stream EXACTLY ONCE, so the
  * per-batch partial counts under `partialsPath/batch_id=<id>` merge by
  * plain addition — bit-identical to batch x122 on the union of all
  * batches (pinned in WauStreamSpec, clipped to the observed day
  * range; the stream also carries report days past the last observed
  * day, which the reader clips).
  *
  * State per user is the covered-report-day set (≈ active days + 6,
  * bounded by calendar span, not event volume); partials are
  * ≤ 7×|new pairs| rows per batch.
  */
object WauStream {

  final case class UEv(user_id: Long, ts: java.sql.Timestamp)
  final case class DaySet(seen: Seq[Int])
  final case class CoveredDay(user_id: Long, report_day: Long)

  private val MsPerDay = 86400000L
  private val WindowDays = 7

  /** Once-only (user, report-day) coverage extraction: activity whose
    * 7-day window adds no new report day for the user emits nothing. */
  def coveredDays(events: Dataset[UEv])(
      implicit spark: SparkSession): Dataset[CoveredDay] = {
    import spark.implicits._

    def fn(userId: Long, evs: Iterator[UEv],
        state: GroupState[DaySet]): Iterator[CoveredDay] = {
      val covered = evs
        .map(e => Math.floorDiv(e.ts.getTime, MsPerDay).toInt)
        .flatMap(d => d until d + WindowDays)
        .toSeq.distinct.sorted
      val seen = state.getOption.map(_.seen.toSet).getOrElse(Set.empty[Int])
      val fresh = covered.filterNot(seen)
      if (fresh.nonEmpty) state.update(DaySet((seen ++ fresh).toSeq))
      fresh.iterator.map(d => CoveredDay(userId, d.toLong))
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Start maintaining per-batch WAU partials for a streaming event
    * feed (columns `user_id`, `ts`). */
  def startWau(
      events: DataFrame,
      partialsPath: String,
      checkpoint: String)(implicit spark: SparkSession): StreamingQuery = {
    import spark.implicits._
    coveredDays(events.select(col("user_id"), col("ts")).as[UEv])
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[CoveredDay], batchId: Long) =>
        batch.toDF()
          .groupBy(col("report_day")).agg(count(lit(1)).as("n"))
          .write.mode("overwrite").parquet(s"$partialsPath/batch_id=$batchId")
      }
      .start()
  }

  /** The live WAU series: plain addition over the partials (exact
    * because the state layer already made (user, report_day) pairs
    * globally unique). */
  def wau(spark: SparkSession, partialsPath: String): DataFrame =
    spark.read.parquet(partialsPath)
      .groupBy(col("report_day")).agg(sum(col("n")).as("wau"))
}
