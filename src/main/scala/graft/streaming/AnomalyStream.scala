package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Analytics

/** Streaming twin of the x84 anomaly z-scores — the "train offline,
  * score online" monitoring shape: per-event-type mean/std are learned
  * ONCE from a reference corpus ([[Analytics.eventTypeStats]], exact
  * limb aggregation, so the statistics are bit-identical to the batch
  * query's), then every micro-batch is scored by a stateless broadcast
  * join against that tiny stats frame. Scoring is per-row against fixed
  * stats, so stream scores equal batch scores on the same rows by
  * construction (pinned in AnomalyStreamSpec against the same operator
  * x84's oracle checks).
  *
  * Scored batches land under `scoredPath/batch_id=<id>`; the
  * anomalies-only side table lands under `alertPath/batch_id=<id>` so
  * alert consumers never rescan the full scored firehose.
  * Overwrite-into-own-partition keeps replayed batches idempotent (same
  * layout contract as [[DedupStream]]/[[QualityStream]]).
  *
  * An event type absent from the reference has no statistics and is
  * dropped by the inner join — by design: a z-score against nothing is
  * noise. Surface brand-new event types through the transition-matrix /
  * novelty stream twins instead, and re-learn the stats frame when the
  * reference corpus moves (restart the query; the stats are one tiny
  * eager frame per start, pinned for the stream's lifetime).
  */
object AnomalyStream {

  /** Start scoring `newEvents` (carrying `event_id`, `event_type`,
    * `value`) against stats learned from the static `reference`. */
  def startScoring(
      newEvents: DataFrame,
      reference: DataFrame,
      scoredPath: String,
      alertPath: String,
      checkpoint: String): StreamingQuery = {
    // learned once at start: one row per event type, reused every batch
    val stats = Analytics.eventTypeStats(reference).transform(graft.plans.Pin.pin)
    newEvents.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val z = (col("value") - col("mean_v")) / col("std_v")
        val scored = batch
          .join(broadcast(stats), Seq("event_type"))
          .select(col("event_id"), col("event_type"), col("value"),
            z.as("z_score"), (abs(z) > 3.0).as("is_anomaly"))
          .transform(graft.plans.Pin.pin)
        scored.write.mode("overwrite").parquet(s"$scoredPath/batch_id=$batchId")
        scored.filter(col("is_anomaly"))
          .write.mode("overwrite").parquet(s"$alertPath/batch_id=$batchId")
        graft.operators.Dedup.release(scored)
      }
      .start()
  }
}
