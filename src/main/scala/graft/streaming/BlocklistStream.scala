package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Corpus

/** Streaming twin of the x180 phrase-blocklist gate — wordlist
  * filtering at ingest, the earliest and cheapest gate in a curation
  * stack (static artifact, no fit step, no state). The phrase list is
  * pinned at start; every verdict is WITHIN-document, so stream
  * verdicts equal batch [[Corpus.blocklistGate]] verdicts over any
  * batching (BlocklistStreamSpec). Per batch, the gate-family layout:
  * kept documents under `keptPath/batch_id=<id>`, one metrics row
  * under `metricsPath/batch_id=<id>` with exact match accounting
  * (overwrite → idempotent replays).
  */
object BlocklistStream {

  /** Start the gate over a streaming frame carrying (`idCol`,
    * `textCol`), filtering against the static `phrases` list. */
  def startBlocklistGate(
      newDocs: DataFrame,
      phrases: Seq[String],
      keptPath: String,
      metricsPath: String,
      checkpoint: String,
      idCol: String,
      textCol: String): StreamingQuery =
    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val gated = Corpus.blocklistGate(
          batch.select(col(idCol), col(textCol)), idCol, textCol, phrases)
          .join(batch.select(col(idCol), col(textCol)), Seq(idCol))
          .transform(graft.plans.Pin.pin)
        gated.filter(col("kept"))
          .select(col(idCol), col(textCol))
          .write.mode("overwrite").parquet(s"$keptPath/batch_id=$batchId")
        gated.agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(col("n_matches")).as("n_matches"),
          sum(col("n_phrases")).as("n_phrase_hits"))
          .write.mode("overwrite").parquet(s"$metricsPath/batch_id=$batchId")
        graft.operators.Dedup.release(gated)
      }
      .start()
}
