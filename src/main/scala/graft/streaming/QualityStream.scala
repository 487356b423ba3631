package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Corpus

/** Streaming twin of the x65 quality gate — filtering at ingest time so
  * rejected documents never land in the corpus at all, with the audit
  * trail ("how many died, and why") accumulating per batch.
  *
  * Every gate signal is WITHIN-document ([[Corpus.qualityGate]]), so the
  * stream needs no state across batches and stream verdicts equal batch
  * verdicts by construction (pinned anyway in QualityStreamSpec, against
  * the same x65 operator the oracle checks). Per batch:
  *
  *  - kept documents (id, text, n_words) land under
  *    `keptPath/batch_id=<id>`;
  *  - one metrics row per distinct `reasons` bitmask (including 0 =
  *    kept) lands under `metricsPath/batch_id=<id>` — the corpus-wide
  *    audit is then one groupBy over the metrics table, never a rescan
  *    of the documents.
  *
  * Overwrite-into-own-partition keeps replayed batches idempotent (same
  * layout contract as [[DedupStream]]/[[ChunkStream]]).
  */
object QualityStream {

  /** Start the gate over a streaming frame carrying (`idCol`,
    * `textCol`). */
  def startQualityGate(
      newDocs: DataFrame,
      keptPath: String,
      metricsPath: String,
      checkpoint: String,
      idCol: String,
      textCol: String): StreamingQuery =
    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val gated = Corpus.qualityGate(
          batch.select(col(idCol), col(textCol)), idCol, textCol)
          .join(batch.select(col(idCol), col(textCol)), Seq(idCol))
          .transform(graft.plans.Pin.pin)
        gated.filter(col("kept"))
          .select(col(idCol), col(textCol), col("n_words"))
          .write.mode("overwrite").parquet(s"$keptPath/batch_id=$batchId")
        gated.groupBy(col("reasons"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_words"))
          .write.mode("overwrite").parquet(s"$metricsPath/batch_id=$batchId")
        graft.operators.Dedup.release(gated)
      }
      .start()
}
