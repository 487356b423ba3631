package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Corpus

/** Streaming twin of the x161 hashing-trick linear quality classifier —
  * model-based filtering at ingest time, the stage a production
  * pretraining pipeline runs right after the heuristic gates
  * ([[QualityStream]]'s x65 twin): documents a trained-or-pseudo linear
  * model scores negative never land in the corpus at all.
  *
  * The score is WITHIN-document ([[Corpus.hashedClassifierScore]]: one
  * token-explode + per-doc hash-agg, weights computed inline from the
  * feature hash), so the stream needs no state across batches and
  * stream verdicts equal batch verdicts by construction (pinned in
  * ClassifierStreamSpec against the same operator the x161 oracle
  * checks). Per batch:
  *
  *  - kept documents (id, text, n_tokens, score) land under
  *    `keptPath/batch_id=<id>`;
  *  - ONE metrics row (docs/tokens kept and dropped, exact int64 score
  *    sums for both sides) lands under `metricsPath/batch_id=<id>` —
  *    corpus-wide classifier drift is then one aggregate over the
  *    metrics table, never a rescan of the documents.
  *
  * Overwrite-into-own-partition keeps replayed batches idempotent (the
  * [[DedupStream]]/[[QualityStream]] layout contract).
  */
object ClassifierStream {

  /** Start the classifier gate over a streaming frame carrying
    * (`idCol`, `textCol`). */
  def startClassifierGate(
      newDocs: DataFrame,
      keptPath: String,
      metricsPath: String,
      checkpoint: String,
      idCol: String,
      textCol: String): StreamingQuery =
    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val scored = Corpus.hashedClassifierScore(
          batch.select(col(idCol), col(textCol)), idCol, textCol)
          .join(batch.select(col(idCol), col(textCol)), Seq(idCol))
          .transform(graft.plans.Pin.pin)
        scored.filter(col("keep"))
          .select(col(idCol), col(textCol), col("n_tokens"), col("score"))
          .write.mode("overwrite").parquet(s"$keptPath/batch_id=$batchId")
        scored.agg(
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(!col("keep"), 1L).otherwise(0L)).as("n_dropped"),
          sum(when(col("keep"), col("n_tokens")).otherwise(0L)).as("tokens_kept"),
          sum(when(!col("keep"), col("n_tokens")).otherwise(0L)).as("tokens_dropped"),
          sum(when(col("keep"), col("score")).otherwise(0L)).as("score_kept_sum"),
          sum(when(!col("keep"), col("score")).otherwise(0L)).as("score_dropped_sum"))
          .write.mode("overwrite").parquet(s"$metricsPath/batch_id=$batchId")
        graft.operators.Dedup.release(scored)
      }
      .start()
}
