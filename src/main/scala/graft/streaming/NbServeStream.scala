package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Learn

/** Streaming twin of the x201 naive-Bayes gate — TRAINED model-based
  * filtering at ingest: the model is fit ONCE on a standing labeled
  * corpus when the stream starts ([[Learn.nbModel]] — weights, priors,
  * and absent-word bases, all vocabulary/class-bounded and pinned as
  * broadcast frames), then every micro-batch is scored against the
  * frozen model ([[Learn.nbPredict]]) and gated. The classifier
  * analog of the frozen-index serving streams (IvfPqServeStream &c.):
  * train in batch, serve on the stream, never retrain mid-stream — so
  * stream verdicts are the BATCH verdicts by construction
  * (NbServeStreamSpec pins verdict equality on every document).
  *
  * Per batch: kept (pred-positive) documents land under
  * `keptPath/batch_id=<id>`; one metrics row (kept/dropped counts)
  * under `metricsPath/batch_id=<id>` — overwrite-into-own-partition,
  * so replayed batches stay idempotent (the [[DedupStream]] layout
  * contract).
  */
object NbServeStream {

  /** Fit on `labeledCorpus` (must carry `idCol`, `textCol`; labeled by
    * `label`), then gate the stream. `keepPositive` picks which class
    * passes the gate. `vocabK > 0` serves the vocab-capped model
    * ([[Learn.nbModelCapped]], the x204 web-scale form — the frozen
    * weight table is K·classes rows by construction, so the broadcast
    * stays fixed-size at any corpus vocabulary); `vocabK = 0` (default)
    * serves the exact full-vocabulary model (x201). */
  def startNbGate(
      newDocs: DataFrame,
      labeledCorpus: DataFrame,
      keptPath: String,
      metricsPath: String,
      checkpoint: String,
      idCol: String,
      textCol: String,
      label: Column,
      keepPositive: Boolean = true,
      vocabK: Int = 0): StreamingQuery = {
    val tr = labeledCorpus.select(
      col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"), label.cast("boolean").as("y"))
    // fit once; nbModel Pin.pin's every frame the scoring path reads
    // (weights AND the prior+base classes frame), so per-batch scoring
    // never rescans the corpus and the model cannot drift mid-stream
    // even if the corpus's backing files change
    val (wt, classes, _) =
      if (vocabK > 0) Learn.nbModelCapped(tr, vocabK) else Learn.nbModel(tr)

    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val docs = batch.select(
          col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
        val verdicts = docs
          .join(Learn.nbPredict(docs, wt, classes), Seq("doc_id"))
          .transform(graft.plans.Pin.pin)
        verdicts.filter(col("pred") === keepPositive)
          .select(col("doc_id"), col("text"))
          .write.mode("overwrite").parquet(s"$keptPath/batch_id=$batchId")
        verdicts.agg(
          sum(when(col("pred") === keepPositive, 1L).otherwise(0L))
            .as("n_kept"),
          sum(when(col("pred") =!= keepPositive, 1L).otherwise(0L))
            .as("n_dropped"))
          .write.mode("overwrite").parquet(s"$metricsPath/batch_id=$batchId")
        graft.operators.Dedup.release(verdicts)
      }
      .start()
  }
}
