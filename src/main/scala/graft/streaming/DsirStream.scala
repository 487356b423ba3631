package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Corpus

/** Streaming twin of x171's DSIR importance-resampling selector — the
  * target-distribution gate at ingest time, slotting between the
  * heuristic gates ([[QualityStream]]) and the model gate
  * ([[ClassifierStream]]) in a production pretraining ingest: the
  * bucket→weight table is fitted ONCE per target release
  * ([[buildWeights]] → a ≤4096-row parquet), and every arriving
  * micro-batch is scored against that FROZEN table — no cross-batch
  * state, no refit drift, so stream verdicts equal batch
  * [[Corpus.dsirApply]] verdicts over any partition of the corpus
  * (DsirStreamSpec).
  *
  * A token hashing to a bucket absent from the fit corpus carries no
  * evidence: it scores 0 but still counts in `n_tokens`, and a
  * document of entirely novel vocabulary still gets a verdict row
  * (score 0 → dropped) — so the metrics row's accounting
  * (n_kept + n_dropped = batch size) holds for every batch (the
  * [[Corpus.dsirApply]] contract — stated here because serving
  * streams, unlike the batch query, genuinely see novel vocabulary).
  *
  * Per batch, the [[ClassifierStream]] layout verbatim: kept documents
  * under `keptPath/batch_id=<id>`, one exact-integer metrics row under
  * `metricsPath/batch_id=<id>` (overwrite → idempotent replays).
  */
object DsirStream {

  /** Fit the bucket→weight table on a seed corpus and persist it at
    * `weightsPath`. Run once per target release; gates only read it. */
  def buildWeights(
      seedDocs: DataFrame,
      weightsPath: String,
      idCol: String,
      textCol: String,
      targetPred: org.apache.spark.sql.Column,
      buckets: Int = 4096): Unit =
    Corpus.dsirWeights(seedDocs, idCol, textCol, targetPred, buckets)
      .write.mode("overwrite").parquet(weightsPath)

  /** Start the gate over a streaming frame carrying (`idCol`,
    * `textCol`), scoring against the standing table at `weightsPath`.
    * The weights are collected ONCE here (≤ `buckets` rows — the same
    * load-and-pin economics as [[SqStream]]'s bounds) and rebuilt as a
    * local frame per batch, so no micro-batch pays a parquet re-read
    * of the frozen artifact. */
  def startDsirGate(
      newDocs: DataFrame,
      weightsPath: String,
      keptPath: String,
      metricsPath: String,
      checkpoint: String,
      idCol: String,
      textCol: String,
      buckets: Int = 4096): StreamingQuery = {
    val weightsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lw",
        org.apache.spark.sql.types.LongType)))
    val weightRows: Array[Row] = newDocs.sparkSession.read
      .parquet(weightsPath)
      .select(col("bucket").cast("long"), col("lw").cast("long")).collect()
    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val weights = spark.createDataFrame(
          spark.sparkContext.parallelize(weightRows.toSeq, 1), weightsSchema)
        val scored = Corpus.dsirApply(
          batch.select(col(idCol), col(textCol)), idCol, textCol,
          weights, buckets)
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
}
