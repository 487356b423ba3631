package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Learn

/** Streaming RETRAIN twin of the x208 one-scan logistic probe — the
  * third member of the trainer-streaming family (ProbeStream's
  * OLS/ridge statistics, NbCappedStream's count tables, and now the
  * logistic FEATURE HISTOGRAM).
  *
  * IRLS itself is not mergeable (each Newton step needs per-row
  * p = σ(β·x) at the CURRENT β), but the loss depends on the corpus
  * only through the (label, x1, x2) multiset — so the mergeable
  * sufficient statistic is the feature histogram (y, r1, r2, c):
  * histograms of a union are cell-wise count sums (exact int64). Per
  * micro-batch:
  *
  *  - the batch's own histogram lands under
  *    `partialsPath/batch_id=<id>` (overwrite into the batch's own
  *    partition — idempotent replay, the DedupStream layout contract);
  *  - the refit merges ALL partials (one grouped sum over
  *    cells × batches rows) and reruns the full fixed-iteration IRLS
  *    via [[Learn.logisticFitFromHist]], landing the
  *    (n_docs, beta0..2, n_correct, accuracy) row under
  *    `fitPath/batch_id=<id>`.
  *
  * Because the merged histogram EQUALS the batch histogram of the
  * concatenated corpus (exact count addition) and the fit is a pure
  * function of the histogram, the streamed fit is BIT-IDENTICAL to
  * [[Learn.logisticProbeHist]] over all data so far — LogitStreamSpec
  * pins final and prefix fits plus replay idempotence. History is
  * never rescanned: per-batch cost is one scan of the batch plus a
  * (cells × batches)-row merge, both bounded by the feature-domain
  * product, not the corpus.
  */
object LogitStream {

  /** Start the online logistic retrain over a streaming frame;
    * `label`/`x1`/`x2` are expression strings over the frame's columns
    * (label must evaluate to 0/1). */
  def startLogitFit(
      newDocs: DataFrame,
      partialsPath: String,
      fitPath: String,
      checkpoint: String,
      label: String, x1: String, x2: String,
      iters: Int = 2): StreamingQuery =
    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        batch
          .selectExpr(s"CAST($label AS BIGINT) AS y",
            s"CAST($x1 AS BIGINT) AS r1", s"CAST($x2 AS BIGINT) AS r2")
          .groupBy(col("y"), col("r1"), col("r2"))
          .agg(count(lit(1)).as("c"))
          .coalesce(1)
          .write.mode("overwrite")
          .parquet(s"$partialsPath/batch_id=$batchId")
        val merged = spark.read.parquet(partialsPath)
          .groupBy(col("y"), col("r1"), col("r2"))
          .agg(sum(col("c")).cast("long").as("c"))
        Learn.logisticFitFromHist(merged, iters)
          .coalesce(1)
          .write.mode("overwrite")
          .parquet(s"$fitPath/batch_id=$batchId")
      }
      .start()
}
