package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Learn

/** Streaming twin of the x197 closed-form linear probe — ONLINE model
  * fitting over a document stream, without ever rescanning history.
  *
  * The OLS sufficient statistics are MERGEABLE (stats of a union = the
  * column-wise sums of per-part stats, exact decimals — factors cast
  * to DECIMAL(19,0) BEFORE each product so no int64 wrap), so the
  * stream keeps an append-only partials table instead of state: per
  * micro-batch,
  *
  *  - the batch's own ten statistics ([[Learn.sufficientStats]], one
  *    row) land under `partialsPath/batch_id=<id>` — overwrite into the
  *    batch's own partition, so a replayed batch is idempotent (the
  *    [[DedupStream]] layout contract);
  *  - the refit ([[Learn.mergeStats]] over ALL partials →
  *    [[Learn.solveOls]]) lands under `fitPath/batch_id=<id>` — the
  *    model-so-far after every batch, each a 1-row
  *    (n_docs, beta0..2, r2) frame.
  *
  * Because the merge is exact decimal addition and the solve is the
  * same expression tree, the fit after the last batch is BIT-IDENTICAL
  * to running [[Learn.linearProbe]] over the concatenated corpus —
  * ProbeStreamSpec pins stream ≡ batch on doubles, plus partial-order
  * invariance. Per-batch cost is one scan of the batch plus a
  * batch-count-row merge; the history is never re-read beyond the
  * 1-row-per-batch partials table.
  */
object ProbeStream {

  /** Start the online probe over a streaming frame; `y`/`x1`/`x2` are
    * expression strings over the frame's columns (evaluated per batch,
    * the same expressions the batch probe takes as Columns).
    * `lambdaPerRow > 0` refits the scale-invariant RIDGE form
    * ([[Learn.solveRidge]]) instead of OLS — the partials table is
    * identical either way (the ten statistics are model-agnostic), so
    * the λ choice can even change mid-stream or be re-solved offline
    * from the same parquet without any reprocessing. */
  def startProbeFit(
      newDocs: DataFrame,
      partialsPath: String,
      fitPath: String,
      checkpoint: String,
      y: String, x1: String, x2: String,
      lambdaPerRow: Long = 0L): StreamingQuery =
    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        Learn.sufficientStats(batch, expr(y), expr(x1), expr(x2))
          .coalesce(1)
          .write.mode("overwrite")
          .parquet(s"$partialsPath/batch_id=$batchId")
        // explicit schema, not inference: a stream resumed across the
        // round-17 dsum change has decimal(29,0) partials files (the
        // old sum(decimal(19,0)) type) beside decimal(38,0) ones, and
        // schema inference reads an arbitrary file — pinning the wide
        // type reads both losslessly (same scale, precision-widening
        // parquet read) and keeps every future refit under the
        // documented 38-digit envelope
        val partials = spark.read
          .schema(Learn.statsDdl + ", batch_id BIGINT")
          .parquet(partialsPath)
        val merged = Learn.mergeStats(partials)
        val fit =
          if (lambdaPerRow > 0) Learn.solveRidge(merged, lambdaPerRow)
          else Learn.solveOls(merged)
        fit.coalesce(1)
          .write.mode("overwrite")
          .parquet(s"$fitPath/batch_id=$batchId")
      }
      .start()
}
