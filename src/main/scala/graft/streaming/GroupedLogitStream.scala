package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Learn

/** Streaming RETRAIN twin of the x209 per-source grouped logistic
  * probes — the keyed extension of [[LogitStream]], completing the
  * Learn family's trainer/stream symmetry (round-17 verdict item 4):
  * one calibrated quality gate PER SOURCE, refit continuously as
  * documents arrive, without ever rescanning history.
  *
  * The mergeable sufficient statistic gains the grouping key: the
  * KEYED feature histogram (key, y, r1, r2, c). Histograms of a union
  * are cell-wise count sums (exact int64) within each key, so per
  * micro-batch:
  *
  *  - the batch's own keyed histogram lands under
  *    `partialsPath/batch_id=<id>` (overwrite into the batch's own
  *    partition — idempotent replay, the DedupStream layout contract);
  *  - the refit merges ALL partials (one grouped sum over
  *    key × cells × batches rows, read under a PINNED schema — the
  *    ProbeStream resume lesson) and reruns the fixed-iteration
  *    per-group IRLS via [[Learn.logisticFitFromHistBy]], landing the
  *    per-source β table (key, n_docs, beta0..2, n_correct, accuracy)
  *    under `fitPath/batch_id=<id>`.
  *
  * The landed β table is sources-bounded — exactly the broadcast-able
  * artifact a downstream per-source streaming gate joins against (the
  * NbServeStream frozen-model pattern applied to the calibrated
  * logistic family). Because the merged histogram EQUALS the batch
  * histogram of the concatenated corpus and the fit is a pure function
  * of the histogram, the streamed β table is BIT-IDENTICAL to
  * [[Learn.logisticProbeHistBy]] over all data so far —
  * GroupedLogitStreamSpec pins final and prefix fits plus replay
  * idempotence. Sources seen in ANY batch keep a row forever (their
  * cells stand in the partials), including degenerate ones (det-gated
  * Newton steps hold their β, per the x209 contract). Per-batch cost is
  * one scan of the batch plus a (key × cells × batches)-row merge,
  * bounded by sources × feature domains, not the corpus.
  */
object GroupedLogitStream {

  private val histDdl =
    "key STRING, y BIGINT, r1 BIGINT, r2 BIGINT, c BIGINT, batch_id BIGINT"

  /** Start the online per-source logistic retrain over a streaming
    * frame; `key` must evaluate to a string (the source/domain),
    * `label` to 0/1, `x1`/`x2` to integer features — the same
    * expression strings the batch x209 takes as Columns. */
  def startGroupedLogitFit(
      newDocs: DataFrame,
      partialsPath: String,
      fitPath: String,
      checkpoint: String,
      key: String, label: String, x1: String, x2: String,
      iters: Int = 2): StreamingQuery =
    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        batch
          .selectExpr(s"CAST($key AS STRING) AS key",
            s"CAST($label AS BIGINT) AS y",
            s"CAST($x1 AS BIGINT) AS r1", s"CAST($x2 AS BIGINT) AS r2")
          .groupBy(col("key"), col("y"), col("r1"), col("r2"))
          .agg(count(lit(1)).as("c"))
          .coalesce(1)
          .write.mode("overwrite")
          .parquet(s"$partialsPath/batch_id=$batchId")
        val merged = spark.read.schema(histDdl).parquet(partialsPath)
          .groupBy(col("key"), col("y"), col("r1"), col("r2"))
          .agg(sum(col("c")).cast("long").as("c"))
        Learn.logisticFitFromHistBy(merged, iters)
          .coalesce(1)
          .write.mode("overwrite")
          .parquet(s"$fitPath/batch_id=$batchId")
      }
      .start()
}
