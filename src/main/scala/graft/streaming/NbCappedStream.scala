package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Learn

/** Streaming RETRAIN twin of the x204 vocab-capped naive Bayes — the
  * ProbeStream pattern (append-only mergeable partials, refit per
  * batch, never rescan history) applied to the scale-default NB form.
  *
  * NB's sufficient statistics are two count tables: per-class doc
  * counts `(y, n)` and per-(word, class) presence counts `(w, y, c)`.
  * Counts of a union are column-wise sums of per-part counts (exact
  * int64), so per micro-batch:
  *
  *  - the batch's own counts land under `ncPath/batch_id=<id>` and
  *    `cntPath/batch_id=<id>` — overwrite into the batch's own
  *    partition, so a replayed batch is idempotent (the DedupStream
  *    layout contract);
  *  - the refit merges ALL partials (two grouped sums) and rebuilds
  *    the capped model via [[Learn.nbModelFromCounts]] — the top-K
  *    vocabulary cut is applied over the MERGED document frequencies
  *    (cap-then-merge would diverge from batch: a globally-frequent
  *    word need not be frequent in any single batch), then the weight
  *    table (K·classes rows) and class priors land under
  *    `fitPath/batch_id=<id>/{wt,classes}` — the K·classes-bounded
  *    mergeable artifact the round-16 verdict names.
  *
  * Because count merging is exact and the weight derivation is the
  * same once-rounded-log expression tree, the fit after the last batch
  * is BIT-IDENTICAL to [[Learn.nbModelCapped]] over the concatenated
  * corpus (NbCappedStreamSpec pins wt + classes row-for-row, plus
  * batch-boundary invariance). Per-batch cost: one scan of the batch
  * plus a merge over the partials tables — batch-count × vocab-sized
  * rows for `cnt`, batch-count × classes for `nc`; at a 100 TB corpus
  * streamed over months the history is never re-read.
  */
object NbCappedStream {

  /** Start the online capped-NB retrain over a streaming frame with
    * (`doc_id`, `text`) columns; `label` is a boolean expression string
    * over the frame's columns (the class, e.g. "n_chars >= 300"). */
  def startNbFit(
      newDocs: DataFrame,
      ncPath: String,
      cntPath: String,
      fitPath: String,
      checkpoint: String,
      label: String,
      vocabK: Int): StreamingQuery = {
    require(vocabK > 0, s"vocabK must be positive, got $vocabK")
    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val tr = batch.selectExpr("doc_id", s"$label AS y", "text")
        tr.groupBy(col("y")).agg(count(lit(1)).as("n"))
          .coalesce(1)
          .write.mode("overwrite")
          .parquet(s"$ncPath/batch_id=$batchId")
        tr.select(col("doc_id"), col("y"),
            explode(split(col("text"), " ")).as("w"))
          .distinct()
          .groupBy(col("w"), col("y")).agg(count(lit(1)).as("c"))
          .coalesce(1)
          .write.mode("overwrite")
          .parquet(s"$cntPath/batch_id=$batchId")
        val nc = spark.read.parquet(ncPath)
          .groupBy(col("y")).agg(sum(col("n")).cast("long").as("n"))
        val cnt = spark.read.parquet(cntPath)
          .groupBy(col("w"), col("y")).agg(sum(col("c")).cast("long").as("c"))
        val (wt, classes, _) = Learn.nbModelFromCounts(nc, cnt, vocabK)
        wt.coalesce(1).write.mode("overwrite")
          .parquet(s"$fitPath/batch_id=$batchId/wt")
        classes.coalesce(1).write.mode("overwrite")
          .parquet(s"$fitPath/batch_id=$batchId/classes")
      }
      .start()
  }
}
