package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Corpus

/** Streaming twin of the x100 PII scrub — redacting at ingest time so
  * raw PII never lands in the corpus at all, with a per-batch audit of
  * what was scrubbed. Pattern matching is WITHIN-document
  * ([[Corpus.piiScan]]), so the stream carries no state across batches
  * and stream output equals the batch scan on the same rows by
  * construction (pinned anyway in PiiStreamSpec). Per batch:
  *
  *  - scrubbed documents (id, redacted text under the ORIGINAL text
  *    column name, one `<name>_count` per pattern) land under
  *    `scrubbedPath/batch_id=<id>`; the raw text column is dropped
  *    before the write, so the sink never sees unredacted bytes;
  *  - one audit row per pattern (docs hit, total matches) lands under
  *    `metricsPath/batch_id=<id>` — the corpus-wide scrub report is one
  *    groupBy over the metrics table, never a rescan of the documents.
  *
  * Overwrite-into-own-partition keeps replayed batches idempotent (same
  * layout contract as [[QualityStream]]/[[DedupStream]]).
  */
object PiiStream {

  /** Start the scrubber over a streaming frame carrying (`idCol`,
    * `textCol`). `patterns` are (name, regex) pairs as in
    * [[Corpus.piiScan]]. */
  def startPiiScrub(
      newDocs: DataFrame,
      scrubbedPath: String,
      metricsPath: String,
      checkpoint: String,
      idCol: String,
      textCol: String,
      patterns: Seq[(String, String)]): StreamingQuery =
    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val scanned = Corpus.piiScan(
          batch.select(col(idCol), col(textCol)), textCol, patterns)
          .transform(graft.plans.Pin.pin)
        val countCols = patterns.map { case (n, _) => col(s"${n}_count") }
        scanned
          .select(col(idCol) +: col(s"${textCol}_redacted").as(textCol)
            +: countCols: _*)
          .write.mode("overwrite").parquet(s"$scrubbedPath/batch_id=$batchId")
        scanned
          .select(explode(array(patterns.map { case (n, _) =>
            struct(lit(n).as("pattern"), col(s"${n}_count").as("n"))
          }: _*)).as("p"))
          .select(col("p.pattern"), col("p.n"))
          .groupBy(col("pattern"))
          .agg(sum(col("n")).as("n_matches"),
            sum(when(col("n") > 0, 1L).otherwise(0L)).as("n_docs_hit"))
          .write.mode("overwrite").parquet(s"$metricsPath/batch_id=$batchId")
        graft.operators.Dedup.release(scanned)
      }
      .start()
}
