package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Corpus

/** Streaming histogram-sketch maintenance — the distribution-monitoring
  * twin of batch x111 ([[Corpus.histogramSketch]]): each micro-batch
  * reduces to a ≤ |bins|-row partial histogram landing under
  * `partialsPath/batch_id=<id>`, and [[sketch]]/[[quantiles]] fold the
  * partial table with [[Corpus.mergeHistograms]] into the standing
  * sketch and its error-bounded quantile estimates.
  *
  * Exact with NO keyed streaming state: bin counts are associative and
  * commutative, so the merged sketch is bit-identical to one-shot
  * batching the union of all batches (pinned in SketchStreamSpec), and
  * a replayed batch overwrites its own partition idempotently. This is
  * how a 100 TB ingest watches its length/latency distribution drift
  * live — each document is scanned once, at ingest, and the standing
  * state is bins-sized, never corpus-sized.
  */
object SketchStream {

  /** Start maintaining the histogram of `valueCol` (long-valued) over
    * incoming rows, `binWidth`-wide bins. */
  def startSketch(
      newRows: DataFrame,
      valueCol: String,
      binWidth: Long,
      partialsPath: String,
      checkpoint: String): StreamingQuery =
    newRows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        Corpus.histogramSketch(batch, col(valueCol), binWidth)
          .write.mode("overwrite").parquet(s"$partialsPath/batch_id=$batchId")
      }
      .start()

  /** The live merged sketch: one bin-wise merge over the partials. */
  def sketch(spark: SparkSession, partialsPath: String): DataFrame =
    Corpus.mergeHistograms(spark.read.parquet(partialsPath))

  /** Live quantile estimates off the merged sketch (error ≤ binWidth). */
  def quantiles(
      spark: SparkSession, partialsPath: String,
      qs: Seq[Double], binWidth: Long): DataFrame =
    Corpus.histQuantiles(sketch(spark, partialsPath), qs, binWidth)
}
