package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Corpus

/** Streaming twin of x167's Count-Min heavy-hitter sketch — the form
  * the sketch was INVENTED for: frequency summaries over a stream whose
  * exact count table would grow with the vocabulary. Each arriving
  * micro-batch contributes its own partial 3×1024 cell frame
  * ([[Corpus.countMinCells]], the batch query's build stage verbatim)
  * under `cellsPath/batch_id=<id>`; the standing registry is the set of
  * partials, and the whole-stream sketch is their plain per-cell SUM
  * ([[mergedCells]]) — exact mergeability is the Count-Min property,
  * and CountMinStreamSpec pins merged-over-any-batching ≡ one-shot
  * batch, bit-for-bit.
  *
  * Scale shape: per-batch state written is 3·1024 rows regardless of
  * batch size; the registry grows one fixed-size partial per batch and
  * compacts to a single sketch by one sketch-sized aggregate (or via
  * [[graft.sources.Sinks.compactPartitioned]] like every registry
  * stream here). No cross-batch read-modify-write exists, so replays
  * are idempotent per batch (overwrite layout) and the merge is
  * associative/commutative — the same math that makes the sketch
  * per-partition-combinable inside one job makes it per-batch-
  * combinable across the stream.
  */
object CountMinStream {

  /** Start sketching a streaming frame carrying `textCol`. Each batch's
    * partial cells land under `cellsPath/batch_id=<id>` (overwrite —
    * the idempotent-replay layout). */
  def startCountMin(
      newDocs: DataFrame,
      cellsPath: String,
      checkpoint: String,
      textCol: String,
      rows: Int = 3,
      buckets: Int = 1024): StreamingQuery =
    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        Corpus.countMinCells(batch.toDF(), textCol, rows, buckets)
          .write.mode("overwrite")
          .parquet(s"$cellsPath/batch_id=$batchId")
      }
      .start()

  /** The whole-stream sketch: per-cell SUM over every batch partial in
    * the registry. Output is sketch-sized (≤ rows·buckets rows). */
  def mergedCells(spark: SparkSession, cellsPath: String): DataFrame =
    spark.read.parquet(cellsPath)
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("total")).as("total"))
}
