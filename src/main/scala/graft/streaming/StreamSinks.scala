package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming file-sink with end-to-end exactly-once semantics on plain
  * parquet: each micro-batch lands in a `batch_id=<id>`-keyed
  * subdirectory with overwrite mode, so a batch replayed after a failure
  * (same checkpointed batchId) overwrites its own previous attempt
  * instead of appending duplicates. Readers see the whole dataset with
  * `spark.read.parquet(path)` (batch_id is a partition column they can
  * drop or prune on).
  *
  * This is the idempotent-by-construction pattern for sinks without
  * transactional commit protocols; state/progress tracking lives in the
  * checkpoint, data idempotence in the directory layout.
  */
object StreamSinks {

  def startIdempotentParquetSink(
      df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
      }
      .start()
}
