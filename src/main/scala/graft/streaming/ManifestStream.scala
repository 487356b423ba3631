package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Corpus

/** Streaming shard-manifest maintenance — the release-integrity twin of
  * batch x106 ([[Corpus.shardManifest]]): each micro-batch of incoming
  * documents reduces to a |shards|-row partial manifest (doc/token
  * counts, id range, XOR content checksum) landing under
  * `partialsPath/batch_id=<id>`, and [[manifest]] folds the partial
  * table into the standing manifest with [[Corpus.manifestFromPartials]].
  *
  * Why this is exact with NO keyed streaming state: every manifest
  * column is an associative, commutative reduction (sums, min/max, and
  * the XOR checksum — whose self-inverse property also makes a
  * replayed-and-overwritten batch partition idempotent under the
  * overwrite layout, same contract as the other stream twins). The
  * merged result is therefore bit-identical to running x106 once over
  * the union of all batches — pinned in ManifestStreamSpec. Standing
  * state is |shards| rows per batch; documents are scanned exactly
  * once, at ingest.
  */
object ManifestStream {

  /** Start maintaining the manifest of `newDocs` (carrying `idCol`,
    * `textCol`) over `nShards` id-hash shards. */
  def startManifest(
      newDocs: DataFrame,
      partialsPath: String,
      checkpoint: String,
      idCol: String,
      textCol: String,
      nShards: Int): StreamingQuery =
    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        Corpus.shardManifest(batch, idCol, textCol, nShards)
          .write.mode("overwrite").parquet(s"$partialsPath/batch_id=$batchId")
      }
      .start()

  /** The live manifest: one merge over the partial table. */
  def manifest(spark: SparkSession, partialsPath: String): DataFrame =
    Corpus.manifestFromPartials(spark.read.parquet(partialsPath))
}
