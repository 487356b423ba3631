package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming twin of x139's segment-level dedup — the ingest-time
  * sub-document gate of a continuously assembled corpus: each arriving
  * micro-batch's 8-word segments are checked against the STANDING
  * segment-hash registry; a segment occurrence is KEPT iff its hash is
  * unseen both in the registry and earlier (by the (doc_id, position)
  * encoding) within the batch, and each batch's kept segments extend
  * the registry — so later batches are judged against everything kept
  * before them, exactly the batch operator's first-writer-wins rule
  * when docs arrive in doc_id order (SegmentDedupStreamSpec pins
  * stream ≡ batch x139 under ordered arrival).
  *
  * Scale shape: the registry is only ever touched by hash-keyed
  * anti-join/min — segments shuffle as 8-byte poly hashes, never text;
  * per-batch work is O(batch segments + registry probe), the registry
  * is append-only parquet partitioned by batch_id, and the batch's own
  * partition is excluded on read so a replayed batch overwrites its
  * previous attempt instead of judging against it (the [[StreamSinks]]
  * idempotence pattern shared with [[DedupStream]]).
  */
object SegmentDedupStream {

  /** Per-doc segment occurrence frame: (doc_id, source, k, h, n_toks)
    * with k = doc_id·2²⁰ + position (the x139 winner encoding). */
  private[streaming] def segments(docs: DataFrame): DataFrame = {
    graft.functions.PolyHashFunctions.ensureRegistered(docs.sparkSession)
    docs
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("source"), col("w"),
        explode(sequence(lit(0),
          floor((size(col("w")) - 1) / 8).cast("int"))).as("s"))
      .select(col("doc_id"), col("source"),
        (col("doc_id") * lit(1048576L) + col("s")).as("k"),
        expr("poly_hash(array_join(slice(w, s*8+1, 8), ' '))").as("h"),
        least(lit(8), size(col("w")) - col("s") * 8).cast("long").as("n_toks"))
  }

  /** Start the gate over a streaming frame carrying
    * (doc_id, source, text). Per-source survival stats (the x139 report
    * schema plus batch_id; `keep_ratio` is per-batch — re-derive the
    * corpus ratio from summed token columns, ratios don't add) land
    * under `statsPath/batch_id=<id>`; kept
    * segment hashes under `registryPath/batch_id=<id>` (seed any
    * pre-existing corpus under batch_id=-1 with columns (h, k)). */
  def startSegmentDedup(
      newDocs: DataFrame,
      registryPath: String,
      statsPath: String,
      checkpoint: String): StreamingQuery =
    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val standing = spark.read
          .schema("h BIGINT, k BIGINT, batch_id BIGINT")
          .parquet(registryPath)
          .filter(col("batch_id") =!= batchId)
          .select(col("h"))
        val occ = segments(batch.toDF())
        // first-writer-wins within the batch, then against the registry;
        // materialized eagerly so both writes below see one computation
        val winners = occ.groupBy(col("h")).agg(min(col("k")).as("kmin"))
          .join(standing, Seq("h"), "left_anti")
        val judged = occ
          .join(winners, Seq("h"), "left")
          .withColumn("kept", col("kmin").isNotNull && col("k") === col("kmin"))
          .localCheckpoint(true)
        judged
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_segments"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            sum(col("n_toks")).as("tokens_before"),
            sum(when(col("kept"), col("n_toks")).otherwise(0L)).as("tokens_after"),
            (sum(when(col("kept"), col("n_toks")).otherwise(0L)).cast("double")
              / sum(col("n_toks"))).as("keep_ratio"))
          .write.mode("overwrite").parquet(s"$statsPath/batch_id=$batchId")
        judged.filter(col("kept")).select(col("h"), col("k"))
          .write.mode("overwrite").parquet(s"$registryPath/batch_id=$batchId")
        Dedup.release(judged)
      }
      .start()
}
