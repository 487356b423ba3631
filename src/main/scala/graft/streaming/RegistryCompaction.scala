package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared registry-compaction protocol for the standing-state streams.
  *
  * Every standing-registry stream here (PHash signatures, segment/span
  * hashes, novelty grams, chunk hashes, the incremental-dedup corpus,
  * the embedding registry) follows the same layout: one parquet
  * partition `batch_id=<id>` per micro-batch, the full registry
  * re-read every batch with the CURRENT batch's partition excluded (so
  * a replayed batch overwrites its previous attempt instead of judging
  * against it). Correct forever — but at stream scale the small files
  * accumulate and the per-batch scan amortizes badly. This utility
  * folds the standing partitions into a single negative partition
  * every N batches, preserving semantics for every registry whose
  * rows form a SET (all of the above: consumers take membership or
  * MIN per key, never row counts — a `.distinct()` fold changes
  * neither). Measured (BENCH_NEW_r15 `registry_compaction`): over a
  * 40-batch sf0.1 segment-dedup stream, compactEvery=8 cuts total
  * stream wall ~34 % and steady-state per-batch cost ~30 % including
  * the folds' own cost — and the uncompacted gap only widens with
  * stream lifetime.
  *
  * Protocol (crash-safe against a replay of the compacting batch
  * stopping at ANY point — PHashCompactProtocolSpec replays each
  * window directly):
  *
  *   1. write `distinct(standing)` to the hidden dir `_compact_tmp`
  *      (underscore-prefixed: partition discovery never sees it);
  *      Spark's `_SUCCESS` marker records completion.
  *   2. delete every `batch_id=*` partition except the compacting
  *      batch's own (including any prior crashed attempt's target).
  *   3. rename tmp → `batch_id=-(batchId+2)` (atomic directory move;
  *      negative, so it can never collide with a real batch id or the
  *      conventional -1 seed partition).
  *
  * A replay finding a COMPLETE tmp (marker present) skips step 1 — the
  * tmp already holds the full fold, and recomputing it after a partial
  * delete would lose the deleted partitions' rows — and just finishes
  * the delete + rename. A replay finding no tmp recomputes from
  * whatever partitions remain (either nothing was folded yet, or a
  * finished compaction already renamed — then nothing is left to
  * subsume and the call is a no-op). The `.distinct()` makes the fold
  * idempotent across overlapping attempts.
  */
object RegistryCompaction {

  /** Run [[compact]] on the canonical cadence: every `compactEvery`-th
    * batch (0 disables — the default everywhere, preserving the
    * pre-round-15 layout byte-for-byte). */
  def maybeCompact(
      spark: SparkSession,
      registryPath: String,
      batchId: Long,
      compactEvery: Int,
      schema: Option[String] = None): Unit =
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      compact(spark, registryPath, batchId, schema)

  /** Fold every standing partition (everything except `batchId`'s own)
    * into `batch_id=-(batchId+2)`. `schema` (DDL including a
    * `batch_id BIGINT` column) pins the read where the stream itself
    * reads with an explicit schema; None infers from the files. */
  def compact(
      spark: SparkSession,
      registryPath: String,
      batchId: Long,
      schema: Option[String] = None): Unit = {
    val root = new Path(registryPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val target = s"batch_id=${-(batchId + 2)}"
    val tmp = new Path(root, "_compact_tmp")
    val tmpComplete = fs.exists(new Path(tmp, "_SUCCESS"))
    def partitions() = fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.startsWith("batch_id=") &&
        p.getName != s"batch_id=$batchId")
    if (!tmpComplete) {
      if (partitions().isEmpty) return // nothing standing to fold
      val reader = schema.fold(spark.read)(s => spark.read.schema(s))
      val reg = reader.parquet(registryPath)
      reg
        .filter(col("batch_id") =!= batchId)
        .drop("batch_id")
        .distinct()
        .write.mode("overwrite").parquet(tmp.toString)
    }
    partitions().foreach(p => fs.delete(p, true))
    fs.rename(tmp, new Path(root, target))
  }
}
