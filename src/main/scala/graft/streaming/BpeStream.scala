package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Corpus

/** Streaming twin of x177's trained-tokenizer fertility — BPE
  * SEGMENTATION AT INGEST. The tokenizer is trained ONCE on a seed
  * corpus ([[buildTokenizer]] → the ordered merge table, the actual
  * BPE artifact) and every arriving micro-batch is segmented against
  * that FROZEN table: symbols are built for the batch's own
  * vocabulary and the merges replay in training order
  * ([[Corpus.bpeApplyMerges]]), so NOVEL words — which serving
  * streams, unlike the batch query, genuinely see — segment exactly
  * as a reference BPE encoder would, rather than being dropped by a
  * closed tokens-per-word vocabulary.
  *
  * Because merge application is per-word deterministic once the table
  * is frozen, stream rows equal batch [[Corpus.bpeFertility]] rows
  * over any partition of the corpus (BpeStreamSpec). The merge table
  * (≤ rounds rows) is collected once at start and pinned — no
  * micro-batch pays a parquet re-read of the frozen artifact (the
  * [[DsirStream]]/[[SqStream]] load-and-pin economics).
  *
  * Per batch, the gate-family layout: per-doc fertility rows under
  * `outPath/batch_id=<id>`, one exact-integer metrics row under
  * `metricsPath/batch_id=<id>` (overwrite → idempotent replays).
  */
object BpeStream {

  /** Train the tokenizer on a seed corpus and persist the ordered
    * merge table at `tokenizerPath`. Run once per release. */
  def buildTokenizer(
      seedDocs: DataFrame,
      tokenizerPath: String,
      idCol: String,
      textCol: String,
      rounds: Int = 8): Unit = {
    val (merges, _) = Corpus.bpeTrain(seedDocs, idCol, textCol, rounds)
    val spark = seedDocs.sparkSession
    import spark.implicits._
    merges.map { case (r, a, b, pc) => (r.toLong, a, b, pc) }
      .toDF("merge_round", "left_sym", "right_sym", "pair_count")
      .coalesce(1)
      .write.mode("overwrite").parquet(tokenizerPath)
  }

  /** Start the segmenter over a streaming frame carrying (`idCol`,
    * `textCol`), tokenizing against the standing table at
    * `tokenizerPath`. */
  def startBpeTokenize(
      newDocs: DataFrame,
      tokenizerPath: String,
      outPath: String,
      metricsPath: String,
      checkpoint: String,
      idCol: String,
      textCol: String): StreamingQuery = {
    val merges: Seq[(String, String)] = newDocs.sparkSession.read
      .parquet(tokenizerPath)
      .orderBy(col("merge_round"))
      .select(col("left_sym"), col("right_sym")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val fert = Corpus.bpeApplyMerges(
          batch.select(col(idCol), col(textCol)), idCol, textCol, merges)
          .transform(graft.plans.Pin.pin)
        fert.write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        fert.agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_words"),
          sum(col("n_bpe_tokens")).as("n_bpe_tokens"))
          .write.mode("overwrite").parquet(s"$metricsPath/batch_id=$batchId")
        graft.operators.Dedup.release(fert)
      }
      .start()
  }
}
