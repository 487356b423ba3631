package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Corpus, PortableBloom}

/** Streaming twin of x145's Bloom-filter decontamination gate — the
  * ingest-time form whose standing state is the FILTER ITSELF: a
  * fixed-size bit-array frame (≤ ⌈numBits/63⌉ rows) built once from the
  * benchmark suite and probed by every arriving micro-batch. This is
  * the deployment shape the portable filter exists for: at 100 TB the
  * raw benchmark gram set (10⁹ grams ≈ 8 GB) cannot ride along with an
  * ingest stream, but its 8 KB–multi-MB filter can — per-batch cost is
  * one explode + one broadcast probe join + one per-doc aggregate,
  * independent of benchmark size, and the benchmark itself is never
  * re-read after [[buildFilter]].
  *
  * Stream ≡ batch exactly (BloomStreamSpec): the verdict is per-doc
  * (no cross-doc state), so the union of per-batch reports over any
  * partition of the corpus into batches equals batch x145 over the
  * whole corpus — including the deterministic false positives, which
  * depend only on the filter bits, fixed at build time.
  *
  * Idempotence: each batch's report lands under
  * `reportsPath/batch_id=<id>` with overwrite mode (the [[StreamSinks]]
  * pattern); replays overwrite their previous attempt; no cross-batch
  * state exists to corrupt.
  */
object BloomStream {

  /** Build the portable filter from a benchmark document frame and
    * persist it at `filterPath` (a ≤ ⌈numBits/63⌉-row parquet). Run
    * once per benchmark release; streams only ever read the filter. */
  def buildFilter(
      benchDocs: DataFrame,
      filterPath: String,
      idCol: String,
      textCol: String,
      numBits: Int = PortableBloom.DefaultNumBits): Unit = {
    val grams = Corpus.gramHashes(benchDocs, idCol, textCol)
      .select(col("h")).distinct()
    PortableBloom.build(grams, "h", numBits).write.mode("overwrite")
      .parquet(filterPath)
  }

  /** Start the gate over a streaming frame carrying (`idCol`,
    * `textCol`). Per-doc report rows (idCol, n_grams, n_bloom_hits,
    * bloom_hit_frac, bloom_contaminated — the x145 schema) land under
    * `reportsPath/batch_id=<id>`; docs shorter than the gram width
    * carry no evidence and produce no row, as in batch. */
  def startBloomGate(
      newDocs: DataFrame,
      filterPath: String,
      reportsPath: String,
      checkpoint: String,
      idCol: String,
      textCol: String,
      numBits: Int = PortableBloom.DefaultNumBits): StreamingQuery =
    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val bloom = spark.read.parquet(filterPath)
        val grams = Corpus.gramHashes(
          batch.select(col(idCol), col(textCol)), idCol, textCol)
        val report = PortableBloom
          .hits(grams, Seq(idCol, "h"), "h", bloom, numBits)
          .groupBy(col(idCol))
          .agg(count(lit(1)).as("n_grams"),
            sum(col("bloom_hit")).cast("long").as("n_bloom_hits"))
          .select(col(idCol), col("n_grams"), col("n_bloom_hits"),
            (col("n_bloom_hits").cast("double") / col("n_grams"))
              .as("bloom_hit_frac"),
            (col("n_bloom_hits") > 0).as("bloom_contaminated"))
        report.write.mode("overwrite")
          .parquet(s"$reportsPath/batch_id=$batchId")
      }
      .start()
}
