package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-text corpus ingestion: line-per-document text files (the common
  * crawl-dump / dataset-drop layout) → the `documents` shape, content-
  * addressed so exact dedup is a groupBy on the hash.
  *
  * Paths are URIs (`s3a://…` works unchanged); file provenance rides in
  * via the `_metadata` hidden column (no deprecated input_file_name).
  * At 100 TB the batch form is a pure scan + per-row projection — no
  * shuffle until a downstream dedup groups by `doc_hash`.
  */
object TextIngest {

  /** Batch ingestion: one row per non-blank line, with an md5 content
    * address, source-file provenance, and length metadata. */
  def ingestTextFiles(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(col("value"), col("_metadata.file_path").as("source_file"))
      .filter(length(trim(col("value"))) > 0)
      .select(
        md5(col("value").cast("binary")).as("doc_hash"),
        col("value").as("text"),
        col("source_file"),
        length(col("value")).cast("long").as("n_chars")
      )

  /** Per-row quality enrichment: whitespace + BPE-ish token counts and
    * the length/stopword quality score, appended to any frame with a
    * `text` column. Stateless per-row expressions — the SAME function
    * works on a batch frame and on a `readStream` frame, so a streaming
    * curation gate (filter on quality before landing) is just
    * `streamTextFiles(...).transform(withQualitySignals).filter(...)`. */
  def withQualitySignals(df: DataFrame): DataFrame = {
    val nTok = graft.functions.Text.tokenCount("text")
    val stops = expr(graft.functions.Text.wordCountSql("text", "the"))
    df.withColumn("n_tokens", nTok)
      .withColumn("n_regex_tokens", graft.functions.Text.regexTokenCount("text"))
      .withColumn("quality",
        graft.functions.Text.qualityScore(col("n_tokens"), stops))
  }

  /** Continuous ingestion: the same projection over `readStream`, with
    * exact content dedup bounded to a processing-time `horizon` —
    * `dropDuplicatesWithinWatermark` keeps one state entry per distinct
    * document seen inside the horizon, so state is (horizon × ingest
    * rate), not corpus size. Re-drops of old files beyond the horizon
    * are a downstream batch-dedup concern (Dedup.exact). */
  def streamTextFiles(spark: SparkSession, path: String, horizon: String): DataFrame =
    spark.readStream.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        md5(col("value").cast("binary")).as("doc_hash"),
        col("value").as("text"),
        current_timestamp().as("ingest_ts"),
        length(col("value")).cast("long").as("n_chars")
      )
      .withWatermark("ingest_ts", horizon)
      .dropDuplicatesWithinWatermark("doc_hash")
}
