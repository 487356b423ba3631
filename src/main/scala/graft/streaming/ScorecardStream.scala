package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Corpus

/** Streaming per-source scorecard — the exact-aggregation-over-batches
  * pattern: each micro-batch of incoming documents is scored against a
  * FIXED reference unigram LM ([[Corpus.unigramLm]], learned once at
  * stream start) and reduced to per-source PARTIAL rows
  * (n_docs / n_tokens / exact decimal surprisal sum), which land under
  * `partialsPath/batch_id=<id>`. Because every partial column is an
  * associative sum, [[Corpus.scorecardFromPartials]] over the partial
  * table reconstructs the whole-stream scorecard EXACTLY — equal to
  * scoring all documents in one batch (pinned in ScorecardStreamSpec) —
  * with no keyed streaming state at all and no rescan of document text.
  *
  * This is how exact decimal statistics survive streaming at scale: the
  * per-batch work is corpus-scan sized, the standing state is the
  * partial table (|sources| rows per batch), and a replayed batch
  * overwrites its own partition, keeping the merge idempotent (same
  * layout contract as the other stream twins).
  */
object ScorecardStream {

  /** Start scoring `newDocs` (carrying `textCol`, `srcCol`) against the
    * LM learned from `reference`. */
  def startScorecard(
      newDocs: DataFrame,
      reference: DataFrame,
      partialsPath: String,
      checkpoint: String,
      textCol: String,
      srcCol: String): StreamingQuery = {
    // learned once: vocabulary-sized, pinned for the stream's lifetime
    val lm = Corpus.unigramLm(reference, textCol).transform(graft.plans.Pin.pin)
    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        Corpus.lmPartialScorecard(batch, lm, textCol, srcCol)
          .write.mode("overwrite").parquet(s"$partialsPath/batch_id=$batchId")
      }
      .start()
  }

  /** The live scorecard: one merge over the partial table. */
  def scorecard(spark: SparkSession, partialsPath: String): DataFrame =
    Corpus.scorecardFromPartials(spark.read.parquet(partialsPath))
}
