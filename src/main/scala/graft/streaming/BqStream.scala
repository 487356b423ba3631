package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.Dedup

/** Streaming twin of x168's binary-quantization encoder — the
  * [[SqStream]] discipline applied to the 1-bit tier: arriving vectors
  * are sign-encoded against per-dimension mean thresholds fitted ONCE
  * on a seed corpus ([[Dedup.bqThresholds]], collected here and
  * re-broadcast per batch) and appended as 2-words-per-vector rows.
  *
  * Freezing the thresholds is what makes the registry append-only: the
  * "model" is the per-dimension (sum, count) pair, and a moving-mean
  * encoder would silently flip historical bits whenever arrivals moved
  * a dimension's mean across a stored value. Under frozen thresholds a
  * vector's words depend only on the vector — stream ≡ batch over any
  * partition of the corpus (BqStreamSpec). Unlike SQ8 there is no
  * out-of-range case at all: the sign rule is total on int64.
  *
  * Idempotence: each batch's words land under
  * `codesPath/batch_id=<id>` with overwrite mode.
  */
object BqStream {

  private val thrSchema = StructType(Seq(
    StructField("pos", LongType), StructField("s", LongType),
    StructField("cnt", LongType)))

  /** Start the encoder over a streaming frame carrying (`idCol`,
    * `vecCol`). Word rows (idCol, word, code — the [[Dedup.bqEncode]]
    * schema) land under `codesPath/batch_id=<id>`. `thresholds` is the
    * (pos, s, cnt) frame from [[Dedup.bqThresholds]] — collected once
    * here, so the planes are frozen for the life of the query. */
  def startBqEncode(
      newVecs: DataFrame,
      thresholds: DataFrame,
      codesPath: String,
      checkpoint: String,
      idCol: String,
      vecCol: String): StreamingQuery = {
    val thrRows: Array[Row] = thresholds
      .select(col("pos").cast("long"), col("s").cast("long"),
        col("cnt").cast("long")).collect()
    newVecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val t = spark.createDataFrame(
          spark.sparkContext.parallelize(thrRows.toSeq, 1), thrSchema)
        Dedup.bqEncode(batch.toDF(), idCol, vecCol, t)
          .write.mode("overwrite").parquet(s"$codesPath/batch_id=$batchId")
      }
      .start()
  }
}
