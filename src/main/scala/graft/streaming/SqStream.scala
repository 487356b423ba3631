package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.Dedup

/** Streaming twin of x159's SQ8 encoder — index-at-ingest for the
  * scalar-quantized registry, the [[PqStream]] discipline applied to
  * the other quantizer: each arriving micro-batch's vectors are encoded
  * against per-dimension bounds fitted ONCE on a seed corpus
  * ([[Dedup.sqBounds]], collected here and re-broadcast per batch) and
  * appended to a code registry of 1-byte-per-dim rows.
  *
  * Freezing the bounds matters MORE here than freezing a PQ codebook:
  * SQ8's "model" is the per-dimension [lo, hi] grid itself, so a
  * moving-bounds encoder would silently re-grid EVERY dimension of
  * history whenever one arrival extended a range. Under frozen bounds a
  * vector's codes depend only on the vector — stream ≡ batch over any
  * partition of the corpus (SqStreamSpec) — and an arrival OUTSIDE the
  * seed range saturates to the grid edge ([[Dedup.sqEncode]]'s clamp,
  * the FAISS ScalarQuantizer behavior) instead of wrapping into a
  * foreign code.
  *
  * Idempotence: each batch's codes land under
  * `codesPath/batch_id=<id>` with overwrite mode; replays overwrite
  * their previous attempt; no cross-batch state exists to corrupt.
  */
object SqStream {

  private val boundsSchema = StructType(Seq(
    StructField("pos", LongType), StructField("lo", LongType),
    StructField("hi", LongType), StructField("span", LongType)))

  /** Start the encoder over a streaming frame carrying (`idCol`,
    * `vecCol`). Code rows (idCol, pos, code — the [[Dedup.sqEncode]]
    * schema) land under `codesPath/batch_id=<id>`. `bounds` is the
    * (pos, lo, hi, span) frame from [[Dedup.sqBounds]] — collected once
    * here, so the grid is frozen for the life of the query. */
  def startSqEncode(
      newVecs: DataFrame,
      bounds: DataFrame,
      codesPath: String,
      checkpoint: String,
      idCol: String,
      vecCol: String): StreamingQuery = {
    val boundRows: Array[Row] = bounds
      .select(col("pos").cast("long"), col("lo").cast("long"),
        col("hi").cast("long"), col("span").cast("long")).collect()
    newVecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = spark.createDataFrame(
          spark.sparkContext.parallelize(boundRows.toSeq, 1), boundsSchema)
        Dedup.sqEncode(batch.toDF(), idCol, vecCol, b)
          .write.mode("overwrite").parquet(s"$codesPath/batch_id=$batchId")
      }
      .start()
  }
}
