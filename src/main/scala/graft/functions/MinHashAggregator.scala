package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature aggregator (SURVEY.md §7.4): folds a group's
  * shingle hashes into an 8-component signature in ONE aggregate buffer —
  * the `Aggregator`/`TypedImperativeAggregate`-style form of the 8
  * separate MIN aggregates used by the oracle-checked x03 query. The
  * permutation constants are shared with x03 (graft.operators
  * .TrainingData), so both forms produce identical signatures.
  *
  * Usage: `functions.udaf(new MinHashAggregator)` registered or applied
  * as a column over the shingle-hash column, grouped by doc.
  */
class MinHashAggregator extends Aggregator[Long, Array[Long], Array[Long]] {

  import MinHashAggregator._

  override def zero: Array[Long] = Array.fill(NumHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingleHash: Long): Array[Long] = {
    var j = 0
    while (j < NumHashes) {
      val h = (shingleHash * A(j) + B(j)) % P
      if (h < buf(j)) buf(j) = h
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < NumHashes) {
      if (b(j) < a(j)) a(j) = b(j)
      j += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAggregator {
  val NumHashes = 8
  val P: Long = 1000000007L
  /** Same permutation constants as x03_dedup_minhash. */
  val A: Array[Long] = Array(1000003L, 1000033L, 1000037L, 1000039L,
    1000081L, 1000099L, 1000117L, 1000121L)
  val B: Array[Long] = A.indices.map(j => j * 7919L + 13L).toArray
}
