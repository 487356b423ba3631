package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SCALE.md): salted two-phase aggregation and a
  * replicate-broadcast salted join, for the keys a 100 TB run meets that
  * AQE's runtime skew handling can't fully absorb (e.g. one degenerate
  * shingle or a single hot user).
  *
  * Results are identical to the unsalted forms — the salt only splits the
  * reduce-side state; re-aggregation relies on the same associativity the
  * exact-decimal helpers guarantee (graft.functions.Exact).
  *
  * The salt is derived from row CONTENT (xxhash64 over all columns), not
  * from spark_partition_id()/monotonically_increasing_id(): a content
  * hash is stable under task retry, so a fetch-failure recomputation
  * re-assigns every row the same salt and the two-phase shapes stay
  * exactly-once. (Identical rows share a salt — that only skews the
  * split when one key is dominated by one exact duplicate row, and never
  * affects correctness.)
  */
object Skew {

  /** Deterministic per-row salt in [0, salts): content hash, retry-stable. */
  private def contentSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(salts.toLong))

  /** Two-phase salted COUNT/SUM aggregation: groupBy (key, salt) first,
    * then re-aggregate per key. `sums` maps output column name → summand
    * column; counts ride along as sums of 1. */
  def saltedSum(
      df: DataFrame,
      key: Column,
      salts: Int,
      sums: Map[String, Column]
  ): DataFrame = {
    val salted = df.withColumn("__salt", contentSalt(df, salts))
    val phase1 = salted
      .groupBy(key.as("__key"), col("__salt"))
      .agg(
        sums.map { case (n, c) => sum(c).as(n) }.head,
        sums.map { case (n, c) => sum(c).as(n) }.tail.toSeq: _*
      )
    phase1
      .groupBy(col("__key"))
      .agg(
        sums.keys.map(n => sum(col(n)).as(n)).head,
        sums.keys.map(n => sum(col(n)).as(n)).tail.toSeq: _*
      )
  }

  /** Salted join for a skewed LEFT side against a small-ish right side:
    * left rows get a random salt in [0, salts); the right side is
    * replicated `salts` times so every (key, salt) pair finds its match.
    * Equivalent to `left.join(right, leftKey === rightKey)`. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      salts: Int
  ): DataFrame = {
    val saltedLeft = left.withColumn("__salt", contentSalt(left, salts))
    val replicatedRight = right.withColumn(
      "__salt", explode(array((0 until salts).map(lit(_)): _*)))
    saltedLeft
      .join(replicatedRight,
        leftKey === rightKey && saltedLeft("__salt") === replicatedRight("__salt"))
      .drop("__salt")
  }
}
