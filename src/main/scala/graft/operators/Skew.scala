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
  */
object Skew {

  /** Two-phase salted COUNT/SUM aggregation: groupBy (key, salt) first,
    * then re-aggregate per key. `sums` maps output column name → summand
    * column; counts ride along as sums of 1. */
  def saltedSum(
      df: DataFrame,
      key: Column,
      salts: Int,
      sums: Map[String, Column]
  ): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
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
    val saltedLeft = left.withColumn(
      "__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val replicatedRight = right.withColumn(
      "__salt", explode(array((0 until salts).map(lit(_)): _*)))
    saltedLeft
      .join(replicatedRight,
        leftKey === rightKey && saltedLeft("__salt") === replicatedRight("__salt"))
      .drop("__salt")
  }
}
