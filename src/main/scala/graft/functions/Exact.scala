package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Oracle-exact numeric aggregation helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * `oracleSql` text. Floating-point SUM/AVG are order-dependent, and Spark
  * partitioned sums do not add in the same order as DuckDB's scan — so a
  * plain `avg(double)` would be off by ulps and fail the hash.
  *
  * Fix: aggregate in exact decimal, then convert once to double.
  *   sum:  CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)
  *   avg:  sum_exact / COUNT(x)          -- one IEEE division, bit-identical
  * The double→decimal(18,4) cast is itself deterministic (round-to-nearest
  * of the same binary value in both engines; data carries ≤2 decimals, so
  * scale 4 is beyond data precision and never sits on a rounding boundary).
  *
  * The matching SQL text builders live here too so each query's Spark and
  * DuckDB formulations can never drift apart.
  */
object Exact {
  val Dec: DecimalType = DecimalType(18, 4)

  /** Exact SUM over a numeric column, returned as DOUBLE. */
  def exactSum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Exact SUM over an already-decimal expression (product chains),
    * returned as DOUBLE. The sum is rounded to scale 4 first: at scale
    * 8–12 the unscaled value exceeds 2^53 and DuckDB's decimal→double
    * cast is no longer correctly rounded (int128 → double → divide),
    * while Spark's BigDecimal.doubleValue is — they'd disagree by ulps.
    * After rounding to scale 4 the unscaled value is exact in double and
    * a single IEEE division yields the correctly-rounded result in both
    * engines. */
  def exactSumDec(c: Column): Column = round(sum(c), 4).cast(DoubleType)

  /** SQL twin of [[exactSumDec]]: wrap around `SUM(<decimal product>)`. */
  def sqlSumDec(e: String): String =
    s"CAST(round(SUM($e), 4) AS DOUBLE)"

  /** Exact AVG of an already-decimal expression, as DOUBLE. */
  def exactAvgDec(c: Column): Column = exactSumDec(c) / count(lit(1))

  /** SQL twin of [[exactAvgDec]]. */
  def sqlAvgDec(e: String): String = s"${sqlSumDec(e)} / COUNT(*)"

  /** Exact AVG (sum_exact / count), bit-identical with the SQL twin. */
  def exactAvg(c: Column): Column = exactSum(c) / count(c)

  /** Narrow decimal for exact multiply chains. Derived doubles must NOT be
    * cast to decimal (the engines' double→decimal roundings can disagree at
    * representation boundaries); instead cast each base column — whose data
    * carries ≤2 decimals, so the cast is boundary-free — and multiply in
    * exact decimal arithmetic. Widths are kept small so 3-factor products
    * stay under DECIMAL(38) in both engines. */
  def dec(c: Column): Column = c.cast(DecimalType(12, 4))
  def decOne: Column = lit(1).cast(DecimalType(5, 4))
  def sqlDec(x: String): String = s"CAST($x AS DECIMAL(12,4))"
  def sqlDecOne: String = "CAST(1 AS DECIMAL(5,4))"

  /** SQL twin of [[exactSum]]. */
  def sqlSum(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"

  /** SQL twin of [[exactAvg]]. */
  def sqlAvg(x: String): String = s"${sqlSum(x)} / COUNT($x)"

  /** Integer conditional count: SUM(CASE WHEN cond THEN 1 ELSE 0 END).
    * Spark returns LongType; the SQL twin casts to BIGINT because DuckDB
    * would otherwise widen SUM(int) to HUGEINT (int128). */
  def countIf(cond: Column): Column =
    sum(when(cond, 1L).otherwise(0L))

  def sqlCountIf(cond: String): String =
    s"CAST(SUM(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT)"

  /** COUNT(*) as BIGINT on both sides. */
  def sqlCount: String = "CAST(COUNT(*) AS BIGINT)"
}
