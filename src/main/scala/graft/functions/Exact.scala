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

  // ---- primitive-long limb sums: the codegen fast path -----------------
  //
  // `sum(decimal)` promotes past precision 18, so Spark accumulates every
  // row through a heap BigDecimal — the dominant cost of the exact gold
  // aggregations. Instead: represent each value as its exact scale-4 (or
  // scale-6) integer, split that into three 6-digit limbs, and sum each
  // limb with the built-in long Sum (whole-stage codegen, primitive
  // adds, no allocation). The exact decimal is rebuilt from the three
  // limb sums once per GROUP, where decimal arithmetic is negligible.
  //
  // No limb carries during accumulation: each per-row limb is < 10^6, so
  // a limb sum stays below 2^63 up to ~9.2e12 rows per group — beyond
  // any 100 TB group. Values are identical, bit-for-bit, to the
  // `sum(decimal)` forms (integer arithmetic is exact; the rebuild
  // produces the same decimal the oracle computes).

  val L6 = 1000000L
  val L12 = 1000000000000L

  /** Per-row exact scale-`dp` integer of a double whose true value
    * carries at most `dp` decimals. The +0.5/truncate form lands on the
    * exact integer because the double is within machine epsilon of a
    * `dp`-decimal value (data discipline: testdata carries ≤2 decimals;
    * scale 4 mirrors the decimal(18,4) casts). Null-safe: null in → null
    * out, so limb Sums skip exactly the rows COUNT(col) skips. */
  def unscaledLong(c: Column, dp: Int): Column = {
    val m = math.pow(10, dp)
    when(c >= 0, (c * m + 0.5d).cast("long"))
      .otherwise(-((c * -m + 0.5d).cast("long")))
  }

  /** Integral (truncating) long division — pairs with `%` so that
    * u == (u div d)*d + (u % d) holds for negative values too. */
  private def ldiv(a: Column, d: Long): Column =
    call_function("div", a, lit(d))

  private def limbName(tag: String, i: Int) = s"__${tag}_l$i"

  /** The limb columns of `tag` by name — for passing through a select
    * between the aggregation and the rebuild. */
  def limbCols(tag: String): Seq[Column] = (0 to 2).map(i => col(limbName(tag, i)))

  /** The three limb-sum aggregate columns for an unscaled-long summand;
    * place inside `.agg(...)`, then rebuild with [[limbValue]]. */
  def limbAggs(tag: String, u: Column): Seq[Column] = Seq(
    sum(u % L6).as(limbName(tag, 0)),
    sum(ldiv(u, L6) % L6).as(limbName(tag, 1)),
    sum(ldiv(u, L12)).as(limbName(tag, 2))
  )

  /** Second-phase re-aggregation of limb columns (limb sums are plain
    * long sums — associative, so re-aggregating partial sums is exact). */
  def limbReaggs(tag: String): Seq[Column] =
    (0 to 2).map(i => sum(col(limbName(tag, i))).as(limbName(tag, i)))

  /** Window-sum versions of the limbs over `w` (for tiny aggregated
    * frames where a window replaces a self-join re-aggregation). */
  def limbWindowSums(tag: String, w: org.apache.spark.sql.expressions.WindowSpec): Seq[Column] =
    (0 to 2).map(i => sum(col(limbName(tag, i))).over(w).as(limbName(tag, i)))

  /** Exact decimal rebuilt from the three limb sums at `scale` — the
    * same value `sum(CAST(x AS DECIMAL(18,scale)))` produces. Decimal
    * arithmetic here runs once per group, not per row. */
  def limbValue(tag: String, scale: Int = 4): Column = {
    val unscaledTotal =
      col(limbName(tag, 2)).cast("decimal(20,0)") * lit(L12).cast("decimal(13,0)") +
        col(limbName(tag, 1)).cast("decimal(20,0)") * lit(L6).cast("decimal(7,0)") +
        col(limbName(tag, 0)).cast("decimal(20,0)")
    unscaledTotal * lit(new java.math.BigDecimal(java.math.BigInteger.ONE, scale))
  }

  /** [[limbValue]] from explicit limb columns (e.g. window sums). */
  def limbValueOf(l0: Column, l1: Column, l2: Column, scale: Int): Column = {
    val unscaledTotal =
      l2.cast("decimal(20,0)") * lit(L12).cast("decimal(13,0)") +
        l1.cast("decimal(20,0)") * lit(L6).cast("decimal(7,0)") +
        l0.cast("decimal(20,0)")
    unscaledTotal * lit(new java.math.BigDecimal(java.math.BigInteger.ONE, scale))
  }

  /** Twin of [[exactSum]] over limb sums: the exact decimal as DOUBLE. */
  def limbSumDouble(tag: String, scale: Int = 4): Column =
    limbValue(tag, scale).cast(DoubleType)

  /** Twin of [[exactAvg]]: exact-decimal sum as double / count. */
  def limbAvg(tag: String, cnt: Column, scale: Int = 4): Column =
    limbSumDouble(tag, scale) / cnt
}
