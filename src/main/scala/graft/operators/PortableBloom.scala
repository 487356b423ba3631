package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic Bloom filter over `poly_hash` gram hashes
  * — the membership structure for decontamination when the benchmark
  * side outgrows a raw broadcast set (multi-benchmark suites reach 10⁹
  * grams ≈ 8 GB of raw hashes; this filter is a FIXED-size bit array).
  *
  * Distinct from [[Bloom]] (the xxhash64 runtime-filter for join
  * pruning, where false positives only cost work): here the bit pattern
  * itself is an OUTPUT CONTRACT — the contaminated-doc report including
  * the filter's false positives must hash-match the DuckDB oracle — so
  * every step is exact integer arithmetic both engines reproduce:
  *  - probe `s` of hash `h` (h < P = 1e9+7) sets bit
  *    `((h·A_s + s) mod P) mod numBits` with A_s ∈ {31,37,41,43} —
  *    products stay < 2³⁶, no overflow in either engine, no libm;
  *  - the array is stored as 63-bit words (`word = pos DIV 63`,
  *    `bit = pos mod 63`): a 64-bit layout needs `1L << 63`, which
  *    DuckDB rejects as signed overflow — max shift here is 62;
  *  - words aggregate with `bit_or` (associative/commutative →
  *    identical under any partitioning).
  * Zero false negatives by construction; the false-positive rate is
  * the standard (1 − e^(−kn/m))^k and is measured, not bounded, by
  * PortableBloomSpec.
  */
object PortableBloom {
  val P: Long = 1000000007L
  /** Filter size in bits. 2¹⁶ suits the test corpora (~½ bit per bench
    * gram); deployments size this at ~10 bits per expected gram. Every
    * function takes it as a parameter so the layout is not baked in. */
  val DefaultNumBits: Int = 65536
  val ProbeMults: Seq[Long] = Seq(31L, 37L, 41L, 43L)

  private def posCol(h: Column, s: Int, numBits: Int): Column =
    ((h * lit(ProbeMults(s)) + lit(s.toLong)) % lit(P)) % lit(numBits.toLong)

  /** One row per (input row, probe): input columns + `pos`. */
  private def withPositions(df: DataFrame, hCol: String, numBits: Int): DataFrame =
    df.withColumn("pos",
      explode(array(ProbeMults.indices.map(s => posCol(col(hCol), s, numBits)): _*)))

  /** Build the filter from a frame of hashes: (`word`: Long, `bits`:
    * Long), ≤ ⌈numBits/63⌉ rows — always broadcastable no matter how
    * many hashes went in. One explode + one map-side-combined `bit_or`
    * shuffle of ≤ ⌈numBits/63⌉ keys. */
  def build(hashes: DataFrame, hCol: String,
      numBits: Int = DefaultNumBits): DataFrame =
    withPositions(hashes.select(col(hCol)), hCol, numBits)
      .select(expr("pos DIV 63").as("word"), (col("pos") % 63).as("bit"))
      .groupBy(col("word"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)))").as("bits"))

  /** Probe: returns one row per distinct `keyCols` group of `grams`,
    * plus `bloom_hit` (1 = all probe bits set — member or false
    * positive; 0 = definitely absent). The filter frame is broadcast;
    * the corpus side is one explode + one group-back on the key columns
    * (4 rows/gram in flight, never materialized). */
  def hits(grams: DataFrame, keyCols: Seq[String], hCol: String,
      bloom: DataFrame, numBits: Int = DefaultNumBits): DataFrame =
    withPositions(grams, hCol, numBits)
      .withColumn("word", expr("pos DIV 63"))
      .withColumn("bit", col("pos") % 63)
      .join(broadcast(bloom), Seq("word"), "left")
      .withColumn("set",
        coalesce(expr("shiftright(bits, CAST(bit AS INT)) & 1"), lit(0L)))
      .groupBy(keyCols.map(col): _*)
      .agg(min(col("set")).cast("int").as("bloom_hit"))

  /** Oracle-side (DuckDB) replica of [[build]] + [[hits]] as CTE text:
    * given CTEs `bench(h)` and `train(doc_id, h)` already in scope,
    * emits `bloomf(word, bits)` and `th(doc_id, h, hit)`. Kept next to
    * the engine arithmetic so the two can never drift apart. */
  def duckCtes(numBits: Int = DefaultNumBits): String = {
    val probes = ProbeMults.zipWithIndex
      .map { case (m, s) => s"(CAST($s AS BIGINT), CAST($m AS BIGINT))" }
      .mkString(", ")
    s"pr AS (SELECT * FROM (VALUES $probes) t(s, m)), " +
      s"bpos AS (SELECT ((b.h * pr.m + pr.s) % $P) % $numBits AS pos " +
      "FROM bench b CROSS JOIN pr), " +
      "bloomf AS (SELECT pos // 63 AS word, " +
      "bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS bits " +
      "FROM bpos GROUP BY pos // 63), " +
      s"tpos AS (SELECT t.doc_id, t.h, ((t.h * pr.m + pr.s) % $P) % $numBits AS pos " +
      "FROM train t CROSS JOIN pr), " +
      "th AS (SELECT doc_id, h, CAST(MIN(CASE WHEN ((bl.bits >> CAST(t.pos % 63 AS INT)) & 1) = 1 " +
      "THEN 1 ELSE 0 END) AS INT) AS hit " +
      "FROM tpos t LEFT JOIN bloomf bl ON t.pos // 63 = bl.word " +
      "GROUP BY doc_id, h)"
  }
}
