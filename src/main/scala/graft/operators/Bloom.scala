package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Bloom-filter build + codegen membership pruning — the
  * runtime-filter pattern for 100 TB joins (the manual form of Spark's
  * own `InjectRuntimeFilter`, here under caller control so the pruned
  * scan can be pinned and the filter reused across queries).
  *
  * Why it matters at scale: a fact-side shuffle is priced per row that
  * ENTERS the exchange. When the dimension side is selective (one nation
  * of suppliers, one day of orders), most fact rows can be proven
  * non-joining by a few bits — so the membership test runs INSIDE the
  * fact scan's codegen stage, before the exchange, and the shuffle pays
  * only for survivors. False positives are fine (the exact join removes
  * them); false negatives are impossible (every build key sets its bits,
  * pinned in BloomSpec), so results are identical to the unpruned join.
  *
  * Build shape: k bit positions per key (xxhash64 seeded per probe) are
  * exploded and OR-combined per 64-bit word in ONE distributed aggregate
  * of ≤ numBits/64 rows; only that word list is collected. This is the
  * same driver-sized-sketch discipline as Spark's BloomFilterAggregate —
  * a 1 M-bit filter is 16 KB of longs regardless of build-side row count.
  * The collected filter embeds in probe plans as an array literal, so the
  * membership conjunction is pure codegen (element_at + bit ops): no UDF,
  * no broadcast variable, serialized once with the plan.
  */
object Bloom {

  /** An immutable built filter; `words` holds numBits as 64-bit words. */
  final case class Filter(numBits: Int, numHashes: Int, words: Array[Long]) {

    /** Codegen membership test: true iff every probe bit for `key` is
      * set. May return true for non-members (false-positive rate ~
      * (1 - e^{-kn/m})^k); never false for a member. */
    def mightContain(key: Column): Column = {
      val wordsLit = typedLit(words.toSeq)
      (0 until numHashes)
        .map { i =>
          val pos = pmod(xxhash64(key, lit(i)), lit(numBits.toLong))
          val word = element_at(wordsLit, shiftright(pos, 6).cast("int") + 1)
          val mask = call_function("shiftleft", lit(1L), pmod(pos, lit(64L)).cast("int"))
          word.bitwiseAND(mask) =!= lit(0L)
        }
        .reduce(_ && _)
    }

    /** Approximate fill factor (set bits / total) — the health signal:
      * above ~0.5 the false-positive rate degrades fast and `numBits`
      * should grow. */
    def saturation: Double =
      words.map(java.lang.Long.bitCount(_).toLong).sum.toDouble / numBits
  }

  /** Build a filter over `keys`' `keyCol` in one distributed aggregate.
    * `numBits` must be a multiple of 64; size it at ~10 bits per expected
    * distinct key for ~1% false positives at k=3. */
  def build(
      keys: DataFrame,
      keyCol: Column,
      numBits: Int = 1 << 20,
      numHashes: Int = 3): Filter = {
    require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64: $numBits")
    val positions = keys.select(
      explode(array(
        (0 until numHashes).map(i => pmod(xxhash64(keyCol, lit(i)), lit(numBits.toLong))): _*
      )).as("pos"))
    val wordRows = positions
      .select(
        shiftright(col("pos"), 6).cast("int").as("w"),
        call_function("shiftleft", lit(1L), pmod(col("pos"), lit(64L)).cast("int")).as("bit"))
      .groupBy(col("w"))
      .agg(expr("bit_or(bit)").as("bits"))
      .collect()
    val words = new Array[Long](numBits / 64)
    wordRows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    Filter(numBits, numHashes, words)
  }

  /** Equi-join with the big side Bloom-pruned before the join: builds a
    * filter over `small`'s key and applies it inside `big`'s scan stage,
    * then performs the exact join (inner), which removes any false
    * positives. Result ≡ `big.join(small, bigKey === smallKey)`. */
  def prunedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: Column,
      smallKey: Column,
      numBits: Int = 1 << 20,
      numHashes: Int = 3): DataFrame = {
    val filter = build(small, smallKey, numBits, numHashes)
    big.filter(filter.mightContain(bigKey)).join(small, bigKey === smallKey)
  }
}
