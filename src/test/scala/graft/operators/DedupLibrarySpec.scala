package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Library-surface behaviors not covered by the oracle queries. */
class DedupLibrarySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("dedup-lib-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val docs = Tables(spark, "/root/testdata/sf0.01").documents

  test("hot-shingle cap prunes candidates but keeps near-identical pairs") {
    val uncapped = Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.9)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.nonEmpty)
    // cap at a doc frequency well above near-dup shingle counts: the same
    // near-identical pairs must survive (their shingles are rare)
    val capped = Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.9,
        maxDocFreq = Some(50L))
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.subsetOf(capped) || capped.subsetOf(uncapped))
    assert(capped.intersect(uncapped) === uncapped.intersect(capped))
    assert(capped.nonEmpty)
  }

  test("hashed shingle keys find the same near-dup pairs as string keys") {
    // ~2^30 hash space vs a few hundred thousand shingles: collisions are
    // rare enough that the pair inventory at a high threshold is identical
    val viaStrings = Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaHashes = Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5, hashShingles = true)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaStrings.nonEmpty)
    assert(viaHashes === viaStrings)
  }

  test("prefix-filtered Jaccard pairs equal the naive inverted-index join") {
    for (t <- Seq(0.5, 0.9)) {
      val naive = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = t)
        .select("doc_a", "doc_b", "common")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val prefix = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", threshold = t)
        .select("doc_a", "doc_b", "common")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(naive.nonEmpty, s"t=$t")
      assert(prefix === naive, s"t=$t")
    }
  }

  test("connectedComponents: chains, stars, and isolated pairs converge to min roots") {
    import spark.implicits._
    // component A: chain 10-11-12-13-14 (diameter 4 → needs >1 round)
    // component B: star centered at 20; component C: lone pair (30, 31)
    val pairs = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L),
      (20L, 21L), (20L, 22L), (20L, 23L),
      (30L, 31L)
    ).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((10L to 14L).forall(cc(_) === 10L))
    assert((20L to 23L).forall(cc(_) === 20L))
    assert(cc(30L) === 30L && cc(31L) === 30L)
    assert(cc.size === 11)
  }

  test("lshBuckets is deterministic across repartitioning") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val b1 = Dedup.lshBuckets(e, "vec_id", "embedding")
      .select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = Dedup.lshBuckets(e.repartition(7), "vec_id", "embedding")
      .select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 === b2)
    assert(b1.values.toSet.size > 1) // vectors actually spread over buckets
  }
}
