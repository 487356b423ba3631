package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.operators.Corpus
import graft.sources.Tables

/** The generalized registry compaction ([[RegistryCompaction]]) wired
  * through representative standing-registry streams: output inventory
  * must be IDENTICAL to the uncompacted run's (which the per-stream
  * specs already pin against the batch operators), the registry's
  * content must survive the folds, and the partition layout must
  * actually collapse. Two representatives cover both read disciplines:
  * SegmentDedupStream (explicit-schema standing read, min-per-key
  * consumer) and NoveltyStream (inferred-schema read, membership
  * consumer). PHashStream's own spec covers the third
  * (pair-generation) shape; PHashCompactProtocolSpec replays the crash
  * windows of the shared protocol directly. */
class RegistryCompactionStreamsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("registry-compaction-streams-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def partitionNames(reg: String): Set[String] =
    new java.io.File(reg).listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).toSet

  test("segment dedup with compactEvery=2 over 5 batches: stats == batch x139, registry folds to winners") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val root = Files.createTempDirectory("segdedup-compact").toString
    val (registryPath, statsPath, ckpt) =
      (s"$root/registry", s"$root/stats", s"$root/ckpt")
    Seq.empty[(Long, Long)].toDF("h", "k")
      .write.parquet(s"$registryPath/batch_id=-1")

    val docs = Tables(spark, sf).documents
      .select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    // five ascending id-range batches (the ordered-arrival contract);
    // compactions fire at batches 2 and 4
    val batches = docs.grouped((docs.length + 4) / 5).toSeq
    assert(batches.length === 5)

    val src = MemoryStream[(Long, String, String)]
    val q = SegmentDedupStream.startSegmentDedup(
      src.toDF().toDF("doc_id", "source", "text"),
      registryPath, statsPath, ckpt, compactEvery = 2)
    try {
      batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }

      val streamed = spark.read.parquet(statsPath)
        .groupBy(col("source"))
        .agg(sum("n_segments").as("n_segments"), sum("n_kept").as("n_kept"),
          sum("tokens_before").as("tokens_before"),
          sum("tokens_after").as("tokens_after"))
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      val batch = SparkEntry.queries("x139_segment_dedup")(spark, sf)
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      assert(batch.nonEmpty)
      assert(streamed === batch)

      // registry content identical to the uncompacted law: the batch
      // winners, one (h, min k) per hash
      val docsDf = Tables(spark, sf).documents.select("doc_id", "source", "text")
      def pairs(df: org.apache.spark.sql.DataFrame) = df
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batchWinners = pairs(
        SegmentDedupStream.segments(docsDf)
          .groupBy(col("h")).agg(min(col("k")).as("kmin")))
      assert(pairs(SegmentDedupStream.winners(spark, registryPath))
        === batchWinners)

      // batch-4 fold subsumed everything before it
      assert(partitionNames(registryPath) === Set("batch_id=-6", "batch_id=4"))
    } finally q.stop()
  }

  test("novelty scoring with compactEvery=2 over 5 batches: verdicts == batch, gram store folds intact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val root = Files.createTempDirectory("novelty-compact").toString
    val (gramsPath, verdictsPath, ckpt) =
      (s"$root/grams", s"$root/verdicts", s"$root/ckpt")

    val corpus = Tables(spark, sf).documents
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(corpus.length === 50)
    val batches = corpus.grouped(10).toSeq

    NoveltyStream.seedGrams(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), gramsPath, "doc_id", "text")

    val src = MemoryStream[(Long, String)]
    val q = NoveltyStream.startNoveltyScoring(
      src.toDF().toDF("doc_id", "text"), gramsPath, verdictsPath, ckpt,
      "doc_id", "text", compactEvery = 2)
    try {
      batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }

      val streamed = spark.read.parquet(verdictsPath)
        .select("doc_id", "n_grams", "n_novel", "novelty")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      val batch = Corpus.ngramNovelty(corpus.toSeq.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      assert(batch.nonEmpty)
      assert(streamed === batch)

      // the gram store still holds each distinct gram exactly once
      val stored = spark.read.parquet(gramsPath).select("h").collect().map(_.getLong(0))
      assert(stored.length === stored.distinct.length)
      val allGrams = Corpus.gramHashes(corpus.toSeq.toDF("doc_id", "text"), "doc_id", "text")
        .select("h").distinct().collect().map(_.getLong(0)).toSet
      assert(stored.toSet === allGrams)

      assert(partitionNames(gramsPath) === Set("batch_id=-6", "batch_id=4"))
    } finally q.stop()
  }
}
