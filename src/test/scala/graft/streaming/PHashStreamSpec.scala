package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.sources.Tables

/** Multi-batch contract of the streaming perceptual media gate: the
  * union of per-batch pair reports equals batch
  * [[Multimodal.perceptualNearDups]]' pair inventory EXACTLY (ids and
  * hamming values) over the same corpus — ingest-time and audit-time
  * media dedup can never diverge. Batches arrive SHUFFLED (not in id
  * order): every pair meets exactly once regardless of arrival order —
  * across batches through the registry, within a batch through the
  * id-ordered self-join. */
class PHashStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("phash-stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("stream pair union across shuffled batches == batch perceptualNearDups") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val root = Files.createTempDirectory("phash-stream").toString
    val (registryPath, pairsPath, ckpt) =
      (s"$root/registry", s"$root/pairs", s"$root/ckpt")
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, phash BIGINT"))
      .write.parquet(s"$registryPath/batch_id=-1")

    // the x187 corpus: documents plus planted single-byte perturbations
    val docs = Tables(spark, sf).documents
    val pert = docs.filter(col("doc_id") % 5 === 0)
      .selectExpr("doc_id + 10000000 AS doc_id",
        "concat(substring(text, 1, cast(floor(length(text) / 2) as int)), '~', " +
          "substring(text, cast(floor(length(text) / 2) as int) + 2)) AS text")
    val corpus = docs.select(col("doc_id"), col("text")).unionAll(pert)
    val media = Multimodal.packMedia(corpus)(spark).toDF()
      .select("doc_id", "content")

    // shuffled batching: deterministic LCG split, NOT id ranges — the
    // perturbed copy usually lands in a different batch than its source
    val rows = media.collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
      .sortBy { case (id, _) => ((id * 48271L) % 2147483647L, id) }
    val thirds = rows.grouped((rows.length + 2) / 3).toSeq
    assert(thirds.length === 3)

    val src = MemoryStream[(Long, Array[Byte])]
    val q = PHashStream.startPerceptualNearDup(
      src.toDF().toDF("doc_id", "content"),
      registryPath, pairsPath, ckpt, maxHamming = 7)
    try {
      thirds.foreach { b => src.addData(b: _*); q.processAllAvailable() }

      def pairSet(df: org.apache.spark.sql.DataFrame) = df
        .select("doc_a", "doc_b", "hamming")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

      val streamed = pairSet(spark.read.parquet(pairsPath))
      val batch = pairSet(
        Multimodal.perceptualNearDups(media, "doc_id", "content", maxHamming = 7))
      assert(batch.nonEmpty)
      assert(streamed === batch)

      // the registry ends as the corpus signature index
      val reg = spark.read.parquet(registryPath)
        .filter(col("batch_id") >= 0)
        .select("doc_id", "phash")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sigs = Multimodal.perceptualHashes(media, "doc_id", "content")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reg === sigs)
    } finally q.stop()
  }

  test("blocking guard refuses thresholds past the pigeonhole bound") {
    intercept[IllegalArgumentException] {
      PHashStream.startPerceptualNearDup(
        spark.readStream.format("rate").load(), "/tmp/x", "/tmp/y", "/tmp/z",
        maxHamming = 8)
    }
  }
}
