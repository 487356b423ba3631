package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.sources.Tables

/** Multi-batch contract of the IVFADC serving stream: answers to a
  * query set arriving in pieces, served against the standing index,
  * equal batch ivfPqSearch over the same corpus and parameters —
  * answers depend only on the query vector and the frozen index. */
class IvfPqServeStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("ivfpq-serve-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  test("streamed query batches == batch x153 on the same index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.functions.VectorExpressions.ensureRegistered(spark)

    val root = Files.createTempDirectory("ivfpq-serve").toString
    val emb = Tables(spark, sf).embeddings

    IvfPqServeStream.buildIndex(emb, "vec_id", "embedding",
      s"$root/index", k = 16)

    val queries = emb.filter(col("vec_id") < 10)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))

    val src = MemoryStream[(Long, Seq[Float])]
    val q = IvfPqServeStream.startServe(
      src.toDF().toDF("query_id", "qvec").select(
        col("query_id"), col("qvec").cast("array<float>")),
      s"$root/index", s"$root/answers", s"$root/ckpt",
      nprobe = 4, topK = 5)
    try {
      for (part <- 0 until 2) {
        src.addData(queries.filter(_._1 % 2 == part): _*)
        q.processAllAvailable()
      }
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select("query_id", "neighbor_id", "qdist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val streamed = canon(spark.read.parquet(s"$root/answers"))
      val batch = canon(Dedup.ivfPqSearch(emb, "vec_id", "embedding",
        col("vec_id") < 10, k = 16, nprobe = 4, topK = 5, shortlist = 50))
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
