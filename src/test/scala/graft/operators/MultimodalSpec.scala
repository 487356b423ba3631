package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("multimodal-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val docs = Tables(spark, "/root/testdata/sf0.001").documents

  test("packMedia: binary content + typed metadata struct") {
    val media = Multimodal.packMedia(docs).cache()
    assert(media.count() === docs.count())
    val r = media.filter(_.doc_id == 0).collect()(0)
    assert(r.content.nonEmpty)
    assert(r.meta.format === "fake/raw")
    assert(r.meta.width === r.content.length % 640)
    assert(r.meta.nFrames === r.content.length % 16 + 1)
  }

  test("extractFeatures: partition-batched, deterministic, consistent") {
    val media = Multimodal.packMedia(docs)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect().sortBy(_.doc_id)
    assert(f1.length === f2.length)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.doc_id === b.doc_id)
      assert(a.nBytes === b.nBytes)
      assert(a.byteHistogram.toSeq === b.byteHistogram.toSeq) // partitioning-invariant
      assert(a.embedding.toSeq === b.embedding.toSeq)
    }
    f1.foreach { f =>
      assert(f.byteHistogram.sum === f.nBytes) // every byte lands in a bucket
      assert(f.embedding.length === 8)
      assert(f.embedding.forall(v => v >= -0.5f && v <= 0.5f))
    }
  }
}
