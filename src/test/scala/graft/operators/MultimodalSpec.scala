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

  test("frameSample: every k-th frame, payload fully partitioned") {
    val media = Multimodal.packMedia(docs)
    val frames = Multimodal.frameSample(media, everyN = 2).collect()
    val byDoc = frames.groupBy(_.doc_id)
    val metaByDoc = media.collect().map(r => r.doc_id -> r).toMap
    byDoc.foreach { case (id, fs) =>
      val n = math.max(metaByDoc(id).meta.nFrames, 1)
      assert(fs.length === (0 until n by 2).size)
      assert(fs.map(_.frame_idx).sorted.toSeq === (0 until n by 2).toSeq)
      fs.foreach(f => assert(f.frame.nonEmpty || metaByDoc(id).content.isEmpty))
    }
  }

  test("resize: deterministic subsample with updated metadata") {
    val media = Multimodal.packMedia(docs)
    val resized = Multimodal.resize(media, targetW = 64, targetH = 64).collect()
    resized.foreach { r =>
      assert(r.meta.width === 64 && r.meta.height === 64)
      assert(r.content.nonEmpty)
    }
    // deterministic under repartitioning
    val again = Multimodal.resize(
      Multimodal.packMedia(docs).repartition(5), 64, 64)
      .collect().map(r => r.doc_id -> r.content.toSeq).toMap
    resized.foreach(r => assert(again(r.doc_id) === r.content.toSeq))
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
