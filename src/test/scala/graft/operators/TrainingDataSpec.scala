package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** x189 contrastive-triplet mining on a SPARSE id space — the round-12
  * caveat the old `(query_id · 48271) mod n` negative pick got wrong:
  * on gapped ids most draws named a nonexistent id and the inner join
  * silently dropped those triplets. The round-14 law draws in dense
  * RANK space (blocked row_number ≡ `ROW_NUMBER() OVER (ORDER BY
  * vec_id % 64, vec_id) − 1`), so every anchor's draw resolves to a
  * real vector whatever the id distribution. The spec replays the rank
  * law locally (plain sort) and pins the full output set. */
class TrainingDataSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("trainingdata-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("x189 on gapped ids: every LCG draw resolves; output == local replay") {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val base = Tables(spark, "/root/testdata/sf0.001").embeddings
    // a hostile id space: a dropped residue class (20 % of the draw
    // range [0, n) names no row) plus a far-shifted tail — while keeping
    // ids < k present, which the registered deterministic seed-centroid
    // rule (`vec_id < k`, replayed by every IVF oracle) requires of any
    // corpus. The OLD x189 law silently dropped every triplet whose
    // draw hit a gap; the rank-space law drops none.
    val gapped = base
      .filter(col("vec_id") % 5 =!= 3)
      .withColumn("vec_id",
        when(col("vec_id") >= 800, col("vec_id") + 1000000L)
          .otherwise(col("vec_id")))
    val dir = Files.createTempDirectory("x189-gapped").toString
    gapped.write.parquet(s"$dir/embeddings.parquet")

    val got = graft.SparkEntry.queries("x189_contrastive_triplets")(spark, dir)
      .select("anchor_id", "pos_id", "neg_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // local replay of the rank law + the same Spark-side cosine filters
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val ids = emb.select("vec_id").collect().map(_.getLong(0))
    val n = ids.length.toLong
    val rankToId = ids.sortBy(id => (id % 64, id)).zipWithIndex
      .map { case (id, rn) => rn.toLong -> id }.toMap
    val k = math.max(16, math.sqrt(n.toDouble).toInt)
    val kc = math.max(4, math.sqrt(k.toDouble).toInt)
    val lists = Dedup.ivfSearchTwoLevel(emb, "vec_id", "embedding",
      lit(true), k = k, kc = kc, nprobe = 2, topK = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(lists.nonEmpty)
    // THE property: every draw is a real id (the old law failed here)
    val picks = lists.map { case (q, pos, posCos) =>
      val negId = rankToId((q * 48271L) % n)
      (q, pos, posCos, negId)
    }
    assert(picks.length === lists.length)
    // expected final set: same degenerate + margin filters, cosine from
    // the same engine expression so float semantics can't diverge
    import spark.implicits._
    val norms = Dedup.withNorm(emb, "vec_id", "embedding")
    val expected = picks.toSeq.toDF("anchor_id", "pos_id", "pos_cos", "neg_id")
      .join(norms.select(col("vec_id").as("anchor_id"),
        col("embedding").as("ae"), col("nrm").as("an")), "anchor_id")
      .join(norms.select(col("vec_id").as("neg_id"),
        col("embedding").as("be"), col("nrm").as("bn")), "neg_id")
      .withColumn("neg_cos",
        expr("float_vec_dot(ae, be)") / (col("bn") * col("an")))
      .filter(col("neg_id") =!= col("anchor_id") &&
        col("neg_id") =!= col("pos_id") &&
        col("neg_cos") <= col("pos_cos") - 0.1)
      .select("anchor_id", "pos_id", "neg_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
