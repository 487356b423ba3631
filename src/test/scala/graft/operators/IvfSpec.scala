package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** IVF probe-search sanity: structure (cells, probe routing, top-k) plus
  * recall against the exact brute-force baseline. Random 64-dim vectors
  * are a worst case for coarse quantization, so the recall floor here is
  * deliberately modest — the spec pins mechanics, monotonicity in nprobe,
  * and exactness of within-cell scoring. */
class IvfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("ivf-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val emb = Tables(spark, "/root/testdata/sf0.01").embeddings

  private def topkSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  test("ivfAssign: every vector lands in exactly one of k cells") {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val assigned = Dedup.ivfAssign(emb, "vec_id", "embedding", k = 8).cache()
    assert(assigned.count() === emb.count())
    val cells = assigned.select("cell").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(cells.subsetOf((0L until 8L).toSet))
    assert(cells.size > 1)
  }

  test("ivfSearch recall grows with nprobe; full probe == brute force") {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val pred = col("query_id") < 10
    val exact = topkSets(
      Dedup.annTopK(emb, "vec_id", "embedding", pred, k = 5))
    def recall(nprobe: Int): Double = {
      val got = topkSets(Dedup.ivfSearch(
        emb, "vec_id", "embedding", pred, k = 8, nprobe = nprobe, topK = 5))
      exact.map { case (q, ex) =>
        got.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
      }.sum / exact.size
    }
    val r2 = recall(2)
    val r8 = recall(8)
    assert(r8 >= r2) // monotone in probes
    assert(r8 === 1.0) // probing every cell is exhaustive == brute force
    assert(r2 > 0.0)
  }
}
