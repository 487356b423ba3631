package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off decomposition for BENCH_NEW_r14: fine-cell occupancy under
  * two-level vs three-level IVF routing at the auto-k policy. The
  * within/probe joins downstream of assignment cost Σ_cell probe×size,
  * so the effective cell-count and max-cell-size tell whether an
  * end-to-end exponent regression is the assignment term (what the
  * L-level law covers) or cell-balance collapse (what it doesn't). */
object CellStatsLab {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-cellstats")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val emb = graft.sources.Tables(spark, dir).embeddings
    val n = emb.count()
    val k = math.max(16, math.sqrt(n.toDouble).toInt)
    val kc = math.max(4, math.sqrt(k.toDouble).toInt)
    val kct = math.max(2L, graft.operators.Dedup.icbrt(k.toLong)).toInt
    val kcm = math.max(4, kct * kct)
    println(s"n=$n k=$k kc=$kc kcm=$kcm kct=$kct")
    def stats(label: String, assigned: org.apache.spark.sql.DataFrame): Unit = {
      val s = assigned.groupBy("cell").count()
        .agg(count(lit(1)).as("cells"), max("count").as("maxsz"),
          sum(col("count") * col("count")).as("sumsq")).head()
      println(s"[$label] occupied_cells=${s.getLong(0)} max_cell=${s.getLong(1)} " +
        s"sum_sq=${s.getLong(2)} (join work ∝ sum_sq)")
    }
    stats("L2", graft.operators.Dedup.ivfAssignTwoLevel(emb, "vec_id", "embedding", k, kc))
    stats("L3", graft.operators.Dedup.ivfAssignThreeLevel(emb, "vec_id", "embedding", k, kcm, kct))
    spark.stop()
  }
}
