package graft

import org.apache.spark.sql.SparkSession

/** Scheduler-floor probe: times N trivial one-task jobs (count over a
  * 1-row in-memory range) in the bench's interactive profile and prints
  * per-job quantiles. The sf0.01 gold gate is job-count × this floor
  * (BASELINE.md "Per-model job-count floors"), so recording the floor
  * alongside every bench artifact separates engine regressions from
  * host-of-the-day tenancy: the gold totals move with THIS number when
  * the plans (and job counts) are unchanged. */
object SchedFloor {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 50
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-schedfloor")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm: codegen + scheduler paths
    (1 to 5).foreach(_ => spark.range(1).count())
    val times = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      spark.range(1).count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    def q(p: Double) = times((p * (n - 1)).round.toInt)
    println(f"""{"metric":"sched_floor","n":$n,"p10":${q(0.1)}%.4f,"p50":${q(0.5)}%.4f,"p90":${q(0.9)}%.4f,"min":${times.head}%.4f,"max":${times.last}%.4f}""")
    spark.stop()
  }
}
