package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{Sinks, Tables}

/** Measures what the layout writers actually buy (SCALE.md "Layout
  * levers, measured"): writes lineitem three ways — naive round-robin,
  * Z-ordered, Hilbert-ordered on (l_partkey, l_suppkey) — then, for a
  * grid of 2-D box predicates, counts the files a min/max-stats reader
  * must touch (a file is touched iff its [min, max] envelope overlaps
  * the box on BOTH keys — exactly the parquet footer-pruning decision,
  * computed here deterministically instead of sampling scan metrics).
  * Prints one JSON line per layout with the mean/max touched-file
  * counts over the box grid.
  *
  * Usage: `tools/run_main.sh graft.LayoutLab <sfDir> [numFiles]`
  */
object LayoutLab {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val numFiles = if (args.length > 1) args(1).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-layoutlab")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files.createTempDirectory("layoutlab").toString
    val t = Tables(spark, dir).lineitem
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val bounds = t.agg(
      min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).head()
    val (pLo, pHi) = (bounds.getLong(0), bounds.getLong(1))
    val (sLo, sHi) = (bounds.getLong(2), bounds.getLong(3))

    t.repartition(numFiles).write.mode("overwrite").parquet(s"$root/naive")
    Sinks.writeZOrdered(t, s"$root/zorder", "l_partkey", "l_suppkey", numFiles)
    Sinks.writeHilbert(t, s"$root/hilbert", "l_partkey", "l_suppkey", numFiles)

    // per-file stat envelopes, as the parquet footer records them
    def envelopes(path: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("l_partkey"), max("l_partkey"),
          min("l_suppkey"), max("l_suppkey"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    // an 8x8 grid of boxes, each 1/8 of each key's domain — the
    // "read one tile" workload two-dimensional layouts exist for
    val pW = math.max(1L, (pHi - pLo) / 8)
    val sW = math.max(1L, (sHi - sLo) / 8)
    val boxes = for (i <- 0 until 8; j <- 0 until 8)
      yield (pLo + i * pW, pLo + (i + 1) * pW, sLo + j * sW, sLo + (j + 1) * sW)

    for (layout <- Seq("naive", "zorder", "hilbert")) {
      val env = envelopes(s"$root/$layout")
      val touched = boxes.map { case (p0, p1, s0, s1) =>
        env.count { case (fpLo, fpHi, fsLo, fsHi) =>
          fpLo <= p1 && fpHi >= p0 && fsLo <= s1 && fsHi >= s0
        }
      }
      val mean = touched.sum.toDouble / touched.size
      println(s"""{"metric":"layout_files_touched","layout":"$layout",""" +
        s""""num_files":${env.length},"mean":$mean,"max":${touched.max},""" +
        s""""boxes":${boxes.size},"sf":"$dir"}""")
    }
    spark.stop()
  }
}
