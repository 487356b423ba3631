package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Whole-registry plan audit (optimization-round instrumentation):
  * dumps every registered query's `.explain("formatted")` to
  * `<outDir>/<name>.txt` and prints one summary line per query —
  * Exchange count, parquet-scan count, join strategies, codegen span
  * count — so a round's plan-shape drift is a `diff -r` plus a sortable
  * table instead of 244 hand inspections.
  *
  * `runMain graft.PlanAudit <outDir> [sfDir] [only,names]`
  *
  * Summary line format (tab-separated, greppable):
  *   name  exchanges  scans  bhj  smj  shj  bnl  codegen  windows
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plan-audit")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    println("name\texchanges\tscans\tbhj\tsmj\tshj\tbnl\tcodegen\twindows")
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/$name.txt"), p)
        // count operators in the numbered plan-tree section only (the
        // details section repeats every node name)
        val tree = p.linesIterator.takeWhile(_.trim.nonEmpty).toSeq
        def c(sub: String) = tree.count(_.contains(sub))
        val summary = Seq(
          name,
          c("Exchange"),
          tree.count(l => l.contains("Scan parquet")),
          c("BroadcastHashJoin"),
          c("SortMergeJoin"),
          c("ShuffledHashJoin"),
          c("BroadcastNestedLoopJoin") + c("CartesianProduct"),
          c("WholeStageCodegen"),
          c("Window")
        ).mkString("\t")
        println(summary)
      } catch {
        case e: Throwable =>
          println(s"$name\tERR\t${e.getMessage}")
      }
    }
    spark.stop()
  }
}
