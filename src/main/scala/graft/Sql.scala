package graft

import org.apache.spark.sql.SparkSession

import graft.sources.Tables

/** Ad-hoc SQL entry point:
  * `runMain graft.Sql "<query>" [sfDir]`
  * Registers the testdata tables as views plus the engine's native
  * functions (float_vec_dot, poly_hash) and runs the query — the
  * "switch your SQL client to this engine" surface (pair with
  * `NbaPipeline.saveAsTables` for the silver./gold. catalog).
  */
object Sql {
  def main(args: Array[String]): Unit = {
    val query = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-sql")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables(spark, sfDir).registerAll()
    graft.functions.VectorExpressions.ensureRegistered(spark)
    graft.functions.PolyHashFunctions.ensureRegistered(spark)
    spark.sql(query).show(100, truncate = false)
    spark.stop()
  }
}
