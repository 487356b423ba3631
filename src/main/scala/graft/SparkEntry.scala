package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Analytics, GoldAnalogs, Q, Relational, TrainingData}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a [[Q]] in one of the operator
  * packs; `queries`/`oracleSql` are derived from the packs so the Spark
  * formulation and its DuckDB oracle can never go out of sync.
  */
object SparkEntry {

  private def packs: Seq[Q] =
    Relational.all ++ GoldAnalogs.all ++ TrainingData.all ++ Analytics.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.a01.fn(Tables(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map { q =>
      q.name -> ((s: SparkSession, dir: String) => q.fn(Tables(s, dir)))
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
