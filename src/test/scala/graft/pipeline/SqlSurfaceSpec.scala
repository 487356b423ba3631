package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** E3 parity: the gold layer is a SQL surface — any client issuing
  * ad-hoc SELECTs over `gold.*` (the Superset hop in the reference)
  * must work via spark.sql against the materialized catalog tables.
  */
class SqlSurfaceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("sql-surface-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("gold tables are queryable as a SQL schema") {
    val pipe = NbaPipeline(spark, getClass.getResource("/nba").getPath)
    val dir = Files.createTempDirectory("warehouse").toString
    pipe.saveAsTables(dir)
    val top = spark.sql(
      """SELECT season, team_name FROM gold.summary_by_season
        |WHERE team_ranking = 1 ORDER BY season""".stripMargin).collect()
    assert(top.length === 2) // one champion per season
    val weak = spark.sql(
      "SELECT COUNT(*) FROM gold.team_weaknesses_unpivoted WHERE resultado = 'Debilidad'"
    ).collect()(0).getLong(0)
    assert(weak > 0)
    // silver is queryable too (all-string staging contract)
    val silverGames = spark.sql("SELECT season, wl FROM silver.games WHERE wl = 'W'")
    assert(silverGames.count() > 0)
    assert(silverGames.schema.forall(_.dataType.typeName == "string"))
  }
}
