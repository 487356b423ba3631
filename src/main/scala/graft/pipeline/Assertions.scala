package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The reference's 12 dbt schema tests (10 not_null + 2 accepted_values,
  * dbt/models/spurs_analysis/spurs_analysis.yml:12-147) as reusable
  * DataFrame checks. Each check returns the violating-row count; the
  * pipeline treats any non-zero as a data-quality failure.
  */
object Assertions {

  def notNullViolations(df: DataFrame, cols: Seq[String]): Long =
    cols.map(c => df.filter(col(c).isNull).count()).sum

  /** dbt accepted_values semantics: the generated `NOT IN` predicate lets
    * NULLs pass (three-valued logic), so only non-null values outside the
    * set count as violations; null-ness is the job of not_null tests. */
  def acceptedValuesViolations(df: DataFrame, c: String, vals: Seq[String]): Long =
    df.filter(col(c).isNotNull && !col(c).isin(vals.map(_.asInstanceOf[Any]): _*)).count()

  /** dbt `unique` semantics: count of VALUES that appear more than once
    * (dbt groups by the column and counts groups having count(*) > 1);
    * NULLs are excluded (dbt's generated SQL filters them). */
  def uniqueViolations(df: DataFrame, c: String): Long =
    df.filter(col(c).isNotNull)
      .groupBy(col(c))
      .count()
      .filter(col("count") > 1)
      .count()

  /** dbt `relationships` semantics: child values (non-null) that have no
    * match in the parent column — a broadcast-friendly left-anti join. */
  def relationshipViolations(
      child: DataFrame, childCol: String, parent: DataFrame, parentCol: String): Long = {
    // alias the parent key so child==parent self-checks don't collide
    val keys = parent.select(col(parentCol).as("__parent_key")).distinct()
    child.filter(col(childCol).isNotNull)
      .join(keys, col(childCol) === col("__parent_key"), "left_anti")
      .count()
  }

  /** Run the full dbt test suite over the gold tables; returns failure
    * descriptions (empty = all 12 pass). */
  def runAll(gold: Map[String, DataFrame]): Seq[String] = {
    val checks = Seq(
      ("team_weaknesses_unpivoted", "not_null", Seq("season2", "weakness_type"), None),
      ("team_weaknesses_unpivoted", "accepted_values", Seq("resultado"),
        Some(Seq("Debilidad", "Fortaleza"))),
      ("summary_by_season", "not_null", Seq("season", "team_ranking"), None),
      ("players_recommendations", "not_null",
        Seq("season2", "recommended_player", "player_id"), None),
      ("spurs_player_contributions_unpivoted", "not_null",
        Seq("player_id", "player_name", "rubro"), None),
      ("home_vs_away", "accepted_values", Seq("location"), Some(Seq("Home", "Away")))
    )
    checks.flatMap { case (table, kind, cols, vals) =>
      gold.get(table).toSeq.flatMap { df =>
        kind match {
          case "not_null" =>
            cols.flatMap { c =>
              val n = notNullViolations(df, Seq(c))
              if (n > 0) Some(s"$table.$c: $n null rows") else None
            }
          case "accepted_values" =>
            val n = acceptedValuesViolations(df, cols.head, vals.get)
            if (n > 0) Some(s"$table.${cols.head}: $n rows outside ${vals.get}")
            else None
        }
      }
    }
  }
}
