package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** The silver-layer normalizer — the reference's one genuinely reusable
  * engine piece (dags/spurs_historic_games.py:345-423):
  *
  *   1. lowercase every column name               (py:363-367)
  *   2. rename via COLUMN_MAPPINGS                (py:41-44: season_year →
  *      season; SEASON → season falls out of lowercasing)
  *   3. cast every column to string — the all-VARCHAR staging contract
  *      (py:380); types are re-imposed at query time by the gold models
  *   4. optional first-record projection          (py:372-378,406-409):
  *      the declared column list wins — extra columns are dropped,
  *      missing ones become NULL strings
  */
object SilverNormalize {

  /** dags/spurs_historic_games.py:41-44 (post-lowercasing form). */
  val ColumnMappings: Map[String, String] = Map("season_year" -> "season")

  def normalize(raw: DataFrame): DataFrame = {
    val lowered = raw.columns.foldLeft(raw) { (df, c) =>
      df.withColumnRenamed(c, c.toLowerCase)
    }
    val renamed = ColumnMappings.foldLeft(lowered) { case (df, (from, to)) =>
      if (df.columns.contains(from) && !df.columns.contains(to))
        df.withColumnRenamed(from, to)
      else df
    }
    renamed.select(renamed.columns.map(c => col(c).cast("string").as(c)): _*)
  }

  /** First-record column projection (py:372-378): keep exactly `cols`;
    * columns absent from the input become NULL (py:406-409 `record.get`). */
  def project(df: DataFrame, cols: Seq[String]): DataFrame = {
    val present = df.columns.toSet
    df.select(cols.map { c =>
      (if (present.contains(c)) col(c) else lit(null).cast("string")).as(c)
    }: _*)
  }
}
