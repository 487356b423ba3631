package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal warehouse patterns: slowly-changing-dimension snapshots and
  * event funnels — the history/attribution layer a pipeline builds on
  * top of raw facts.
  *
  * Scale shapes: SCD2 is one `partitionBy(entity)` window (parallel per
  * entity, no global order); the funnel is two per-key aggregates and
  * one join on the key — every step shuffles on the entity key only.
  */
object Temporal {

  /** SCD2-style effective ranges from an event/fact history: each row
    * becomes a version valid from its own timestamp until the next
    * version's (NULL = current). `tiebreak` makes same-timestamp
    * versions deterministic. */
  def scd2Snapshot(
      df: DataFrame, entityCol: Column, tsCol: Column, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(tsCol.asc, tiebreak.asc)
    df.withColumn("valid_from", tsCol)
      .withColumn("valid_to", lead(tsCol, 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** First-touch conversion funnel: per user, the first `fromEvent`, the
    * first `toEvent` strictly after it, and the exact microsecond gap.
    * The per-user firsts are MIN aggregates (map-side partial); the
    * `toEvent` side joins the firsts on the user key before its own MIN,
    * so each step is one hash shuffle on user_id. */
  def conversionFunnel(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      fromEvent: String, toEvent: String): DataFrame = {
    val firsts = events.filter(col(typeCol) === fromEvent)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("first_from"))
    val conv = events.filter(col(typeCol) === toEvent)
      .select(col(userCol).as("__u"), col(tsCol))
      .join(firsts, col("__u") === col(userCol) && col(tsCol) > col("first_from"))
      .groupBy(col("__u"))
      .agg(min(col(tsCol)).as("first_to"))
    firsts
      .join(conv, col(userCol) === col("__u"), "left")
      .select(
        col(userCol), col("first_from"), col("first_to"),
        col("first_to").isNotNull.as("converted"),
        (unix_micros(col("first_to")) - unix_micros(col("first_from")))
          .as("micros_to_convert")
      )
  }
}
