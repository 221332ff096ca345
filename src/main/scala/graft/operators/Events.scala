package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Batch event analytics; the streaming twins (same aggregations over
  * `readStream`) live in [[graft.streaming.EventStreams]].
  */
object Events {

  /** q50: tumbling 1-hour window aggregation — Spark's `window()`
    * operator; oracle equivalence: aligned 1h tumbling ≡ date_trunc.
    */
  def q50(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double")
          .as("total_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("n_users"), col("total_value"))
      .orderBy(col("hour_start"), col("event_type"))

  val q50Sql: String =
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |  COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour_start, event_type""".stripMargin
}
