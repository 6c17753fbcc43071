package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-series / event-stream queries over the `events` table —
  * batch-windowed forms (SURVEY §7.6); the Structured Streaming
  * variants of the same aggregations live in
  * [[graft.streaming.EventStream]] and are asserted equivalent in
  * StreamingSpec.
  *
  * Windows are expressed as (date, hour) grouping keys rather than
  * Spark's `window()` struct so the DuckDB oracle can reproduce them
  * exactly (and because a struct column can't be hash-compared by the
  * driver). Semantically identical tumbling windows.
  */
object EventsQueries {

  private def ev(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  /** Tumbling 1-hour window counts/sums per event type. */
  def hourlyCounts(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(
        to_date(col("ts")).as("event_date"),
        hour(col("ts")).cast("long").as("event_hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("event_date"), col("event_hour"), col("event_type"))

  /** Tumbling 1-day window with distinct users. */
  def dailyActivity(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        (round(sum(col("value")), 2) / count(lit(1))).as("avg_value"))
      .orderBy(col("event_date"), col("event_type"))

  /** Sessionization: a session break is a >30-minute gap between a
    * user's consecutive events (lag window); sessions per user =
    * 1 + breaks.
    */
  def sessionCounts(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    ev(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("is_break",
        when(col("prev_ts").isNull, 0)
          .when(unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
          .otherwise(0))
      .groupBy(col("user_id"))
      .agg((sum(col("is_break")) + 1).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** Top-5 users per event type by total value (rank window over an
    * aggregate; rank computed on the rounded sum so it is deterministic
    * across engines).
    */
  def topUsers(s: SparkSession, dir: String): DataFrame = {
    val totals = ev(s, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(round(sum(col("value")), 2).as("total_value"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("total_value").desc, col("user_id").asc)
    totals.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("event_type"), col("rnk").cast("long").as("rnk"), col("user_id"), col("total_value"))
      .orderBy(col("event_type"), col("rnk"))
  }

  /** JSON property extraction from the `props` column (semi-structured
    * payload — `get_json_object` is the codegen'd path).
    */
  def jsonProps(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"),
        count(col("k")).as("n_with_k"))
      .orderBy(col("event_type"))
}
