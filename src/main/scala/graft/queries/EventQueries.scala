package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Num._

/** Event-stream analytics in batch form: tumbling windows, JSON
  * property extraction, gap-based sessionization. The same transforms
  * are reused by graft.streaming over readStream (Structured
  * Streaming) — watermarks + these groupings are the streaming
  * equivalents (SURVEY §2.9).
  */
object EventQueries {

  /** Tumbling 5-minute window aggregation (epoch-aligned, matching
    * DuckDB time_bucket).
    */
  private def q24(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        dsum(dec9(col("value"))).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))

  private val q24Sql =
    """SELECT time_bucket(INTERVAL '5 minutes', ts) AS win_start, event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(CAST(value AS DOUBLE) AS DECIMAL(28,9))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  /** Sliding window (10-minute length, 5-minute slide): each event
    * lands in two windows. DuckDB mirror: two rows per event at
    * time_bucket(ts) − {0, 5} minutes — every such window start
    * satisfies win ≤ ts < win+10min by construction. */
  private def q35(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        dsum(dec9(col("value"))).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))

  private val q35Sql =
    """SELECT win_start, event_type, count(*) AS n_events,
      |  CAST(sum(CAST(CAST(value AS DOUBLE) AS DECIMAL(28,9))) AS DOUBLE) AS sum_value
      |FROM (
      |  SELECT time_bucket(INTERVAL '5 minutes', ts)
      |           - k * INTERVAL '5 minutes' AS win_start,
      |         event_type, value
      |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k))
      |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  /** X20 analog: JSON-in-string property extraction + rollup. */
  private def q25(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"), count(col("k")).as("n_k"))
      .orderBy(col("event_type"))

  private val q25Sql =
    """SELECT event_type,
      |  CAST(sum(CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT)) AS min_k,
      |  max(CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT)) AS max_k,
      |  count(CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT)) AS n_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Gap-based sessionization: a new session starts after >30 min of
    * user inactivity; session ids are per-user ordinals. Two stacked
    * windows (lag + running count), one shuffle on user_id.
    */
  private def q26(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val newSession = when(
      unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(byUser))
        > 1800 || lag(col("ts"), 1).over(byUser).isNull, 1).otherwise(0)
    Tables(s, dir).events
      .withColumn("new_s", newSession)
      .withColumn("session_id", sum(col("new_s"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("event_id"), col("session_id"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val q26Sql =
    """SELECT user_id, event_id,
      |  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |FROM (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |      OR date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
      |      THEN 1 ELSE 0 END AS new_s
      |  FROM events)
      |ORDER BY user_id, event_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q24_tumbling_window", q24, Some(q24Sql)),
    Q("q25_json_extract", q25, Some(q25Sql)),
    Q("q26_sessionize", q26, Some(q26Sql), headline = true),
    Q("q35_sliding_window", q35, Some(q35Sql)))
}
