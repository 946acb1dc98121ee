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

  /** As-of join: every click matched to the user's latest purchase at
    * or before it (AsOfJoin — one shuffle + one sort, zero join
    * operators). The build side dedupes per (user, µs-ts) by max
    * event id so the tie survivor is pinned across engines; the
    * oracle is DuckDB's NATIVE `ASOF LEFT JOIN` over the same
    * µs-truncated timestamps. */
  private def q38(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir).events
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val wDedup = Window.partitionBy(col("user_id"), col("ts"))
      .orderBy(col("event_id").desc)
    val purchases = ev.filter(col("event_type") === "purchase")
      .withColumn("__rn", row_number().over(wDedup))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    graft.operators.AsOfJoin.asOf(clicks, purchases, Seq("user_id"),
        "click_ts", "ts", Seq("purchase_id", "purchase_value"))
      .withColumnRenamed("ts_matched", "purchase_ts")
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_ts"), col("purchase_id"), col("purchase_value"))
      .orderBy(col("click_id"))
  }

  private val q38Sql =
    """WITH b AS (
      |  SELECT user_id, ts, purchase_id, purchase_value FROM (
      |    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
      |      event_id AS purchase_id, value AS purchase_value,
      |      row_number() OVER (PARTITION BY user_id, CAST(ts AS TIMESTAMP)
      |        ORDER BY event_id DESC) AS rn
      |    FROM events WHERE event_type = 'purchase') WHERE rn = 1),
      |p AS (
      |  SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS click_ts
      |  FROM events WHERE event_type = 'click')
      |SELECT p.click_id, p.user_id, p.click_ts, b.ts AS purchase_ts,
      |  b.purchase_id, b.purchase_value
      |FROM p ASOF LEFT JOIN b
      |  ON p.user_id = b.user_id AND p.click_ts >= b.ts
      |ORDER BY click_id""".stripMargin

  /** Range join: events counted into 30-minute maintenance windows
    * anchored at every 50th event, per event type (RangeJoin — the
    * interval side explodes into covered time buckets and the match
    * is a hash EQUI-join on (type, bucket) + exact containment
    * filter, never a nested-loop join). */
  private def q39(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir).events
    val ivals = ev.filter(col("event_id") % 50 === 0)
      .select(col("event_id").as("window_id"), col("event_type"),
        col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))
    graft.operators.RangeJoin.pointInInterval(
        ev.select(col("event_type"), col("ts"), col("value")), ivals,
        Seq("event_type"), "ts", "w_start", "w_end", Seq("window_id"),
        bucketMicros = 30L * 60 * 1000000)
      .groupBy(col("window_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        dsum(dec9(col("value"))).as("sum_value"))
      .orderBy(col("window_id"))
  }

  private val q39Sql =
    """WITH iv AS (
      |  SELECT event_id AS window_id, event_type,
      |    CAST(ts AS TIMESTAMP) AS w_start,
      |    CAST(ts AS TIMESTAMP) + INTERVAL 30 MINUTE AS w_end
      |  FROM events WHERE event_id % 50 = 0),
      |pt AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
      |SELECT iv.window_id, iv.event_type, count(*) AS n_events,
      |  CAST(sum(CAST(CAST(pt.value AS DOUBLE) AS DECIMAL(28,9))) AS DOUBLE) AS sum_value
      |FROM pt JOIN iv ON pt.event_type = iv.event_type
      |  AND pt.ts >= iv.w_start AND pt.ts <= iv.w_end
      |GROUP BY 1, 2 ORDER BY window_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q24_tumbling_window", q24, Some(q24Sql)),
    Q("q25_json_extract", q25, Some(q25Sql)),
    Q("q26_sessionize", q26, Some(q26Sql), headline = true),
    Q("q35_sliding_window", q35, Some(q35Sql)),
    Q("q38_asof_join", q38, Some(q38Sql), headline = true),
    Q("q39_range_join", q39, Some(q39Sql)))
}
