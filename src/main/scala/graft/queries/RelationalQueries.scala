package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Num._

/** Core relational operators from SURVEY.md §2 re-expressed over the
  * harness tables (TESTDATA.md).
  *
  * Scale notes (100 TB): every query here is a declarative plan —
  * filters/projections push into the parquet scan, small dimension
  * tables are broadcast explicitly, and the only shuffles are on the
  * aggregation/join keys themselves. Nothing collects to the driver.
  */
object RelationalQueries {

  /** A8-style grouped aggregation (pricing summary, TPC-H Q1 shape).
    * Map-side partial aggregation → 6-group result; exact decimal math
    * for oracle parity. Reference: extract_plan.py:680-703 stats.
    */
  private def q01(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.lineitem
      .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(dec2(col("l_quantity"))).as("sum_qty"),
        dsum(dec2(col("l_extendedprice"))).as("sum_base_price"),
        dsum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .as("sum_disc_price"),
        dsum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))
          * (lit(1) + dec2(col("l_tax")))).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** J1-style star join: fact ⋈ broadcast dimensions, revenue rollup.
    * nation/region are broadcast (dims ≪ fact at every SF); the single
    * shuffle is the groupBy on (r_name, n_name).
    * Reference: id_assign_and_merge.py:62-71 (broadcast FK lookup).
    */
  private def q02(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        dsum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val q02Sql =
    """SELECT r_name, n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(DISTINCT o_orderkey) AS n_orders
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** §2.3 resume anti-join — the reference's single most common
    * operator: worklist ∖ completed. Worklist = orders; completed =
    * orders with any lineitem shipped after the cutoff.
    * Reference: extract.py:180-181, loudness_measure.py:146-188.
    */
  private def q03(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val completed = t.lineitem
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"))
    t.orders
      .join(completed, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))
  }

  private val q03Sql =
    """SELECT o_orderkey, o_orderstatus FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1998-01-01')
      |ORDER BY o_orderkey""".stripMargin

  /** Left-semi join (EXISTS): suppliers with any 1995 shipment.
    * Reference: journal "completed" membership checks (§2.3 dual). */
  private def q04(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val shipped = t.lineitem
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("l_suppkey"))
    t.supplier
      .join(shipped, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  private val q04Sql =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_suppkey = s_suppkey
      |    AND l_shipdate >= TIMESTAMP '1995-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-01-01')
      |ORDER BY s_suppkey""".stripMargin

  /** A1 majority vote with pinned tie-break: per customer, the most
    * frequent order priority; ties broken by priority string asc
    * (Counter-keeps-first-seen semantics made deterministic).
    * Reference: info_scanner_ph2.py:296-326.
    */
  private def q05(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val counts = t.orders
      .groupBy(col("o_custkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("votes").desc, col("o_orderpriority").asc)
    counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"),
        col("o_orderpriority").as("majority_priority"), col("votes"))
      .orderBy(col("o_custkey"))
  }

  private val q05Sql =
    """SELECT o_custkey, o_orderpriority AS majority_priority, votes FROM (
      |  SELECT o_custkey, o_orderpriority, count(*) AS votes,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY count(*) DESC, o_orderpriority) AS rn
      |  FROM orders GROUP BY o_custkey, o_orderpriority)
      |WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  /** W1 top-k per group: top-5 suppliers by revenue within each
    * nation, 1-based rank. The aggregation shrinks the fact table to
    * one row per supplier *before* the window, so the rank shuffle is
    * tiny at any scale. Reference: precompute_similar_tracks.py:201-202.
    */
  private def q06(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val revBySupp = t.lineitem
      .groupBy(col("l_suppkey"))
      .agg(dsum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .as("revenue"))
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("revenue").desc, col("s_suppkey").asc)
    revBySupp
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("s_nationkey"), col("rank"), col("s_suppkey"), col("revenue"))
      .orderBy(col("s_nationkey"), col("rank"))
  }

  private val q06Sql =
    """SELECT s_nationkey, rank, s_suppkey, revenue FROM (
      |  SELECT s_nationkey, s_suppkey, revenue,
      |    row_number() OVER (PARTITION BY s_nationkey
      |      ORDER BY revenue DESC, s_suppkey) AS rank
      |  FROM (
      |    SELECT l_suppkey AS s_suppkey2, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |    FROM lineitem GROUP BY l_suppkey) r
      |  JOIN supplier ON r.s_suppkey2 = supplier.s_suppkey)
      |WHERE rank <= 5 ORDER BY s_nationkey, rank""".stripMargin

  /** X14-style lead window: per order, gap in days between consecutive
    * line shipments (cue INDEX → begin/duration analog: next row's
    * timestamp bounds this row). Reference: CueSplit.cs:179-197.
    */
  private def q07(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    // (orderkey, linenumber) is NOT unique in the generated data; pin
    // the full deterministic key so lead() agrees across engines.
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    t.lineitem
      .withColumn("next_ship", lead(col("l_shipdate"), 1).over(w))
      .withColumn("gap_seconds",
        unix_timestamp(col("next_ship")) - unix_timestamp(col("l_shipdate")))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("gap_seconds"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
  }

  private val q07Sql =
    """SELECT l_orderkey, l_linenumber, l_partkey,
      |  date_diff('second', l_shipdate,
      |    lead(l_shipdate) OVER (PARTITION BY l_orderkey
      |      ORDER BY l_linenumber, l_partkey, l_suppkey)) AS gap_seconds
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin

  /** X15-style running total: cumulative event value per user in
    * (ts, event_id) order — byterange prev_end+1 analog. Decimal
    * accumulation keeps the running sum bit-stable across engines.
    * Reference: dash-repackage.py:27-42.
    */
  private def q08(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.events
      .withColumn("running_value", sum(dec9(col("value"))).over(w).cast("double"))
      .select(col("user_id"), col("event_id"), col("running_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** The skew-safe twin of q08 — SAME oracle: the salted operator
    * must reproduce the single window bit-for-bit through the DuckDB
    * hash compare, not just against Spark's own window. Buckets are
    * event days (order-aligned under the (ts, event_id) order). */
  private def q33(s: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedRunningSum(Tables(s, dir).events,
        Seq("user_id"), Seq(col("ts"), col("event_id")),
        to_date(col("ts")), dec9(col("value")), "running_value")
      .select(col("user_id"), col("event_id"),
        col("running_value").cast("double").as("running_value"))
      .orderBy(col("user_id"), col("event_id"))

  private val q08Sql =
    """SELECT user_id, event_id,
      |  CAST(sum(CAST(CAST(value AS DOUBLE) AS DECIMAL(28,9)))
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** J11 collision detection: >1 order claiming one (custkey, date) —
    * grouped HAVING count>1 with a deterministic member list.
    * Reference: extract_plan.py:634-649.
    */
  private def q09(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.orders
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(count(lit(1)).as("n_orders"),
        array_join(
          transform(array_sort(collect_list(col("o_orderkey"))),
            x => x.cast("string")), ",").as("orderkeys"))
      .filter(col("n_orders") > 1)
      .orderBy(col("o_custkey"), col("o_orderdate"))
  }

  private val q09Sql =
    """SELECT o_custkey, o_orderdate, count(*) AS n_orders,
      |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS orderkeys
      |FROM orders GROUP BY o_custkey, o_orderdate
      |HAVING count(*) > 1
      |ORDER BY o_custkey, o_orderdate""".stripMargin

  /** §2.7 set difference: parts never referenced by any lineitem
    * (orphan audit / claimed−honoured). Reference: extract_plan.py:335-343.
    */
  private def q10(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.part.select(col("p_partkey"))
      .except(t.lineitem.select(col("l_partkey").as("p_partkey")))
      .orderBy(col("p_partkey"))
  }

  private val q10Sql =
    """SELECT p_partkey FROM part
      |EXCEPT SELECT l_partkey FROM lineitem
      |ORDER BY p_partkey""".stripMargin

  /** Union + first-writer-wins dedup (legacy/new measurement merge):
    * two overlapping event slices, priority source wins, then latest
    * ts. Reference: loudness_measure.py:146-188.
    */
  private def q11(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val a = t.events.filter(col("event_id") % 3 === 0).withColumn("src", lit(1))
    val b = t.events.filter(col("event_id") % 2 === 0).withColumn("src", lit(2))
    // ts DESC after src: the documented "then latest ts" tie-break.
    // Today each slice contributes at most one row per event_id so it
    // never fires, but leaving it out made the window order
    // partition-dependent the moment the slice predicates overlap.
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("src").asc, col("ts").desc)
    a.unionByName(b)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("src"))
      .orderBy(col("event_id"))
  }

  private val q11Sql =
    """SELECT event_id, user_id, src FROM (
      |  SELECT event_id, user_id, src,
      |    row_number() OVER (PARTITION BY event_id
      |      ORDER BY src, ts DESC) AS rn
      |  FROM (
      |    SELECT event_id, user_id, ts, 1 AS src FROM events WHERE event_id % 3 = 0
      |    UNION ALL
      |    SELECT event_id, user_id, ts, 2 AS src FROM events WHERE event_id % 2 = 0))
      |WHERE rn = 1 ORDER BY event_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q01_pricing_summary", q01, Some(q01Sql), headline = true),
    Q("q02_revenue_by_nation", q02, Some(q02Sql), headline = true),
    Q("q03_resume_anti_join", q03, Some(q03Sql), headline = true),
    Q("q04_semi_join", q04, Some(q04Sql)),
    Q("q05_majority_vote", q05, Some(q05Sql), headline = true),
    Q("q06_topk_per_group", q06, Some(q06Sql), headline = true),
    Q("q07_lead_gap", q07, Some(q07Sql)),
    Q("q08_running_total", q08, Some(q08Sql)),
    Q("q33_salted_running_total", q33, Some(q08Sql)),
    Q("q09_collision_groups", q09, Some(q09Sql)),
    Q("q10_set_except", q10, Some(q10Sql)),
    Q("q11_union_priority_dedup", q11, Some(q11Sql)))
}
