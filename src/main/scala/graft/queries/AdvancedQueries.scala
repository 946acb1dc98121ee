package graft.queries

import graft.Tables
import graft.operators.{Grouping, VectorAgg}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Num._

/** Harder SURVEY §2 operators under the oracle gate: the A3 ordinal
  * gap-fill (flagged "hard" in SURVEY §7a), A14 rollup, W4 min_by
  * preference picks, and the P6 chamfer pipeline (rows-only).
  */
object AdvancedQueries {

  /** A3 via Grouping.gapFillNumbers: simulate missing line numbers
    * (quantity < 5 ⇒ "unnumbered"), fill with the lowest unused
    * positive ordinal per order in (partkey, suppkey) order. */
  private def q27(s: SparkSession, dir: String): DataFrame = {
    // ordkey folds in l_linenumber so ordering stays unique even when
    // (order, part, supplier) repeats across lines
    // persisted: the operator consumes this twice (window pass +
    // free-number aggregation) — cache the 5-col projection rather
    // than scanning lineitem per consumer; released by the harness's
    // CacheScope.releaseAll after the sink action
    val base = graft.CacheScope.track(Tables(s, dir).lineitem
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        when(col("l_quantity") < 5, -1).otherwise(col("l_linenumber")).as("no"),
        ((col("l_partkey") * 100000000L + col("l_suppkey")) * 10L +
          col("l_linenumber")).as("ordkey")))
    // `no` in the sort: (l_orderkey, l_partkey, l_suppkey) is NOT
    // unique when an order repeats a (part, supplier) pair, and a
    // tie-ambiguous presentation sort hash-mismatches engines; (order,
    // no) IS unique (kept numbers are distinct linenumbers, filled
    // ones come from the unused pool)
    Grouping.gapFillNumbers(base, Seq("l_orderkey"), "no", "ordkey")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("no"))
      .orderBy(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("no"))
  }

  // Relational mirror of the sequential semantics: k-th missing row
  // (in ordkey order) takes the k-th smallest unused positive number.
  private val q27Sql =
    """WITH base AS (
      |  SELECT l_orderkey, l_partkey, l_suppkey,
      |    CASE WHEN l_quantity < 5 THEN -1 ELSE l_linenumber END AS no,
      |    (l_partkey * 100000000 + l_suppkey) * 10 + l_linenumber AS ordkey
      |  FROM lineitem),
      |sizes AS (
      |  SELECT l_orderkey, count(*) AS n,
      |    coalesce(max(CASE WHEN no >= 1 THEN no END), 0) AS maxv
      |  FROM base GROUP BY l_orderkey),
      |cand AS (
      |  SELECT l_orderkey, f,
      |    row_number() OVER (PARTITION BY l_orderkey ORDER BY f) AS rnk
      |  FROM (
      |    SELECT s.l_orderkey, unnest(generate_series(1, CAST(s.n + s.maxv AS INT))) AS f
      |    FROM sizes s) g
      |  WHERE NOT EXISTS (SELECT 1 FROM base u
      |    WHERE u.l_orderkey = g.l_orderkey AND u.no = g.f)),
      |missing AS (
      |  SELECT l_orderkey, ordkey,
      |    row_number() OVER (PARTITION BY l_orderkey ORDER BY ordkey) AS rnk
      |  FROM base WHERE no < 1)
      |SELECT b.l_orderkey AS l_orderkey, b.l_partkey AS l_partkey, b.l_suppkey AS l_suppkey,
      |  CASE WHEN b.no >= 1 THEN b.no ELSE c.f END AS no
      |FROM base b
      |LEFT JOIN missing m ON b.no < 1 AND m.l_orderkey = b.l_orderkey
      |  AND m.ordkey = b.ordkey
      |LEFT JOIN cand c ON c.l_orderkey = m.l_orderkey AND c.rnk = m.rnk
      |ORDER BY b.l_orderkey, b.l_partkey, b.l_suppkey,
      |  CASE WHEN b.no >= 1 THEN b.no ELSE c.f END""".stripMargin

  /** A14: rollup over (region, nation) — subtotals + grand total. */
  private def q28(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        dsum(dec2(col("c_acctbal"))).as("sum_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  private val q28Sql =
    """SELECT r_name, n_name, count(*) AS n_cust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  /** W4: min_by preference pick — per customer, the preferred order
    * by (status, priority, orderkey) struct ordering.
    * Reference: extract_plan.py:348-372 collision suggestion. */
  private def q29(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).orders
      .groupBy(col("o_custkey"))
      .agg(min_by(col("o_orderkey"),
        struct(col("o_orderstatus"), col("o_orderpriority"), col("o_orderkey")))
        .as("preferred_order"))
      .orderBy(col("o_custkey"))

  private val q29Sql =
    """SELECT o_custkey, preferred_order FROM (
      |  SELECT o_custkey, o_orderkey AS preferred_order,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderstatus, o_orderpriority, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  /** P6/E7 chamfer recall→rerank over embeddings grouped by label
    * (each label's vectors act as a track's chunk set) — under a FULL
    * DuckDB oracle: the recall vectors are exact-decimal centroids,
    * the rerank is the relational q31 chamfer formulation (round-4
    * cosines, per-chunk groupBy max, exact DECIMAL sums), so the
    * oracle re-derives BOTH stages including the candidate sets. */
  private def q30(s: SparkSession, dir: String): DataFrame =
    VectorAgg.similarByChamfer(
      Tables(s, dir).embeddings, "label", "embedding",
      col("vec_id").cast("int") % 3 === 0, recallK = 5, keepK = 3,
      maxChunks = 64)
      .toDF()
      .orderBy(col("anchor_id"), col("rank"))

  private val q30Sql =
    """WITH ex AS (
      |  SELECT CAST(label AS VARCHAR) AS gid,
      |    CAST(unnest(embedding) AS DOUBLE) AS v,
      |    generate_subscripts(embedding, 1) - 1 AS pos
      |  FROM embeddings),
      |pool AS (
      |  SELECT gid, pos,
      |    round(CAST(sum(CAST(v AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6) AS mv
      |  FROM ex GROUP BY 1, 2),
      |pv AS (SELECT gid, list(mv ORDER BY pos) AS mean_vec FROM pool GROUP BY gid),
      |recall AS (
      |  SELECT a_gid, b_gid FROM (
      |    SELECT a.gid AS a_gid, b.gid AS b_gid,
      |      row_number() OVER (PARTITION BY a.gid
      |        ORDER BY round(list_cosine_similarity(a.mean_vec, b.mean_vec), 4) DESC, b.gid) AS rk
      |    FROM pv a JOIN pv b ON CAST(a.gid AS INT) % 3 = 0 AND a.gid <> b.gid)
      |  WHERE rk <= 5),
      |m AS (
      |  SELECT gid, v, rn AS mi FROM (
      |    SELECT CAST(label AS VARCHAR) AS gid, CAST(embedding AS DOUBLE[]) AS v,
      |      row_number() OVER (PARTITION BY label ORDER BY CAST(embedding AS DOUBLE[])) AS rn
      |    FROM embeddings) WHERE rn <= 64),
      |cp AS (
      |  SELECT r.a_gid, r.b_gid, x.mi AS ai, y.mi AS bi,
      |    round(list_cosine_similarity(x.v, y.v), 4) AS c
      |  FROM recall r JOIN m x ON x.gid = r.a_gid JOIN m y ON y.gid = r.b_gid),
      |pa AS (SELECT a_gid, b_gid, ai, max(c) AS best FROM cp GROUP BY 1, 2, 3),
      |sa AS (SELECT a_gid, b_gid,
      |         CAST(sum(CAST(best AS DECIMAL(28,10))) AS DOUBLE) AS sum_a,
      |         count(*) AS na FROM pa GROUP BY 1, 2),
      |pb AS (SELECT a_gid, b_gid, bi, max(c) AS best FROM cp GROUP BY 1, 2, 3),
      |sb AS (SELECT a_gid, b_gid,
      |         CAST(sum(CAST(best AS DECIMAL(28,10))) AS DOUBLE) AS sum_b,
      |         count(*) AS nb FROM pb GROUP BY 1, 2),
      |scored AS (
      |  SELECT sa.a_gid, sa.b_gid,
      |    round(0.5 * (sa.sum_a / sa.na + sb.sum_b / sb.nb), 6) AS score
      |  FROM sa JOIN sb ON sa.a_gid = sb.a_gid AND sa.b_gid = sb.b_gid)
      |SELECT a_gid AS anchor_id, b_gid AS neighbor_id, rank, score FROM (
      |  SELECT a_gid, b_gid, score, row_number() OVER (
      |    PARTITION BY a_gid ORDER BY score DESC, b_gid) AS rank
      |  FROM scored)
      |WHERE rank <= 3 ORDER BY anchor_id, rank""".stripMargin

  /** Distributed connected components (ConnectedComponents: min-label
    * + pointer doubling, O(log diameter) rounds) over a deterministic
    * sparse graph synthesized from the dense order-key space: chain
    * edges (k, k+1) broken every 7th key, skip edges (k, k+3) every
    * 11th — chains that sometimes merge, so components are non-trivial
    * but stay small enough for the oracle's recursive-CTE transitive
    * closure. */
  private def q41(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables(s, dir).orders.select(col("o_orderkey").as("k"))
    def shifted(d: Int, pred: org.apache.spark.sql.Column): DataFrame =
      keys.alias("x").join(keys.alias("y"),
          col("y.k") === col("x.k") + d)
        .filter(pred)
        .select(col("x.k").as("a"), col("y.k").as("b"))
    val edges = shifted(1, col("x.k") % 7 =!= 6)
      .unionByName(shifted(3, col("x.k") % 11 === 0))
    graft.operators.ConnectedComponents.components(edges, "a", "b")
      .orderBy(col("node"))
  }

  private val q41Sql =
    """WITH RECURSIVE
      |k AS (SELECT o_orderkey AS k FROM orders),
      |e0 AS (
      |  SELECT x.k AS a, y.k AS b FROM k x JOIN k y ON y.k = x.k + 1
      |  WHERE x.k % 7 <> 6
      |  UNION ALL
      |  SELECT x.k AS a, y.k AS b FROM k x JOIN k y ON y.k = x.k + 3
      |  WHERE x.k % 11 = 0),
      |edges AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
      |walk(node, label) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.node)
      |SELECT node, CAST(min(label) AS BIGINT) AS component
      |FROM walk GROUP BY node ORDER BY node""".stripMargin

  /** Exact interpolated quantiles per group (median / p90 / p99 of
    * extended price by return flag), computed as a SORT + RANK PICK
    * instead of `percentile()`: rank every row with row_number over
    * (group, value) — one exchange + one Tungsten sort — and keep only
    * the ≤2 rows per (group, quantile) that straddle the (n−1)·p rank;
    * each kept row contributes its interpolation share and a sum
    * reassembles v_lo·(1−frac) + v_hi·frac. `percentile()` instead
    * gathers a value→count map per group in every map task and merges
    * those maps through the shuffle — the buffer traffic is what made
    * this the third-slowest bench line (3.48 s at sf0.1; the rewrite
    * measures 1.81 s, row-identical — the remaining cost is the sort
    * itself, whose parallelism the 3-value group key caps at 3 tasks,
    * the same cap `percentile`'s final merge had). Both sides share DuckDB
    * `quantile_cont`'s rank definition; round(6) absorbs the
    * interpolation-order ulp, the usual cross-engine float discipline.
    * At 100 TB a 3-value group key still serializes each group through
    * one task's sort — the mergeable-sketch twin (q55) is the scale
    * path, this is the exact one. */
  private def q43(s: SparkSession, dir: String): DataFrame = {
    val byFlag = Window.partitionBy(col("l_returnflag"))
    val ranked = Tables(s, dir).lineitem
      .select(col("l_returnflag"), col("l_extendedprice"))
      .withColumn("rn",
        row_number().over(byFlag.orderBy(col("l_extendedprice"))) - 1)
      .withColumn("n", count(lit(1)).over(byFlag))
    def share(p: Double): Column = {
      val r = (col("n") - 1) * lit(p)
      val lo = floor(r)
      val hi = ceil(r)
      when(col("rn") === lo && col("rn") === hi, col("l_extendedprice"))
        .when(col("rn") === lo, col("l_extendedprice") * (lit(1.0) - (r - lo)))
        .when(col("rn") === hi, col("l_extendedprice") * (r - lo))
    }
    val ps = Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")
    ranked
      .filter(ps.map { case (p, _) => share(p).isNotNull }.reduce(_ || _))
      .groupBy(col("l_returnflag"))
      .agg(first(col("n")).as("__n"),
        ps.map { case (p, name) => round(sum(share(p)), 6).as(name) }: _*)
      // the straddling rows carry n for every group nonempty enough to
      // have quantiles; lineitem flags are, by construction
      .select(col("l_returnflag"), col("__n").as("n"),
        col("p50"), col("p90"), col("p99"))
      .orderBy(col("l_returnflag"))
  }

  private val q43Sql =
    """SELECT l_returnflag, count(*) AS n,
      |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
      |  round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** The mergeable-sketch twin of q43 — `approx_percentile`
    * (Greenwald–Khanna summaries): partial aggregation with O(1/acc)
    * state per group, kilobyte sketches shuffle instead of every
    * value, no per-group sort. Honest-bench motivation: exact q43
    * costs 3.7 s at sf0.1 because `percentile` gathers and sorts each
    * group; the sketch path is what a 100 TB length/price profile
    * actually runs (same pattern as q48's HLL rollup: partials merge
    * across executors/days). Rows-only: the GK sketch is
    * engine-specific and merge-order-dependent in its last ulps;
    * AdvancedSpec bounds each approximation against the exact
    * neighboring quantiles instead. */
  private def q55(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50"),
        expr("approx_percentile(l_extendedprice, 0.9, 10000)").as("p90"),
        expr("approx_percentile(l_extendedprice, 0.99, 10000)").as("p99"))
      .orderBy(col("l_returnflag"))

  val all: Seq[Q] = Seq(
    Q("q27_gap_fill", q27, Some(q27Sql)),
    Q("q28_rollup", q28, Some(q28Sql)),
    Q("q29_min_by", q29, Some(q29Sql)),
    Q("q30_chamfer_similarity", q30, Some(q30Sql), headline = true),
    Q("q41_components", q41, Some(q41Sql), headline = true),
    Q("q43_quantiles", q43, Some(q43Sql)),
    Q("q55_approx_quantiles", q55, None))
}
