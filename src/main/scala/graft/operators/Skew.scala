package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Skew-safe variants of the per-key sequential windows (SCALE.md
  * "Known limits": q08/q26 assume no single key outgrows an executor;
  * these are the documented salt + re-merge fallback).
  *
  * The salt is an ORDER-ALIGNED bucket expression supplied by the
  * caller (e.g. `to_date(ts)` under an order of (ts, …)): it must be
  * monotonically non-decreasing along the window order within each
  * key, so buckets tile the key's timeline. Each bucket's rows are
  * then processed by an ordinary window over (key, bucket) — skewed
  * keys split across many tasks — and stitched with an O(#buckets)
  * per-key prefix pass over bucket summaries, which is always tiny.
  *
  * Two shuffles + a broadcast-sized summary join instead of one
  * all-rows-of-a-key-on-one-task window: the trade the reference's
  * shard math makes for its seek-bound stages (shard_math.py), applied
  * to Spark windows.
  */
object Skew {

  /** One-pass approximate heavy hitters over a key column — the
    * detector that decides WHICH keys need the salted fallbacks
    * below (or broadcast-side exclusion, or AQE skew hints). Misra–
    * Gries summary as a partial-aggregating
    * [[org.apache.spark.sql.graft.FrequentKeys]] expression: one scan,
    * ≤ k counters per map task. Guarantee: every key with frequency
    * > n/(k+1) appears; counts understate by ≤ n/(k+1).
    * Returns (key, approx_count), count-descending. */
  def hotKeys(df: DataFrame, keyCol: String, k: Int = 64): DataFrame =
    df.agg(org.apache.spark.sql.graft.FrequentKeysExpression
        .frequentKeys(col(keyCol), k).as("fk"))
      .select(posexplode(col("fk")).as(Seq("rank", "e")))
      .select(col("e.key").as("key"), col("e.approx_count").as("approx_count"))

  /** Running (cumulative) sum of `valueCol` per key in
    * (bucket, orderCols) order — result identical to
    * `sum(value).over(Window.partitionBy(keys).orderBy(orderCols))`
    * whenever `bucket` is order-aligned (pinned by SkewSpec on the
    * events table). Use an exact-decimal `valueCol` for bit-stable
    * stitching (addition must be associative across bucket joins). */
  def saltedRunningSum(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[Column], bucket: Column, valueCol: Column,
      outCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val wIntra = Window.partitionBy((keys :+ col("__bkt")): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // exclusive prefix of bucket totals per key — #buckets rows per
    // key, never the fact table
    val wBkts = Window.partitionBy(keys: _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val marked = df.withColumn("__bkt", bucket).withColumn("__v", valueCol)
    // join back on ONE struct key: struct equality is null-safe on its
    // FIELDS, so rows with a null key or null bucket (which the
    // reference single-window formulation keeps — nulls form their own
    // window partition) survive the stitch instead of silently
    // vanishing through a plain equi-join's NULL != NULL
    val jk = struct((keys :+ col("__bkt")): _*)
    val offsets = marked.groupBy((keys :+ col("__bkt")): _*)
      .agg(sum(col("__v")).as("__total"))
      .withColumn("__offset", sum(col("__total")).over(wBkts))
      .select(jk.as("__jk"), col("__offset"))
    marked
      .withColumn("__intra", sum(col("__v")).over(wIntra))
      .withColumn("__jk", jk)
      .join(offsets, Seq("__jk"))
      .withColumn(outCol, coalesce(col("__offset"), lit(0)) + col("__intra"))
      .drop("__jk", "__bkt", "__v", "__intra", "__offset")
  }

  /** Gap-based sessionization per key — identical to the
    * lag + running-count single-window formulation (new session after
    * > `gapSec` of inactivity; ids are per-key ordinals from 1).
    * Cross-bucket stitching: a bucket's first row compares against
    * the previous bucket's LAST timestamp (buckets are order-aligned,
    * so that is the per-(key, bucket) max), and intra-bucket session
    * ordinals are offset by the prior buckets' session-start count. */
  def saltedSessionize(df: DataFrame, keyCols: Seq[String], tsCol: Column,
      orderCols: Seq[Column], gapSec: Long, bucket: Column,
      outCol: String = "session_id"): DataFrame = {
    val keys = keyCols.map(col)
    val wIntra = Window.partitionBy((keys :+ col("__bkt")): _*)
      .orderBy(orderCols: _*)
    val wIntraCum = wIntra.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBkts = Window.partitionBy(keys: _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val marked = df.withColumn("__bkt", bucket).withColumn("__ts", tsCol)
    // intra-bucket flags; a bucket's first row is provisionally a
    // session start, fixed up against the previous bucket's last ts
    val prevTs = lag(col("__ts"), 1).over(wIntra)
    val flagged = marked.withColumn("__first",
        (row_number().over(wIntra) === 1).cast("int"))
      .withColumn("__flag", when(col("__first") === 1 ||
        unix_timestamp(col("__ts")) - unix_timestamp(prevTs) > gapSec, 1)
        .otherwise(0))
    // per-(key, bucket): last ts and session-start count (with the
    // bucket-leading flag resolved against the neighbor bucket)
    val summaries = flagged.groupBy((keys :+ col("__bkt")): _*)
      .agg(max(col("__ts")).as("__last_ts"),
        sum(col("__flag")).as("__starts"),
        min_by(col("__ts"), struct(orderCols: _*)).as("__first_ts"))
    val wPrev = Window.partitionBy(keys: _*).orderBy(col("__bkt"))
    val adjusted = summaries
      .withColumn("__prev_last", lag(col("__last_ts"), 1).over(wPrev))
      // the provisional bucket-leading start is NOT a real start when
      // the previous bucket ended within the gap
      .withColumn("__lead_fix",
        when(col("__prev_last").isNotNull &&
          unix_timestamp(col("__first_ts")) - unix_timestamp(col("__prev_last"))
            <= gapSec, 1).otherwise(0))
      .withColumn("__starts_adj", col("__starts") - col("__lead_fix"))
      .withColumn("__offset",
        coalesce(sum(col("__starts_adj")).over(wBkts), lit(0L)))
      // struct join key: null-safe on fields (see saltedRunningSum)
      .select(struct((keys :+ col("__bkt")): _*).as("__jk"),
        col("__lead_fix"), col("__offset"))
    flagged
      .withColumn("__jk", struct((keys :+ col("__bkt")): _*))
      .join(adjusted, Seq("__jk"))
      .withColumn("__flag_adj",
        when(col("__first") === 1 && col("__lead_fix") === 1, 0)
          .otherwise(col("__flag")))
      // rows in a carried-over session (lead_fix=1, no adjusted flag
      // seen yet) get offset + 0 — the id of the previous bucket's
      // last session, which `offset` already counts
      .withColumn(outCol,
        col("__offset") + sum(col("__flag_adj")).over(wIntraCum))
      .drop("__jk", "__bkt", "__ts", "__first", "__flag", "__flag_adj",
        "__lead_fix", "__offset")
  }
}
