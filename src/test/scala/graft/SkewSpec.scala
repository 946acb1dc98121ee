package graft

import graft.operators.Skew
import graft.queries.Num.dec9
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The salt + re-merge fallbacks must be RESULT-IDENTICAL to the
  * single-window formulations they shadow (q08/q26) — proven here on
  * the real events table plus crafted cross-bucket session fixtures.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables(spark, "/root/testdata/sf0.001").events

  test("saltedRunningSum ≡ single window on the events table") {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaWindow = events
      .withColumn("rv", sum(dec9(col("value"))).over(w).cast("double"))
      .select(col("user_id"), col("event_id"), col("rv"))
    val viaSalted = Skew.saltedRunningSum(events, Seq("user_id"),
        Seq(col("ts"), col("event_id")), to_date(col("ts")),
        dec9(col("value")), "rv")
      .select(col("user_id"), col("event_id"), col("rv").cast("double"))
    assert(viaSalted.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(viaSalted).count() === 0)
  }

  test("saltedSessionize ≡ single window on the events table") {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val newSession = when(
      unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(byUser))
        > 1800 || lag(col("ts"), 1).over(byUser).isNull, 1).otherwise(0)
    val viaWindow = events
      .withColumn("new_s", newSession)
      .withColumn("session_id", sum(col("new_s"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("event_id"), col("session_id"))
    val viaSalted = Skew.saltedSessionize(events, Seq("user_id"), col("ts"),
        Seq(col("ts"), col("event_id")), gapSec = 1800, to_date(col("ts")))
      .select(col("user_id"), col("event_id"),
        col("session_id").cast("long").as("session_id"))
    assert(viaSalted.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(viaSalted).count() === 0)
  }

  test("salted operators ≡ single window on random skewed data (5 rounds)") {
    // random timestamp streams with a deliberately hot key; bucket by
    // MINUTE so sessions routinely span many buckets (gap 90 s)
    val rnd = new scala.util.Random(13)
    for (round <- 1 to 5) {
      val rows = (1 to 400).map { i =>
        val user = if (rnd.nextDouble() < 0.7) 1L else 1L + rnd.nextInt(4) // hot key
        val t = rnd.nextInt(3600) // one hour, second granularity
        (user, i.toLong, t)
      }
      val df = rows.toDF("user_id", "event_id", "off")
        .withColumn("ts",
          expr("to_timestamp('2026-01-01 00:00:00') + make_interval(0,0,0,0,0,0,off)"))
        .drop("off")
        .withColumn("value", (col("event_id") % 10).cast("double"))
      val byKey = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val cum = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bucket = date_trunc("minute", col("ts"))

      val sumWindow = df.withColumn("rv",
          sum(dec9(col("value"))).over(cum).cast("double"))
        .select(col("user_id"), col("event_id"), col("rv"))
      val sumSalted = Skew.saltedRunningSum(df, Seq("user_id"),
          Seq(col("ts"), col("event_id")), bucket, dec9(col("value")), "rv")
        .select(col("user_id"), col("event_id"), col("rv").cast("double"))
      assert(sumSalted.exceptAll(sumWindow).count() === 0, s"sum round $round")
      assert(sumWindow.exceptAll(sumSalted).count() === 0, s"sum round $round")

      val flag = when(unix_timestamp(col("ts")) -
        unix_timestamp(lag(col("ts"), 1).over(byKey)) > 90 ||
        lag(col("ts"), 1).over(byKey).isNull, 1).otherwise(0)
      val sessWindow = df.withColumn("f", flag)
        .withColumn("session_id", sum(col("f")).over(cum))
        .select(col("user_id"), col("event_id"), col("session_id"))
      val sessSalted = Skew.saltedSessionize(df, Seq("user_id"), col("ts"),
          Seq(col("ts"), col("event_id")), gapSec = 90, bucket)
        .select(col("user_id"), col("event_id"),
          col("session_id").cast("long").as("session_id"))
      assert(sessSalted.exceptAll(sessWindow).count() === 0, s"sess round $round")
      assert(sessWindow.exceptAll(sessSalted).count() === 0, s"sess round $round")
    }
  }

  test("salted operators keep null-key rows (the single window does)") {
    // a null key forms its own window partition in the reference
    // formulation; the stitch join must be null-safe or those rows
    // silently vanish
    val df = Seq(
      (Some(1L), "2024-01-01 00:00:01", 1.0),
      (None, "2024-01-01 00:10:00", 2.0),
      (None, "2024-01-01 00:20:00", 3.0),
      (Some(1L), "2024-01-02 00:00:01", 4.0))
      .toDF("user_id", "ts0", "value")
      .withColumn("ts", to_timestamp(col("ts0"))).drop("ts0")
      .withColumn("event_id", monotonically_increasing_id())
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaWindow = df
      .withColumn("rv", sum(dec9(col("value"))).over(w).cast("double"))
      .select(col("user_id"), col("event_id"), col("rv"))
    val viaSalted = Skew.saltedRunningSum(df, Seq("user_id"),
        Seq(col("ts"), col("event_id")), to_date(col("ts")),
        dec9(col("value")), "rv")
      .select(col("user_id"), col("event_id"), col("rv").cast("double"))
    assert(viaSalted.count() === 4, "null-key rows must not be dropped")
    assert(viaSalted.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(viaSalted).count() === 0)
    val sess = Skew.saltedSessionize(df, Seq("user_id"), col("ts"),
      Seq(col("ts"), col("event_id")), gapSec = 1800, to_date(col("ts")))
    assert(sess.count() === 4, "null-key rows must survive sessionize")
    assert(sess.filter(col("user_id").isNull).count() === 2)
  }

  test("hotKeys: MG guarantee — every key above n/(k+1) is found") {
    val rnd = new scala.util.Random(5)
    // hot keys: "h1" 30%, "h2" 15%; 60 cold keys share the rest
    val n = 20000
    val rows = (1 to n).map { _ =>
      val r = rnd.nextDouble()
      if (r < 0.30) "h1" else if (r < 0.45) "h2" else s"cold${rnd.nextInt(60)}"
    }
    val df = rows.toDF("k").repartition(16)
    val k = 8
    val got = Skew.hotKeys(df, "k", k).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // guarantee: freq > n/(k+1) ⇒ present, count within n/(k+1)
    val bound = n.toDouble / (k + 1)
    exact.filter(_._2 > bound).keys.foreach { key =>
      assert(got.contains(key), s"hot key $key missing")
      assert(got(key) <= exact(key))
      assert(got(key) >= exact(key) - bound, s"$key count too low")
    }
    assert(got.size <= k)
    // ranked by count: the hottest key is first
    val first = Skew.hotKeys(df, "k", k).collect()(0)
    assert(first.getString(0) === "h1")
  }

  test("AQE splits a planted hot-key join partition (OptimizeSkewedJoin fires)") {
    // SCALE.md leans on "AQE's skew handling splits hot-gram
    // partitions" for the q58-family joins; this pins that claim as
    // evidence (VERDICT r7 item 7): a 90%-hot key through a shuffle
    // join under bench-scale thresholds must come out of AQE with the
    // skew=true join marker AND the right rows.
    val conf = spark.conf
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // bench-scale thresholds: production defaults (256 MB) scaled to
      // the test fixture; factor 2 over a ~40-partition shuffle where
      // one partition carries ~90% of the bytes
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val pad = "x" * 200
      val left = (1 to 30000).map { i =>
        (if (i % 10 != 0) 0L else (i % 97).toLong, s"$pad$i")
      }.toDF("k", "payload").repartition(8)
      val right = (0L until 97L).map(k => (k, s"dim$k")).toDF("k", "name")
      val joined = left.join(right, "k")
      // collect() (not count()) so the SAME QueryExecution finalizes —
      // count() plans a separate aggregate query and the inspected
      // adaptive plan would never execute
      val n = joined.collect().length
      assert(n === 30000, "every left row matches exactly one dim row")
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire; final adaptive plan:\n$finalPlan")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }

  test("saltedSessionize stitches sessions across bucket boundaries") {
    // one user, hourly buckets; session spans the 10:59→11:10 boundary
    // (gap 11 min < 30 min), then a real new session at 13:00
    val rows = Seq(
      ("u", 1L, "2026-01-01 10:50:00"),
      ("u", 2L, "2026-01-01 10:59:00"),
      ("u", 3L, "2026-01-01 11:10:00"), // continues session 1
      ("u", 4L, "2026-01-01 13:00:00"), // new session (gap 110 min)
      ("u", 5L, "2026-01-01 13:05:00"))
      .toDF("user_id", "event_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val got = Skew.saltedSessionize(rows, Seq("user_id"), col("ts"),
        Seq(col("ts"), col("event_id")), gapSec = 1800,
        date_trunc("hour", col("ts")))
      .select(col("event_id"), col("session_id").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L))
  }
}
