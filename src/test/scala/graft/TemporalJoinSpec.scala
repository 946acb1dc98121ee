package graft

import graft.operators.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 100.0, 1L),
    ("A", ts("2024-01-01 10:00:05"), 101.0, 2L),
    ("A", ts("2024-01-01 10:00:10"), 102.0, 3L),
    ("B", ts("2024-01-01 10:00:03"), 50.0, 4L))
    .toDF("sym", "qts", "price", "qid")

  private lazy val trades = Seq(
    ("A", ts("2024-01-01 10:00:04"), 5L),  // after quote 1, before 2
    ("A", ts("2024-01-01 10:00:05"), 6L),  // AT quote 2 → ties match
    ("B", ts("2024-01-01 10:00:01"), 7L),  // before any B quote → null
    ("C", ts("2024-01-01 10:00:09"), 8L))  // key with no build side → null
    .toDF("sym", "tts", "tid")

  test("asOf backward: latest build ≤ probe ts; ties match; misses null") {
    val got = AsOfJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts",
        Seq("price", "qid"))
      .orderBy("tid")
      .select("tid", "price", "qid").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(got === Seq(
      (5L, Some(100.0), Some(1L)),
      (6L, Some(101.0), Some(2L)),   // equal timestamp counts
      (7L, None, None),
      (8L, None, None)))
  }

  test("asOf forward: earliest build ≥ probe ts") {
    val got = AsOfJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts",
        Seq("qid"), forward = true)
      .orderBy("tid").select("tid", "qid").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    assert(got === Seq(
      (5L, Some(2L)),   // 10:00:05 is the next quote
      (6L, Some(2L)),   // equal timestamp counts forward too
      (7L, Some(4L)),
      (8L, None)))
  }

  test("asOf tolerance: stale matches null out, fresh survive") {
    val got = AsOfJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts",
        Seq("qid"), tolerance = Some(expr("INTERVAL 2 SECONDS")))
      .orderBy("tid").select("tid", "qid").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    // trade 5 at :04 vs quote 1 at :00 → 4s stale → null;
    // trade 6 at :05 vs quote 2 at :05 → 0s → kept
    assert(got.take(2) === Seq((5L, None), (6L, Some(2L))))
  }

  test("asOf carries the matched row atomically (no null back-fill)") {
    // newer build row has a NULL payload field; a per-column
    // last(ignoreNulls) would wrongly resurrect the older price
    val b = Seq(("A", ts("2024-01-01 09:00:00"), Some(10.0), 1L),
      ("A", ts("2024-01-01 10:00:00"), None, 2L))
      .toDF("sym", "qts", "price", "qid")
    val p = Seq(("A", ts("2024-01-01 11:00:00"), 9L)).toDF("sym", "tts", "tid")
    val r = AsOfJoin.asOf(p, b, Seq("sym"), "tts", "qts", Seq("price", "qid"))
      .select("qid", "price").collect()(0)
    assert(r.getLong(0) === 2L && r.isNullAt(1))
  }

  test("asOf ≡ naive join+rank on random data") {
    val rnd = new scala.util.Random(11)
    val build = (1 to 300).map(i => (s"k${rnd.nextInt(5)}",
      ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"),
      i.toLong)).toDF("k", "bts", "bid")
      // dedupe ties per (k, ts) like any deterministic caller would
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"k", $"bts").orderBy($"bid".desc)))
      .filter($"__rn" === 1).drop("__rn")
    val probe = (1 to 300).map(i => (s"k${rnd.nextInt(6)}",
      ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"),
      (1000 + i).toLong)).toDF("k", "pts", "pid")
    val fast = AsOfJoin.asOf(probe, build, Seq("k"), "pts", "bts", Seq("bid"))
      .select($"pid", $"bid").collect().map(r =>
        (r.getLong(0), Option(r.get(1)))).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"pid").orderBy($"bts".desc, $"bid".desc)
    val naive = probe.join(build, probe("k") === build("k") &&
        $"bts" <= $"pts", "left")
      .withColumn("__rn", row_number().over(w))
      .filter($"__rn" === 1)
      .select($"pid", $"bid").collect().map(r =>
        (r.getLong(0), Option(r.get(1)))).toMap
    assert(fast === naive)
  }

  test("asOf null semantics: null build ts never matches, null probe ts matches null") {
    // DuckDB ASOF semantics — without the explicit guards, Spark's
    // NULLS FIRST ordering would carry the null-ts quote into early
    // probes backward, and a null-ts probe would see the whole build
    // history forward
    val nullTs: java.sql.Timestamp = null
    val quotesN = Seq(
      ("A", nullTs, 999.0, 90L),
      ("A", ts("2024-01-01 10:00:05"), 101.0, 2L))
      .toDF("sym", "qts", "price", "qid")
    val tradesN = Seq(
      ("A", ts("2024-01-01 10:00:01"), 5L),  // before any REAL quote → null
      ("A", ts("2024-01-01 10:00:06"), 6L),  // after quote 2 → matches it
      ("A", nullTs, 7L))                     // null probe ts → null match
      .toDF("sym", "tts", "tid")
    def run(forward: Boolean) = AsOfJoin.asOf(tradesN, quotesN, Seq("sym"),
        "tts", "qts", Seq("qid"), forward = forward)
      .select("tid", "qid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val backward = run(forward = false)
    assert(backward(5L) === None, "null-ts build must not match backward")
    assert(backward(6L) === Some(2L))
    assert(backward(7L) === None, "null-ts probe must match null")
    val forward = run(forward = true)
    assert(forward(5L) === Some(2L))
    assert(forward(6L) === None)
    assert(forward(7L) === None, "null-ts probe must match null forward too")
  }

  test("asOf null equi-keys never match (join semantics, not window grouping)") {
    // ON p.k = b.k is NULL for NULL = NULL — a null-key probe survives
    // with a null match; a null-key build enriches nothing (the window
    // formulation would otherwise pair them in the null partition)
    val nullSym: String = null
    val quotesK = Seq(
      (nullSym, ts("2024-01-01 10:00:00"), 1.0, 1L),
      ("A", ts("2024-01-01 10:00:00"), 2.0, 2L))
      .toDF("sym", "qts", "price", "qid")
    val tradesK = Seq(
      (nullSym, ts("2024-01-01 10:00:05"), 5L),
      ("A", ts("2024-01-01 10:00:05"), 6L))
      .toDF("sym", "tts", "tid")
    val got = AsOfJoin.asOf(tradesK, quotesK, Seq("sym"), "tts", "qts",
        Seq("qid")).select("tid", "qid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(5L) === None, "null-key probe must not enrich from null-key build")
    assert(got(6L) === Some(2L))
  }

  test("rangeJoin: inverted intervals are dropped, not exploded") {
    val pts = Seq(("A", ts("2024-01-01 10:00:00"), 1L))
      .toDF("k", "pts", "pid")
    // end BEFORE start by years — sequence() would otherwise build a
    // descending multi-million-element bucket array for this one row
    val ivals = Seq(
      ("A", ts("2026-01-01 00:00:00"), ts("2020-01-01 00:00:00"), "corrupt"),
      ("A", ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00"), "good"))
      .toDF("k", "s", "e", "tag")
    val got = RangeJoin.pointInInterval(pts, ivals, Seq("k"), "pts", "s", "e",
        Seq("tag"), bucketMicros = 60L * 1000000)
      .select("tag").collect().map(_.getString(0))
    assert(got.toSeq === Seq("good"))
  }

  test("asOf plan contains no join operator at all") {
    val plan = AsOfJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts",
      Seq("price")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected join-free plan:\n$plan")
    assert(plan.contains("Window"))
  }

  test("rangeJoin ≡ naive inequality join; intervals span buckets") {
    val rnd = new scala.util.Random(13)
    val points = (1 to 400).map(i => (s"t${rnd.nextInt(3)}",
      ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"),
      i.toLong)).toDF("k", "pts", "pid")
    // interval lengths 0s..3h: some span many 30-min buckets
    val ivals = (1 to 60).map { i =>
      val h = rnd.nextInt(22)
      (s"t${rnd.nextInt(3)}", ts(f"2024-01-01 $h%02d:00:00"),
        ts(f"2024-01-01 ${h + rnd.nextInt(3)}%02d:${rnd.nextInt(60)}%02d:00"),
        (100 + i).toLong)
    }.toDF("k", "s", "e", "iid")
    val fast = RangeJoin.pointInInterval(points, ivals, Seq("k"),
        "pts", "s", "e", Seq("iid"), bucketMicros = 30L * 60 * 1000000)
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(ivals, points("k") === ivals("k") &&
        $"pts" >= $"s" && $"pts" <= $"e")
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast === naive)
    assert(fast.nonEmpty)
  }

  test("rangeJoin plans as an equi-join, not a nested loop") {
    val points = Seq(("a", ts("2024-01-01 10:00:00"), 1L)).toDF("k", "pts", "pid")
    val ivals = Seq(("a", ts("2024-01-01 09:00:00"),
      ts("2024-01-01 11:00:00"), 2L)).toDF("k", "s", "e", "iid")
    val plan = RangeJoin.pointInInterval(points, ivals, Seq("k"),
        "pts", "s", "e", Seq("iid"), 1800000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
