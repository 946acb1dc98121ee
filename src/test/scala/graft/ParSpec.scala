package graft

import graft.operators.Par

/** `Par.ensureWide` is now load-bearing for every hash-heavy operator:
  * it must widen a narrow scan (the one-partition small-file case that
  * serialized q72 on a single core) and must NOT touch an input that
  * is already at/above the session parallelism (the cluster-scale
  * case, where a repartition would collapse a wide scan and pay a
  * full-data exchange).
  */
class ParSpec extends SparkSpec {
  import spark.implicits._

  test("widens a narrow input up to the session parallelism") {
    val narrow = (1 to 1000).toDF("x").coalesce(1)
    assert(narrow.rdd.getNumPartitions === 1)
    val wide = Par.ensureWide(narrow)
    assert(wide.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    assert(wide.as[Int].collect().sorted === (1 to 1000).toArray)
  }

  test("widens a 1-partition stream behind a broadcast join") {
    import org.apache.spark.sql.functions._
    // a broadcast join PRESERVES its streamed side's width, so a
    // 1-partition probe stays 1-partition through the join — the old
    // execute()-probe threw here (sparkPlan predates
    // EnsureRequirements) and its shuffle-width fallback wrongly
    // skipped the widening
    val narrow = (1 to 1000).toDF("x").coalesce(1)
    val dim = (1 to 10).toDF("x").withColumn("y", col("x") * 2)
    val joined = narrow.join(broadcast(dim), Seq("x"))
    val wide = Par.ensureWide(joined)
    assert(wide.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
  }

  test("does not collapse a shuffle-joined (already shuffle-width) input") {
    // a sort-merge/shuffled join runs at the shuffle width; ensureWide
    // must recognize that WITHOUT executing anything and pass through
    val a = (1 to 1000).toDF("x").coalesce(1)
    val b = (1 to 1000).toDF("x").coalesce(1)
    val joined = a.hint("merge").join(b, Seq("x"))
    val out = Par.ensureWide(joined)
    assert(out eq joined,
      "shuffle-width join input should pass through unchanged")
  }

  test("leaves an already-wide input untouched (no repartition node)") {
    val target = spark.sparkContext.defaultParallelism
    val wide = (1 to 1000).toDF("x").repartition(target + 3)
    val out = Par.ensureWide(wide)
    assert(out.rdd.getNumPartitions === target + 3,
      "ensureWide must never COLLAPSE a wide input to the core count")
    assert(out eq wide, "already-wide input should pass through unchanged")
  }
}
