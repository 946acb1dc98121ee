package graft.examples

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query wall-time profiler: warm the plan shape at
  * sf0.001, then time N repetitions at the target SF — the bench
  * methodology, for one query, without the full-suite runtime.
  *
  * Run: sbt "runMain graft.examples.QueryProfile q36_catalog_pipeline \
  *   /root/testdata/sf0.1 3"
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q36_catalog_pipeline")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    try graft.Measure.force(fn(spark, "/root/testdata/sf0.001"))
    finally graft.CacheScope.releaseAll()
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      // elapsed BEFORE releaseAll — Bench's methodology: synchronous
      // block eviction is bookkeeping, not query cost, and including
      // it made cache-heavy queries look slower here than in the
      // committed bench numbers
      val elapsed =
        try { graft.Measure.force(fn(spark, sfDir)); System.nanoTime() - t0 }
        finally graft.CacheScope.releaseAll(blocking = true)
      println(f"$name rep $i: ${elapsed / 1e9}%.2f s")
    }
    spark.stop()
  }
}
