package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Count shuffle/scan operators in a query's formatted physical plan —
  * the quick "did that refactor remove an exchange" check.
  *
  * Run: sbt "runMain graft.examples.PlanStats q36_catalog_pipeline"
  */
object PlanStats {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q36_catalog_pipeline")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    def count(s: String) = s.r.findAllIn(plan).size
    // shuffle exchanges ONLY: a bare "Exchange " substring also hits
    // ReusedExchange and BroadcastExchange lines — the count would not
    // move when a refactor turns a shuffle into a reuse, the exact
    // signal this tool exists to show
    println(s"PLANSTATS $name: exchanges=${count("\\(\\d+\\) Exchange ")} " +
      s"reused=${count("ReusedExchange")} scans=${count("Scan parquet")} " +
      s"windows=${count("\\(\\d+\\) Window")} smj=${count("SortMergeJoin")} " +
      s"bhj=${count("BroadcastHashJoin")}")
    graft.CacheScope.releaseAll()
    spark.stop()
  }
}
