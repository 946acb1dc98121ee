package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Scratch profiler for q18 fixed overhead (deleted before round end). */
object ScratchQ18 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMER $label ${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    val docs = Tables(spark, sfDir).documents
    time("warmup count")(docs.count())
    val n1 = time("q18 run1")(Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleK = 2, numHashes = 32, bands = 8, threshold = 0.2).count())
    val n2 = time("q18 run2")(Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleK = 2, numHashes = 32, bands = 8, threshold = 0.2).count())
    println(s"ROWS $n1 $n2")
    spark.stop()
  }
}
