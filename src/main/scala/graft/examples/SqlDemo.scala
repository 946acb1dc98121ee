package graft.examples

import graft.GraftSql
import org.apache.spark.sql.SparkSession

/** SQL-surface sample: the whole engine through `spark.sql` — tables
  * as views, native graft functions registered.
  * Run: sbt "runMain graft.examples.SqlDemo [sfDir]"
  */
object SqlDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSql.registerAll(spark,
      args.headOption.getOrElse("/root/testdata/sf0.001"))
    spark.sql("""
      SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
             count(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY ROLLUP(n_name) ORDER BY revenue DESC NULLS FIRST LIMIT 8
    """).show(truncate = false)
    spark.sql("""
      SELECT a.vec_id, b.vec_id,
             round(graft_cosine(a.embedding, b.embedding), 4) AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      ORDER BY cos DESC LIMIT 5
    """).show(truncate = false)
    spark.stop()
  }
}
