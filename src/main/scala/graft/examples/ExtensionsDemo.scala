package graft.examples

import org.apache.spark.sql.SparkSession

/** Proves the DEPLOYMENT path for the native SQL functions: a fresh
  * JVM builds its session with `spark.sql.extensions=graft.GraftExtensions`
  * (the static-conf string a cluster admin sets — reflection-loaded,
  * no library call anywhere) and immediately runs SQL over every
  * injected function. ExtensionsSpec can only exercise
  * `.withExtensions` because the shared test SparkContext already
  * exists and static confs don't apply to it; this main IS the fresh
  * JVM.
  *
  * Run: sbt "runMain graft.examples.ExtensionsDemo"
  */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-extensions-demo")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val row = spark.sql(
      """SELECT graft_cosine(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS cos,
        |       graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
        |       graft_simhash64(array('a', 'b')) AS simhash,
        |       graft_sorted_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS inter,
        |       graft_winnow_mins(array(5L, 3L, 4L, 1L, 2L), 2) AS winnow,
        |       size(graft_minhash(array('a b', 'b c'), 8)) AS minhash_len,
        |       graft_rhp_sig(array(1.0d, 0.0d), 8, 0) AS rhp
        |""".stripMargin).collect()(0)
    require(math.abs(row.getDouble(0) - 1.0) < 1e-12, "cosine")
    require(math.abs(row.getDouble(1) - 11.0) < 1e-12, "dot")
    require(row.getSeq[Long](4) == Seq(3L, 1L), "winnow")
    require(row.getInt(5) == 8, "minhash")
    val agg = spark.sql(
      """SELECT graft_top_k(score, id, 2) AS t,
        |       graft_bounded_collect(arr, 2) AS b,
        |       graft_frequent_keys(k, 4) AS f
        |FROM VALUES (1.0d, 1L, array(2.0d), 'x'), (3.0d, 2L, array(1.0d), 'x'),
        |            (2.0d, 3L, array(3.0d), 'y') AS t(score, id, arr, k)
        |""".stripMargin).collect()(0)
    require(agg.getSeq[org.apache.spark.sql.Row](0)
      .map(_.getAs[Long]("id")) == Seq(2L, 3L), "top_k")
    println("[extensions-demo] all 10 functions injected via " +
      "spark.sql.extensions config string: OK")
    spark.stop()
  }
}
