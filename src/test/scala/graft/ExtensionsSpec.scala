package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions: the `spark.sql.extensions` injection path must
  * provide every graft function with NO imperative register() call,
  * and must survive `newSession()` (which drops temp functions).
  */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects all functions at session build; survives newSession") {
    // make sure the shared session is initialized BEFORE we clear the
    // default-session slot (other suites hold a direct reference)
    spark.sparkContext
    TestSpark.synchronized {
      // same SparkContext, NEW SparkSession built with the injector.
      // (.withExtensions, not .config("spark.sql.extensions", …):
      // that key is a STATIC conf read from the SparkContext, and
      // the shared test context already exists — on a cluster both
      // paths run the identical GraftExtensions.apply.)
      // The JVM-global default/active session slots are cleared ONLY
      // around the getOrCreate call (the one API that reads them) and
      // restored in a finally immediately after — tests are forked
      // sequential (build.sbt), and keeping the window this narrow
      // means even a future parallel runner could only race a few ms
      // of builder time, not the whole suite body.
      val s2 = {
        val prevDefault = SparkSession.getDefaultSession
        val prevActive = SparkSession.getActiveSession
        SparkSession.clearDefaultSession()
        SparkSession.clearActiveSession()
        try {
          SparkSession.builder()
            .master("local[4]")
            .withExtensions(new GraftExtensions)
            .getOrCreate()
        } finally {
          prevDefault.foreach(SparkSession.setDefaultSession)
          prevActive.foreach(SparkSession.setActiveSession)
        }
      }
      try {
        assert(s2 ne spark, "expected a fresh session over the shared context")
        val row = s2.sql(
          """SELECT graft_cosine(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c,
            |       graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
            |       graft_simhash64(array('a', 'b')) AS s,
            |       graft_sorted_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS i,
            |       graft_winnow_mins(array(5L, 3L, 4L, 1L, 2L), 2) AS w,
            |       size(graft_minhash(array('a b', 'b c'), 8)) AS m,
            |       graft_rhp_sig(array(1.0d, 0.0d), 8, 0) AS r,
            |       size(graft_md5_minhash(array('a b', 'b c'), 8).sig) AS mm,
            |       graft_decimal_dot(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS dd
            |""".stripMargin).collect()(0)
        assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
        assert(math.abs(row.getDouble(1) - 11.0) < 1e-12)
        assert(row.getSeq[Long](4) === Seq(3L, 1L))
        assert(row.getInt(5) === 8)
        assert(row.getInt(7) === 8)
        assert(math.abs(row.getDouble(8) - 25.0) < 1e-12)

        // aggregates, in a newSession() clone (temp functions would be
        // gone here; injected ones must not be)
        val s3 = s2.newSession()
        val agg = s3.sql(
          """SELECT graft_top_k(score, id, 2) AS t,
            |       graft_bounded_collect(arr, 2) AS b,
            |       graft_frequent_keys(k, 4) AS f
            |FROM VALUES (1.0d, 1L, array(2.0d), 'x'), (3.0d, 2L, array(1.0d), 'x'),
            |            (2.0d, 3L, array(3.0d), 'y') AS t(score, id, arr, k)
            |""".stripMargin).collect()(0)
        val top = agg.getSeq[org.apache.spark.sql.Row](0)
        assert(top.map(_.getAs[Long]("id")) === Seq(2L, 3L))
        // matches the shared session's temp-function results exactly
        GraftSql.registerAll(spark, "/root/testdata/sf0.001")
        val viaTemp = spark.sql(
          "SELECT graft_simhash64(array('a', 'b')) AS s").collect()(0).getLong(0)
        assert(viaTemp === row.getLong(2))
      } finally {
        // hand the active-session slot back to the shared session so
        // later suites on this thread see the expected globals
        SparkSession.setActiveSession(spark)
      }
    }
  }
}
