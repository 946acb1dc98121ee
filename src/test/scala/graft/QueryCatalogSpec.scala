package graft

/** Contract spec for the driver: every registered query runs at
  * sf0.001 without error; oracle coverage is declared for every
  * SQL-expressible query; the flagship entry returns rows.
  */
class QueryCatalogSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("catalog names are unique and oracles reference only known queries") {
    val names = QueryCatalog.all.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  QueryCatalog.all.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val df = q.run(spark, sf)
      val n = df.count()
      // queries that can legitimately be empty on tiny synthetic data
      val mayBeEmpty = Set("q10_set_except", "q16_exact_dup_groups",
        "q18_minhash_lsh", "q19_simhash_pairs", "q09_collision_groups")
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
      // Persist lifecycle: operator-internal caches are registered in
      // CacheScope; after the consuming action + release, NOTHING may
      // remain cached (a leaked persist accumulates across a
      // long-lived session's query loop).
      CacheScope.releaseAll()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"${q.name} left cached blocks behind after CacheScope.releaseAll")
    }
  }
}
