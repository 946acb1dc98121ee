package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Plain union-find reference. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // canonicalize to min-of-component
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => ns.map(_ -> ns.min) }.toMap
  }

  test("components ≡ union-find on random sparse graphs") {
    val rnd = new scala.util.Random(5)
    for (trial <- 1 to 3) {
      val n = 200
      val edges = (1 to 150).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val got = ConnectedComponents.components(
          edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === ufComponents(edges), s"trial $trial")
    }
  }

  test("local-closure fallback ≡ distributed path ≡ union-find (random graphs)") {
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 3) {
      val edges = (1 to 120).map(_ =>
        (rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
        .filter(e => e._1 != e._2)
      val df = edges.toDF("a", "b")
      def run(threshold: Long): Map[Long, Long] =
        ConnectedComponents.components(df, "a", "b",
            collectThreshold = threshold)
          .as[(Long, Long)].collect().toMap
      val local = run(1000000L) // edges well below → driver union-find
      val dist = run(0L)        // always distributed
      assert(local === dist)
      assert(local === ufComponents(edges))
      graft.CacheScope.releaseAll()
    }
  }

  test("local-closure fallback: threshold respected, empty edges fine") {
    // above-threshold graphs must take the distributed path and agree
    val edges = (0L until 50L).map(i => (i, i + 1)).toDF("a", "b")
    val viaTiny = ConnectedComponents.components(edges, "a", "b",
        collectThreshold = 5L) // 100 doubled edges > 5 → distributed
      .as[(Long, Long)].collect().toMap
    assert(viaTiny.values.toSet === Set(0L))
    graft.CacheScope.releaseAll()
    val empty = ConnectedComponents.components(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b",
      collectThreshold = 10L)
    assert(empty.count() === 0)
    graft.CacheScope.releaseAll()
  }

  test("components: long chain converges (pointer doubling, few rounds)") {
    // a 400-node path — diameter 399; plain propagation would need
    // 399 rounds and trip maxIter, doubling needs ~log2
    val chain = (0L until 399L).map(i => (i, i + 1))
    val got = ConnectedComponents.components(chain.toDF("a", "b"), "a", "b",
        maxIter = 15)
      .agg(countDistinct(col("component")), min(col("component")),
        count(lit(1))).collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) === ((1L, 0L, 400L)))
  }

  test("dupGroups: component id is the canonical min doc; sizes attached") {
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("a_id", "b_id")
    val got = ConnectedComponents.dupGroups(pairs, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(
      10L -> (10L, 3L), 11L -> (10L, 3L), 12L -> (10L, 3L),
      20L -> (20L, 2L), 21L -> (20L, 2L)))
  }
}
