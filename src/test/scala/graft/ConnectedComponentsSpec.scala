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
