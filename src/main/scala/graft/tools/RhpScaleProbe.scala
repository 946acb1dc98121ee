package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Parameterized scaling probe for the banded RHP near-dup pipeline
  * (q71's operator) — the SCALE.md evidence runner for the two knobs
  * the fixed-parameter gate cannot turn, closing the 100× table
  * (VERDICT r9 item 4).
  *
  * The round-9 10× analysis named the discipline: "the
  * threshold/planes-per-band must rise with N, or the OUTPUT itself
  * becomes the bottleneck". The two knobs bound DIFFERENT blow-ups:
  *
  *   - `threshold` bounds the VERIFIED OUTPUT: at dim 64 the random
  *     cosine tail is ~N(0, 1/√64), so P(cos ≥ t) is fixed while
  *     candidate pairs grow O(N²) — the verified tail grows
  *     quadratically unless t rises with N (measured 106× output at
  *     10× data, round-9 table);
  *   - `numPlanes` bounds the CANDIDATE work: fixed p means 2^p
  *     buckets per table, so bucket population grows N/2^p and the
  *     within-bucket pair scan O(N²/2^p) — the q80 fixed-nlist story
  *     at the LSH site. p must grow ~log₂ N to hold bucket
  *     population (and with it per-item candidate work) constant.
  *
  * Run: sbt "runMain graft.tools.RhpScaleProbe <sfDir> <threshold>
  *   <numPlanes> [numTables] [runs]"
  */
object RhpScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: RhpScaleProbe <sfDir> <threshold> <numPlanes> [numTables] [runs]")
    val dir = args(0)
    val threshold = args(1).toDouble
    val numPlanes = args(2).toInt
    val numTables = if (args.length > 3) args(3).toInt else 4
    val runs = if (args.length > 4) args(4).toInt else 3
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.Measure.force(
        graft.operators.SimilaritySearch.cosineNearDupPairsPortable(
          graft.Tables(spark, dir).embeddings, threshold = threshold,
          numPlanes = numPlanes, numTables = numTables)
          .orderBy(col("a_id"), col("b_id")))
      val elapsed = (System.nanoTime() - t0) / 1e9
      graft.CacheScope.releaseAll(blocking = true)
      println(f"[probe] rhp t=$threshold p=$numPlanes tab=$numTables " +
        f"run $i: $n rows in $elapsed%.2fs")
    }
    spark.stop()
  }
}
