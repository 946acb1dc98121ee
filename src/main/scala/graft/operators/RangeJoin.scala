package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: match point rows to interval
  * rows with `start ≤ point ≤ end` (plus optional equi-keys).
  *
  * Spark-first formulation: Spark plans a bare inequality join as
  * BroadcastNestedLoopJoin or a cartesian — O(|points|·|intervals|)
  * comparisons. This operator BUCKETS time instead: each interval
  * explodes into the fixed-width buckets it covers, points map to
  * their single bucket, and the match becomes a hash-partitioned
  * EQUI-join on (keys…, bucket) followed by the exact containment
  * filter. With bucketWidth chosen near the typical interval length,
  * each interval lands in O(1) buckets and the join degenerates to the
  * per-bucket density — the standard distributed interval-join shape
  * (and what AQE's skew splitting can re-balance, which it cannot do
  * for a nested-loop join).
  *
  * Choose `bucketMicros` ≈ the P95 interval length: too small explodes
  * interval replication, too large reverts to per-bucket cross
  * products. Degenerate giant intervals (≫ bucket) should be routed
  * to a broadcast side instead — at 100 TB those are the "always-on"
  * rows, bounded and few.
  */
object RangeJoin {

  /** Inner range join of `points` (timestamp at `pointTs`) to
    * `intervals` ([startCol, endCol] inclusive), both optionally
    * pre-keyed by `keys` (same names both sides). Interval payload
    * columns must not collide with point column names. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointTs: String, startCol: String, endCol: String,
      intervalCols: Seq[String], bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    val b = lit(bucketMicros)
    def bucketOf(c: Column): Column = floor(unix_micros(c) / b)
    val ivals = intervals.select((keys.map(col) :+ col(startCol) :+ col(endCol)) ++
        intervalCols.map(col): _*)
      // inverted/null intervals (end < start — a corrupt or zeroed end
      // timestamp) match no point anyway, but sequence(start, stop)
      // generates DESCENDING for start > stop: one corrupt row would
      // materialize a bucket array spanning the whole inverted range
      // (executor OOM at fine buckets) before the containment filter
      // discards every produced row — drop them up front
      .filter(col(startCol) <= col(endCol))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    val pts = points.withColumn("__bucket", bucketOf(col(pointTs)))
    pts.join(ivals, keys :+ "__bucket")
      .filter(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__bucket")
  }
}
