package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-heavy projections (shingling, hash
  * signatures, PQ encoding). A small corpus arrives as ONE scan
  * partition (a sub-128 MB parquet file is a single split), which
  * serializes the whole projection on one core of the box — measured
  * 4× on q72's salted-md5 signatures at sf0.1. At cluster scale the
  * same scan is already thousands of splits, and the unconditional
  * `repartition(defaultParallelism)` the round-4 operators used would
  * pay a pointless full-text exchange (and, worse, would COLLAPSE a
  * many-thousand-partition scan down to the core count). Widen only
  * when the scan is narrower than the session's parallelism: a no-op
  * at 100 TB, full-box utilization at bench scale.
  */
object Par {
  def ensureWide(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
