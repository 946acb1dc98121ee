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
  *
  * Known trade: the guard keys on partition COUNT, not balance — an
  * input that is wide-but-skewed (one huge split among many small
  * ones) passes through unbalanced, where the old unconditional
  * repartition would have round-robined it. That case is AQE's to
  * fix at the next exchange; re-introducing an unconditional
  * full-data shuffle to pre-balance every input costs more than it
  * saves at either scale.
  */
object Par {
  def ensureWide(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (planWidth(df) < target) df.repartition(target) else df
  }

  /** Partition count of the NON-adaptive physical plan. `df.rdd`
    * would answer the same question, but under AQE it finalizes the
    * adaptive plan — which EXECUTES every upstream shuffle stage just
    * to read a count, and the caller's real action then re-runs them.
    * The initial sparkPlan builds its RDD DAG lazily (no jobs), and
    * its pre-coalescing width only ever over-estimates — erring
    * toward NOT repartitioning, the safe side of this guard. Falls
    * back to the width the session would default a shuffle to if the
    * initial plan cannot be materialized as an RDD (never observed;
    * defensive).
    */
  private def planWidth(df: DataFrame): Int =
    try df.queryExecution.sparkPlan.execute().getNumPartitions
    catch { case _: Exception =>
      df.sparkSession.sessionState.conf.numShufflePartitions
    }
}
