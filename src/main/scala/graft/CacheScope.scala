package graft

import org.apache.spark.sql.DataFrame

/** Lifecycle registry for operator-internal `persist()` calls.
  *
  * Several operators (MinHash-LSH, winnowing, group similarity, the A3
  * gap-fill query) persist an intermediate relation that every
  * downstream branch of their plan re-reads. The operator cannot
  * unpersist it itself — the returned DataFrame is lazy, so the cache
  * must survive until the CALLER runs its terminal action. Round 2
  * leaked these: a long-lived session accumulated cached blocks until
  * LRU eviction.
  *
  * Contract: operators register intermediates via [[track]]; whoever
  * owns the session calls [[releaseAll]] after the consuming action
  * (Verify and Bench do, after every query's sink/count — so the gate
  * loop holds at most one query's cache at a time). Library users
  * embedding operators in a longer pipeline call it at their own
  * checkpoint boundaries.
  */
object CacheScope {
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` and register it for later release. */
  def track(df: DataFrame): DataFrame = synchronized {
    val p = df.persist()
    tracked += p
    p
  }

  /** Unpersist everything registered since the last release. */
  def releaseAll(blocking: Boolean = false): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking))
    tracked.clear()
  }

  /** Number of currently tracked (possibly cached) relations. */
  def trackedCount: Int = synchronized(tracked.size)
}
