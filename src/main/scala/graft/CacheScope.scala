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
  * owns the session releases them after the consuming action. Two
  * release granularities:
  *
  *   - [[releaseAll]] — drop everything tracked. What Verify/Bench do
  *     after every query's sink/count (the gate loop holds at most one
  *     query's cache at a time).
  *   - [[open]] + [[releaseSince]] — a scope token for callers sharing
  *     the session with other in-flight work: only intermediates
  *     registered after `open()` are dropped, so one pipeline's
  *     release cannot evict another's cache mid-flight.
  *
  * The registry is a single ordered list guarded by this object's
  * monitor; scopes are positions in that list, so interleaved scopes
  * from concurrent threads release conservatively (a later `open` is
  * never invalidated by an earlier scope's release — release clears
  * entries, it does not shift positions).
  */
object CacheScope {
  // entries become null when released; positions stay stable so open()
  // tokens from other scopes survive any interleaving
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Opaque scope token — everything tracked after [[open]] belongs to
    * the scope and is dropped by [[releaseSince]]. */
  final case class Token private[CacheScope] (from: Int)

  /** Persist `df` and register it for later release. */
  def track(df: DataFrame): DataFrame = synchronized {
    val p = df.persist()
    tracked += p
    p
  }

  /** Open a scope: subsequent [[track]] calls belong to it. */
  def open(): Token = synchronized(Token(tracked.size))

  /** Unpersist only the intermediates tracked since `token`. */
  def releaseSince(token: Token, blocking: Boolean = false): Unit = synchronized {
    var i = math.max(token.from, 0)
    while (i < tracked.size) {
      val df = tracked(i)
      if (df != null) { df.unpersist(blocking); tracked(i) = null }
      i += 1
    }
    // drop the released tail so the buffer doesn't grow unboundedly
    while (tracked.nonEmpty && tracked.last == null) tracked.dropRightInPlace(1)
  }

  /** Unpersist everything registered since the last release. */
  def releaseAll(blocking: Boolean = false): Unit = synchronized {
    tracked.foreach(df => if (df != null) df.unpersist(blocking))
    tracked.clear()
  }

  /** Number of currently tracked (possibly cached) relations. */
  def trackedCount: Int = synchronized(tracked.count(_ != null))
}
