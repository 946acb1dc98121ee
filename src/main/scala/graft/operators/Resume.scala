package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's incremental-computation story (SURVEY §2.3, §2.7):
  * resume anti-joins against completed-keys artifacts, journal reads,
  * priority unions, and refuse-to-build audit set-ops.
  *
  * Scale: all of these are key-partitioned joins/aggregations; the
  * completed set is usually ≪ worklist, so Spark will broadcast it
  * (AQE) — at 100 TB the anti-join costs one scan of each side.
  *
  * Reference: extract.py:47-73,180-181; loudness_measure.py:146-188;
  * hls_runner.py:152-166; extract_plan.py:245-343.
  */
object Resume {

  /** worklist ∖ completed on `keys` — the single most common operator
    * in the reference. */
  def pending(worklist: DataFrame, completed: DataFrame,
      keys: Seq[String]): DataFrame =
    worklist.join(completed.select(keys.map(col): _*).distinct(),
      keys, "left_anti")

  /** Journal read: keep keys whose latest status is `doneStatus`
    * (a failed-then-completed key counts as completed; duplicate
    * completed lines collapse). Reference: extract.py:47-61. */
  def completedKeys(journal: DataFrame, keyCol: String, statusCol: String,
      doneStatus: String = "completed"): DataFrame =
    journal.filter(col(statusCol) === doneStatus)
      .select(col(keyCol)).distinct()

  /** Union N shard journals / completed lists (hls_runner globs every
    * shard's list — §2.3). */
  def unionCompleted(shards: Seq[DataFrame], keyCol: String): DataFrame = {
    require(shards.nonEmpty,
      "unionCompleted: no shard journals found — a first run (nothing " +
        "completed yet) should skip the resume filter, not union zero frames")
    shards.map(_.select(col(keyCol))).reduce(_.unionByName(_)).distinct()
  }

  /** First-writer-wins merge of measurement generations: rows from
    * earlier `sources` win on key collision; ties within a source
    * broken by `tieBreak` ascending. Reference: legacy+new loudness
    * artifact merge, loudness_measure.py:146-188. */
  def priorityMerge(sources: Seq[DataFrame], keys: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(sources.nonEmpty,
      "priorityMerge: no source generations to merge")
    val tagged = sources.zipWithIndex
      .map { case (df, i) => df.withColumn("__prio", lit(i)) }
      .reduce(_.unionByName(_))
    val order = (col("__prio").asc +: tieBreak.map(col(_).asc))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__prio")
  }

  /** Refuse-to-build audit: rows of `claimed` absent from `honoured`
    * (extract_plan's orphaned-Keep / unaccounted-roots checks). The
    * caller asserts emptiness before running effectful stages. */
  def orphans(claimed: DataFrame, honoured: DataFrame,
      keys: Seq[String]): DataFrame =
    claimed.select(keys.map(col): _*)
      .except(honoured.select(keys.map(col): _*))

  /** Assert an audit DataFrame is empty; returns the violating rows
    * in the error. Reference: extract_plan.py:245-258 abort. */
  def assertEmpty(audit: DataFrame, what: String): Unit = {
    val bad = audit.limit(20).collect()
    require(bad.isEmpty,
      s"refuse-to-build: $what has ${bad.length}+ violations, e.g. ${bad.take(3).mkString("; ")}")
  }
}
