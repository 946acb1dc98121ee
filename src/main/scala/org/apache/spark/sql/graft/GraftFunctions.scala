package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Single inventory of every graft native function exposed to SQL —
  * the one list behind BOTH registration paths:
  *
  *   - [[register]] (used by [[graft.GraftSql.registerAll]]): temp
  *     functions on an existing session, the notebook/test path;
  *   - [[graft.GraftExtensions]]: a `SparkSessionExtensions` injector
  *     for `spark.sql.extensions=graft.GraftExtensions`, the
  *     library-deployment path — every session of the cluster gets the
  *     functions at build time, with no imperative setup call (and
  *     they survive `session.newSession()`, which temp functions
  *     don't).
  *
  * Each entry is (name, builder). Integer parameters (k, numHashes,
  * band, window, …) must be literals — they size static buffers inside
  * the expressions.
  */
object GraftFunctions {

  private def litInt(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  private def litLong(e: Expression): Long =
    e.eval().asInstanceOf[Number].longValue()

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> ((exprs: Seq[Expression]) =>
      CosineSimilarity(exprs(0), exprs(1))),
    "graft_dot" -> ((exprs: Seq[Expression]) =>
      DotProduct(exprs(0), exprs(1))),
    "graft_sorted_intersect_count" -> ((exprs: Seq[Expression]) =>
      SortedArrayIntersectCount(exprs(0), exprs(1))),
    "graft_winnow_mins" -> ((exprs: Seq[Expression]) =>
      WinnowedMinHashes(exprs(0), litInt(exprs(1)))),
    "graft_simhash64" -> ((exprs: Seq[Expression]) =>
      SimHash64(exprs.head)),
    "graft_md5_simhash" -> ((exprs: Seq[Expression]) =>
      Md5SimHash60(exprs.head)),
    "graft_minhash" -> ((exprs: Seq[Expression]) =>
      MinHashSignature(exprs(0), litInt(exprs(1)))),
    "graft_md5_minhash" -> ((exprs: Seq[Expression]) =>
      Md5MinHashes(exprs(0), litInt(exprs(1)))),
    "graft_decimal_dot" -> ((exprs: Seq[Expression]) =>
      DecimalScaledDot(exprs(0), exprs(1))),
    "graft_rhp_sig" -> ((exprs: Seq[Expression]) =>
      RandomHyperplaneSignature(exprs(0), litInt(exprs(1)), litInt(exprs(2)))),
    "graft_top_k" -> ((exprs: Seq[Expression]) =>
      TopKByScore(exprs(0), exprs(1), litInt(exprs(2))).toAggregateExpression()),
    "graft_bounded_collect" -> ((exprs: Seq[Expression]) =>
      BoundedSortedCollect(exprs(0), litInt(exprs(1))).toAggregateExpression()),
    "graft_frequent_keys" -> ((exprs: Seq[Expression]) =>
      FrequentKeys(exprs(0), litInt(exprs(1))).toAggregateExpression()),
    "graft_bloom_agg" -> ((exprs: Seq[Expression]) =>
      BloomFilterBuild(exprs(0), litLong(exprs(1)), litInt(exprs(2)))
        .toAggregateExpression()),
    "graft_bloom_might_contain" -> ((exprs: Seq[Expression]) =>
      BloomMightContain(exprs(0), exprs(1))))

  /** Temp-function registration on a live session. */
  def register(spark: SparkSession): Unit = all.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
  }

  /** The injectable form for [[org.apache.spark.sql.SparkSessionExtensions]]. */
  def injectable: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    all.map { case (name, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder)
    }
}
