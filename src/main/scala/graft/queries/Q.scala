package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A named query: Spark implementation + (optionally) an equivalent
  * ANSI SQL statement the driver runs in DuckDB over the same parquet
  * tables. Column names/order must match between the two (the compare
  * sorts columns by name before hashing values).
  *
  * `headline` marks queries timed by Bench.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

/** Cross-engine float parity helpers.
  *
  * DuckDB and Spark sum doubles in different orders, so raw double
  * aggregates hash-mismatch in the last ulps. The fix: do the math in
  * exact DECIMAL (both engines implement exact decimal arithmetic),
  * then cast the exact result to DOUBLE — identical input decimal →
  * identical nearest double → identical bits. Source columns hold
  * money-like 2-decimal values, so DECIMAL(18,2) casts are lossless.
  */
object Num {
  /** Money-ish column → exact decimal. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Higher-scale exact decimal (e.g. event values, embedding floats). */
  def dec9(c: Column): Column = c.cast("double").cast(DecimalType(28, 9))
  /** Exact decimal sum rendered as a bit-stable double. */
  def dsum(c: Column): Column = sum(c).cast("double")
}
