package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * One accessor per table; every query takes the sf directory as a
  * parameter so the same code runs at any scale factor. At 100 TB the
  * only change is the directory (and partition discovery); all
  * downstream plans are declarative so Catalyst re-plans per scale.
  */
final class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS). How Spark surfaces that
    * depends on the engine version: ≤4.0 with
    * `spark.sql.legacy.parquet.nanosAsLong=true` infers a LongType of
    * nanos-since-epoch; 4.1+ reads it natively as TIMESTAMP_NTZ with
    * ns→µs truncation (ignoring the legacy conf). Both paths must land
    * on the same micro-truncated TimestampType values — exactly how
    * DuckDB truncates ns→µs, so oracle ordering/values agree. We branch
    * on the INFERRED type rather than the Spark version so any future
    * inference change fails loudly (MatchError with the unexpected
    * type) instead of silently producing a mis-typed column.
    */
  def events: DataFrame = {
    // nanosAsLong is only consulted during schema inference (the eager
    // spark.read call below), so set it just for that window and
    // restore — an accessor must not permanently mutate shared session
    // conf. Harmless where the engine ignores it (4.1+).
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    val raw =
      try t("events")
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    Tables.eventsNormalizeTs(raw)
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)

  /** Normalize an events frame whose `ts` arrived as either
    * nanos-since-epoch LongType (legacy nanosAsLong inference) or
    * TIMESTAMP_NTZ (Spark 4.1+ native nanos read, already µs-truncated)
    * to a session-TZ TimestampType. The session TZ is pinned UTC
    * everywhere in this repo, so the NTZ cast is value-identical to the
    * long path bit-for-bit. Exposed for the loader spec, which feeds it
    * both shapes regardless of what the runtime engine infers.
    */
  private[graft] def eventsNormalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      // FLOOR division, not `div` (truncation toward zero): Spark
      // 4.1+'s native ns→µs read and DuckDB both floor, so a
      // pre-epoch nanos value like -1500 ns must land on -2 µs on
      // this path too. pmod(ts, 1000) ≥ 0 makes (ts - pmod) the
      // largest 1000-multiple ≤ ts — exact floorDiv in pure integer
      // arithmetic.
      case LongType => raw.withColumn("ts",
        expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts inferred as unexpected type $other; expected nanos Long, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
}
