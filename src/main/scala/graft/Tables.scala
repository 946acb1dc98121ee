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
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark cannot read
    * natively; read it as a long (nanos since epoch) and floor to a
    * microsecond timestamp — exactly how DuckDB truncates ns→µs, so
    * oracle ordering/values agree.
    */
  def events: DataFrame = {
    // nanosAsLong is only consulted during schema inference (the
    // eager spark.read call below), so set it just for that window
    // and restore — an accessor must not permanently mutate shared
    // session conf.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try t("events").withColumn("ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
