package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Relational + shard-file sinks (SURVEY S10, S12, S13, S14).
  *
  * Thin, convention-bearing wrappers: the conventions ARE the content
  * (batch sizes, truncate-vs-drop, deterministic shard layout) —
  * the lessons the reference learned the hard way (500-entity EF
  * batches with tracker clears, TRUNCATE+COPY in one transaction,
  * tmp+rename shard resume).
  *
  * No database runs in this container; JDBC paths are exercised in
  * production deployments (Spark's JDBC sink is itself well-tested —
  * these wrappers pin OUR defaults).
  */
object Sinks {

  /** S10/S13/S14: JDBC table write. `overwrite=true` maps to the
    * reference's TRUNCATE + bulk COPY (truncate keeps indexes/FKs,
    * matching SimilarTrackProcessor.cs:39-90); batchsize mirrors the
    * EF 500-row batching lesson (AlbumTrackMetadataProcessor.cs:12).
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties, overwrite: Boolean = false,
      batchSize: Int = 500): Unit =
    df.write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.Append)
      .option("truncate", overwrite.toString)
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, props)

  /** JDBC read with partitioned parallelism — the scale path for
    * pulling a large scrape-state table (S10). */
  def readJdbc(spark: org.apache.spark.sql.SparkSession, url: String,
      table: String, props: java.util.Properties,
      partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read
    partitionColumn match {
      case Some((colName, lo, hi, n)) => base
        .option("partitionColumn", colName)
        .option("lowerBound", lo.toString)
        .option("upperBound", hi.toString)
        .option("numPartitions", n.toString)
        .jdbc(url, table, props)
      case None => base.jdbc(url, table, props)
    }
  }

  /** S12: sharded CSV sink — deterministic shard key, Spark's task
    * commit protocol supplying the reference's tmp+rename atomicity
    * and resume (precompute_similar_tracks.py:244-275). */
  def writeCsvShards(df: DataFrame, shardCol: String, numShards: Int,
      outDir: String): Unit =
    df.repartition(numShards, org.apache.spark.sql.functions.col(shardCol))
      .write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .csv(outDir)

  /** Training-shard writer — the LAST stage of the curation pipeline
    * (dedup → sample → pack → SHARD): writes parquet partitioned into
    * `numShards` deterministic shards with a deterministic,
    * seed-free global shuffle INSIDE each shard.
    *
    * Both decisions are pure functions of the id (same md5-order
    * discipline as `operators.Sampling`):
    *   - shard  = first hex nibbles of md5(id) → uniform, stable
    *     under reruns/retries/cluster size — a resumed job rewrites
    *     byte-identical shards instead of reshuffling the corpus;
    *   - order  = md5(id) within the shard → the "shuffled" read
    *     order LLM training wants, reproducible for an exact rerun
    *     and auditable by any engine with md5.
    *
    * One repartition on the shard key + an in-partition sort — no
    * global sort, no sample-based range exchange.
    *
    * The shard assignment itself ([[shardOf]]: first 4 md5 hex chars
    * = 16 uniform bits, mod the shard count) is shared with the
    * streaming ingest twin, so a continuously-written feed lands
    * every row in the SAME shard a batch rewrite would.
    */
  def shardOf(idCol: String, numShards: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(numShards > 0 && numShards <= 0x10000,
      s"numShards must be in (0, 65536]: $numShards")
    conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("int") % numShards
  }

  def writeTrainingShards(df: DataFrame, idCol: String, numShards: Int,
      outDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val key = md5(col(idCol).cast("string"))
    // sort leads with the shard column: the file writer requires rows
    // grouped by partition columns and would otherwise inject its own
    // (unstable) sort, destroying the md5 order
    df.withColumn("shard", shardOf(idCol, numShards))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), key, col(idCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(outDir)
  }

  /** Bucketed catalog table: pre-hash-partitions + sorts the data on
    * the join key at WRITE time, so repeated fact⋈fact joins on that
    * key run with ZERO exchanges — the co-located-join layout a
    * 100 TB deployment uses for its hottest join keys (SCALE.md;
    * SortMergeJoin reads both sides' buckets directly).
    * SinksSpec asserts the exchange-free plan. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
