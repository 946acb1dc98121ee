package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions._

/** S10/S13/S14 exercised end-to-end against EMBEDDED Derby (the
  * derby jars ship with Spark itself) — the reference's end state is
  * a relational load (SimilarTrackProcessor.cs:39-90 TRUNCATE+COPY;
  * AlbumTrackMetadataProcessor.cs:12 500-row batches), so these paths
  * must be more than conventions.
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def props = new java.util.Properties()

  test("S13/S14 writeJdbc: create-on-append, overwrite-truncate, batchsize") {
    val df = (1 to 10).map(i => (i.toLong, s"name$i")).toDF("id", "name")
    Sinks.writeJdbc(df, url, "t_roundtrip", props, batchSize = 3)
    val back = Sinks.readJdbc(spark, url, "t_roundtrip", props)
    assert(back.count() === 10)
    assert(back.agg(sum("id")).head.getLong(0) === 55L)

    // overwrite maps to TRUNCATE + load (keeps the table object, the
    // reference's index/FK-preserving COPY semantics)
    val df2 = (11 to 15).map(i => (i.toLong, s"name$i")).toDF("id", "name")
    Sinks.writeJdbc(df2, url, "t_roundtrip", props, overwrite = true)
    val afterOverwrite = Sinks.readJdbc(spark, url, "t_roundtrip", props)
    assert(afterOverwrite.select("id").as[Long].collect().sorted.toSeq
      === (11L to 15L))

    // plain append accumulates
    Sinks.writeJdbc(df, url, "t_roundtrip", props)
    assert(Sinks.readJdbc(spark, url, "t_roundtrip", props).count() === 15)
  }

  test("bucketed tables join with zero exchanges (co-located join layout)") {
    // the in-memory catalog resets between JVMs but the warehouse dir
    // persists — clear both so reruns don't hit LOCATION_ALREADY_EXISTS
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, t)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      if (loc.exists()) rm(loc)
    }
    val orders = Tables(spark, "/root/testdata/sf0.001").orders
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables(spark, "/root/testdata/sf0.001").lineitem
      .select("l_orderkey", "l_quantity")
    Sinks.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Sinks.writeBucketed(lineitem, "b_lineitem", "l_orderkey", 4)
    // disable broadcast so the join would otherwise shuffle both sides
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected exchange in:\n$plan")
      assert(joined.count() === lineitem.count())
    }
  }

  test("bucketed survivor corpus: admission pair scan has ZERO corpus-side exchanges; result ≡ in-query path") {
    import graft.operators.Dedup
    // the q91 deployment claim, demonstrated (VERDICT r10 item 3):
    // store the deduplicated survivor set bucketBy(cell) and nightly
    // admission never moves the corpus — only the batch shuffles
    val t = "b_corpus_cells"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, t)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    if (loc.exists()) rm(loc)
    // the DedupSpec admission fixture: pairwise non-dup corpus (its
    // own survivor set), batch with planted rejects/admits
    def v(a: Double, b: Double, c: Double, d: Double) = Seq(a, b, c, d)
    val corpus = Seq(
      (1L, v(1.0, 0.05, 0.0, 0.0)),
      (2L, v(0.0, 1.0, 0.05, 0.0)),
      (3L, v(0.6, 0.6, 0.0, 0.1)))
      .toDF("vec_id", "embedding")
    val batch = Seq(
      (10L, v(1.0, 0.055, 0.0, 0.0)),
      (11L, v(0.0, 0.05, 1.0, 0.3)),
      (12L, v(0.0, 0.05, 1.0, 0.31)),
      (13L, v(0.0, 1.0, 0.5, 0.0)),
      (14L, v(1.0, 0.06, 0.001, 0.0)))
      .toDF("vec_id", "embedding")
    val m = graft.operators.KMeansPortable.trainModel(corpus, k = 2,
      iters = 2)
    Sinks.writeBucketed(Dedup.assignVectors(corpus, m.centroids),
      t, "cell", 4)
    // result parity: the bucketed read is a storage layout, not a
    // semantics change
    val got = Dedup.admitIncrementalSemanticAssigned(batch,
        spark.table(t), m.centroids, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    val raw = Dedup.admitIncrementalSemantic(batch, corpus, m.centroids,
        threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(got === raw)
    assert(got === Set(11L, 13L))
    // plan assertion: with broadcast off (so the join would otherwise
    // shuffle BOTH sides) the new×corpus equi-join's corpus subtree
    // contains the bucketed scan and NO shuffle exchange — the
    // batch side carries every exchange
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
      val edges = Dedup.admissionEdges(
        Dedup.assignVectors(batch, m.centroids),
        spark.table(t), threshold = 0.95)
      def bucketed(p: SparkPlan): Boolean = p.collectFirst {
        case s: FileSourceScanExec if s.bucketedScan => s
      }.isDefined
      val plan = edges.queryExecution.executedPlan
      val shuffledJoins = plan.collect {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      val corpJoins = shuffledJoins.filter(j =>
        bucketed(j.left) || bucketed(j.right))
      assert(corpJoins.nonEmpty,
        s"expected a shuffled join over the bucketed corpus in:\n$plan")
      corpJoins.foreach { j =>
        val side = if (bucketed(j.left)) j.left else j.right
        val ex = side.collect { case e: ShuffleExchangeExec => e }
        assert(ex.isEmpty, s"corpus-side exchange:\n$side")
      }
      // the measured before/after for SCALE.md: the in-query corpus
      // path exchanges the corpus (ensureWide + join keying), the
      // bucketed path does not — assert the count drop mechanically
      val rawEdges = Dedup.admissionEdges(
        Dedup.assignVectors(batch, m.centroids),
        Dedup.assignVectors(corpus, m.centroids), threshold = 0.95)
      def nEx(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }.size
      assert(nEx(edges) < nEx(rawEdges),
        s"bucketed=${nEx(edges)} raw=${nEx(rawEdges)}")
      info(s"pair-scan exchanges: bucketed corpus ${nEx(edges)}, " +
        s"in-query corpus ${nEx(rawEdges)}")
    }
  }

  test("S12 CSV shard sink: round trip, shard count, resume-safe overwrite") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val df = (1 to 200).map(i => (i.toLong, i % 8, s"name-$i"))
      .toDF("id", "shard", "name")
    Sinks.writeCsvShards(df, "shard", 8, out)
    // shard layout: at most one data file per shard partition
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(files.length <= 8 && files.nonEmpty)
    // round trip preserves every row and the schema's column names
    val back = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(out)
    assert(back.columns.sorted.toSeq === Seq("id", "name", "shard"))
    assert(back.count() === 200)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      === (1 to 200).map(_.toLong).sum)
    // resume safety: re-running the sink (the reference's tmp+rename
    // overwrite) replaces, never duplicates or appends
    val half = df.filter(col("id") <= 100)
    Sinks.writeCsvShards(half, "shard", 8, out)
    val again = spark.read.option("header", "true").csv(out)
    assert(again.count() === 100)
  }

  test("S10 partitioned JDBC read splits the scan without losing rows") {
    val df = (1 to 100).map(i => (i.toLong, i * 2)).toDF("id", "v")
    Sinks.writeJdbc(df, url, "t_part", props)
    val back = Sinks.readJdbc(spark, url, "t_part", props,
      partitionColumn = Some(("id", 1L, 100L, 4)))
    assert(back.rdd.getNumPartitions === 4)
    assert(back.count() === 100)
    assert(back.agg(sum("v")).head.getLong(0) === 10100L)
  }

  test("training shards: deterministic assignment, md5 order, stable rewrite") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val df = (0L until 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    Sinks.writeTrainingShards(df, "doc_id", numShards = 8, out)
    val back = spark.read.parquet(out)
    // every row exactly once, shard matches the md5-nibble formula
    assert(back.count() === 500)
    val mismatch = back.withColumn("expect",
      conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 8)
      .filter(col("shard") =!= col("expect")).count()
    assert(mismatch === 0)
    // within a shard, rows are in md5(id) order (the deterministic
    // training shuffle) — parquet preserves row order per file
    val shard0 = spark.read.parquet(s"$out/shard=0")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val expected = shard0.sortBy(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(shard0 === expected)
    // rerun = identical shard contents (resume/rerun stability)
    Sinks.writeTrainingShards(df, "doc_id", numShards = 8, out)
    val again = spark.read.parquet(s"$out/shard=0")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(again === shard0)
  }
}
