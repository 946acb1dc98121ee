package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{BloomExpressions, BloomRuntime}

/** Bloom filter artifact + probe: the membership sketch behind
  * [[Dedup.admitNewExact]] (q59). Pins the three properties the
  * design depends on — NO false negatives (exactness of the routed
  * result), bounded false-positive rate (cost of the verify join),
  * and bit-determinism under partitioning (the artifact is
  * content-addressed) — plus the operator's equivalence to a plain
  * anti-join.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def buildBloom(keys: Seq[String], numBits: Long,
      numHashes: Int): Array[Byte] =
    keys.toDF("k")
      .agg(BloomExpressions.bloomAgg(col("k"), numBits, numHashes))
      .head.getAs[Array[Byte]](0)

  test("no false negatives: every inserted key probes true") {
    val keys = (0 until 2000).map(i => s"key-$i")
    val bloom = buildBloom(keys, 1L << 15, 7)
    // probe through the expression (the codegen path)
    val misses = keys.toDF("k")
      .filter(!BloomExpressions.bloomMightContain(lit(bloom), col("k")))
      .count()
    assert(misses === 0L)
    // and through the interpreted runtime
    assert(keys.forall(k => BloomRuntime.mightContainUTF8(bloom,
      org.apache.spark.unsafe.types.UTF8String.fromString(k))))
  }

  test("false-positive rate stays near theoretical") {
    val n = 5000
    val m = 1L << 16 // 13.1 bits/key
    val k = 7
    val bloom = buildBloom((0 until n).map(i => s"present-$i"), m, k)
    val probes = (0 until n).map(i => s"absent-$i")
    val fp = probes.toDF("k")
      .filter(BloomExpressions.bloomMightContain(lit(bloom), col("k")))
      .count()
    val theoretical = math.pow(1.0 - math.exp(-k.toDouble * n / m), k)
    // generous 3x band — this is a sanity pin, not a statistics test
    assert(fp.toDouble / n < theoretical * 3 + 0.002,
      s"fpr ${fp.toDouble / n} vs theoretical $theoretical")
  }

  test("artifact is bit-identical under any partitioning (OR-merge)") {
    val keys = (0 until 3000).map(i => s"key-$i")
    val a = keys.toDF("k").repartition(1)
      .agg(BloomExpressions.bloomAgg(col("k"), 1L << 14, 5))
      .head.getAs[Array[Byte]](0)
    val b = keys.toDF("k").repartition(7)
      .agg(BloomExpressions.bloomAgg(col("k"), 1L << 14, 5))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }

  test("long and binary keys round-trip through build and probe") {
    val longs = (0L until 1000L).toDF("k")
    val bloomL = longs.agg(BloomExpressions.bloomAgg(col("k"), 1L << 14, 7))
      .head.getAs[Array[Byte]](0)
    assert(longs.filter(!BloomExpressions.bloomMightContain(lit(bloomL),
      col("k"))).count() === 0L)
    val bins = (0 until 500).map(i => s"b$i").toDF("s")
      .select(unhex(md5(col("s"))).as("k"))
    val bloomB = bins.agg(BloomExpressions.bloomAgg(col("k"), 1L << 14, 7))
      .head.getAs[Array[Byte]](0)
    assert(bins.filter(!BloomExpressions.bloomMightContain(lit(bloomB),
      col("k"))).count() === 0L)
  }

  test("empty build side yields an all-reject bloom") {
    val bloom = buildBloom(Nil, 1L << 10, 3)
    assert(!BloomRuntime.mightContainUTF8(bloom,
      org.apache.spark.unsafe.types.UTF8String.fromString("anything")))
  }

  test("SQL surface: graft_bloom_agg / graft_bloom_might_contain") {
    GraftSql.registerAll(spark, "/root/testdata/sf0.001")
    (0 until 100).map(i => s"k$i").toDF("k").createOrReplaceTempView("bkeys")
    val row = spark.sql(
      """SELECT count(*) AS misses FROM bkeys, (
        |  SELECT graft_bloom_agg(k, 16384, 5) AS bloom FROM bkeys)
        |WHERE NOT graft_bloom_might_contain(bloom, k)""".stripMargin)
      .head
    assert(row.getAs[Long]("misses") === 0L)
  }

  // ---- admitNewExact: the routed-but-exact admission operator ----

  private lazy val corpus = Seq(
    (10L, "alpha beta gamma delta content one"),
    (11L, "epsilon zeta eta theta content two"),
    (12L, "iota kappa lambda mu content three"))
    .toDF("doc_id", "text")

  test("admitNewExact: re-crawls rejected, new admitted, batch dups elect min") {
    val batch = Seq(
      (100L, "alpha beta  GAMMA delta content one"), // re-crawl (normalizes equal)
      (101L, "totally new page about spark plans"),  // new
      (102L, "shared batch boilerplate"),            // new, dup of 103
      (103L, "shared  batch boilerplate"),           // in-batch dup
      (104L, "epsilon zeta eta theta content two"))  // re-crawl
      .toDF("doc_id", "text")
    val admitted = Dedup.admitNewExact(batch, corpus, "doc_id", "text",
        numBits = 1L << 12, numHashes = 5)
      .select("doc_id").as[Long].collect().sorted
    assert(admitted.toSeq === Seq(101L, 102L))
  }

  test("admitNewExact equals the plain anti-join election on random data") {
    val rnd = new scala.util.Random(7)
    val words = Vector("a", "b", "c", "d", "e")
    def doc() = Seq.fill(4)(words(rnd.nextInt(words.size))).mkString(" ")
    val corpusR = (0L until 150L).map(i => (i, doc())).toDF("doc_id", "text")
    val batchR = (1000L until 1200L).map(i => (i, doc())).toDF("doc_id", "text")
    val got = Dedup.admitNewExact(batchR, corpusR, "doc_id", "text",
        numBits = 1L << 10, numHashes = 4) // small bloom → many suspects
      .select("doc_id").as[Long].collect().sorted
    val fpOf = graft.functions.TextFunctions.fingerprint(col("text"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("doc_id"))
    val want = batchR.withColumn("fp", fpOf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(corpusR.select(fpOf.as("fp")), Seq("fp"), "left_anti")
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq === want.toSeq)
  }
}
