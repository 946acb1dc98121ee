package graft

import graft.domain.{CatalogExtract, FuzzyMatch, MediaPlan}
import org.apache.spark.sql.functions._

/** Property tests for the parsers (SURVEY §5 implication (c)):
  * invariants over generated inputs. Hand-rolled seeded generation
  * (the scalatest↔scalacheck bridge isn't in the offline cache), so
  * runs are deterministic.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val alphabet =
    "abcXYZ019[]{}-. 　例大祭東方！？".toCharArray

  private def weird(maxLen: Int = 24): String =
    Array.fill(rnd.nextInt(maxLen))(alphabet(rnd.nextInt(alphabet.length)))
      .mkString

  test("bracketContents never throws on arbitrary bracket soup (200 cases)") {
    val inputs = Seq.fill(200)(weird())
    val got = inputs.toDF("s")
      .select(CatalogExtract.bracketContents($"s")).as[Seq[String]].collect()
    // every extracted content came from between a matched open/close
    got.flatten.foreach { c =>
      assert(!c.contains("]") || c.contains("{"),
        s"unbalanced content '$c'")
    }
    assert(got.length === 200)
  }

  test("levenshtein ratio: symmetry, identity, bounds (300 pairs)") {
    (1 to 300).foreach { _ =>
      val (a, b) = (weird(), weird())
      val r1 = FuzzyMatch.ratioScala(a, b)
      assert(math.abs(r1 - FuzzyMatch.ratioScala(b, a)) < 1e-9)
      assert(r1 >= 0.0 && r1 <= 100.0)
      assert(FuzzyMatch.ratioScala(a, a) === 100.0)
    }
  }

  test("hungarian: valid injective assignment, never worse than greedy (100 matrices)") {
    (1 to 100).foreach { _ =>
      val n = 1 + rnd.nextInt(6)
      val m = n + rnd.nextInt(3)
      val cost = Array.fill(n, m)(rnd.nextDouble() * 100)
      val a = FuzzyMatch.hungarianMin(cost)
      assert(a.distinct.length === a.length)
      assert(a.forall(j => j >= 0 && j < m))
      val total = a.zipWithIndex.map { case (j, i) => cost(i)(j) }.sum
      val taken = scala.collection.mutable.Set.empty[Int]
      val greedy = cost.map { row =>
        val j = row.indices.filterNot(taken).minBy(row)
        taken += j; row(j)
      }.sum
      assert(total <= greedy + 1e-6)
    }
  }

  test("ISO-8601 durations round-trip through java.time (100 whole-second cases)") {
    val secs = Seq.fill(100)(rnd.nextLong(100000L).abs)
    val iso = secs.map(_.toDouble).toDF("s")
      .select(MediaPlan.secondsToIso8601($"s")).as[String].collect()
    secs.zip(iso).foreach { case (s, i) =>
      assert(java.time.Duration.parse(i).getSeconds === s, s"for $s got $i")
    }
  }

  test("shard index: total, stable, in range across shard counts") {
    val keys = Seq.fill(100)(weird(16))
    Seq(1, 2, 7, 32).foreach { nShards =>
      val got = keys.toDF("k")
        .select(MediaPlan.shardIndex($"k", nShards)).as[Int].collect()
      val again = keys.toDF("k")
        .select(MediaPlan.shardIndex($"k", nShards)).as[Int].collect()
      assert(got.toSeq === again.toSeq)
      assert(got.forall(s => s >= 0 && s < nShards))
    }
  }

  test("partialDate output is always a prefix-valid date or empty (200 cases)") {
    val inputs = Seq.fill(200)(weird())
    val got = inputs.toDF("s")
      .withColumn("br", CatalogExtract.bracketContents($"s"))
      .select(CatalogExtract.partialDate($"s", $"br")).as[String].collect()
    got.foreach { d =>
      assert(d == "" ||
        d.matches("\\d{4}(\\.(\\d{2}|xx))?(\\.(\\d{2}|xx))?"), s"'$d'")
    }
  }
  test("sampling laws: nestedness, monotone size, rate bounds (12 random rate pairs)") {
    import graft.operators.Sampling
    val ids = (0L until 2000L).toDF("id")
    val all = ids.select("id").as[Long].collect().toSet
    (1 to 12).foreach { _ =>
      val r1 = rnd.nextDouble() * 0.98
      val r2 = r1 + rnd.nextDouble() * (0.99 - r1)
      val s1 = Sampling.deterministicSample(ids, "id", r1)
        .select("id").as[Long].collect().toSet
      val s2 = Sampling.deterministicSample(ids, "id", r2)
        .select("id").as[Long].collect().toSet
      // nested: the lower-rate sample is always inside the higher-rate
      assert(s1.subsetOf(s2), s"nestedness broken at $r1 <= $r2")
      assert(s2.subsetOf(all))
      // binomial bound: ±5 sigma around n·r
      def within(s: Set[Long], r: Double): Unit = {
        val sigma = math.sqrt(2000 * r * (1 - r)).max(1.0)
        assert(math.abs(s.size - 2000 * r) <= 5 * sigma + 1,
          s"rate $r gave ${s.size}/2000")
      }
      within(s1, r1); within(s2, r2)
    }
  }

  test("mixtureRebalance: proportions exact to integer flooring (20 random targets)") {
    import graft.operators.Sampling
    (1 to 20).foreach { _ =>
      val sizes = Seq("a" -> (50 + rnd.nextInt(400)),
        "b" -> (50 + rnd.nextInt(400)), "c" -> (50 + rnd.nextInt(400)))
      val df = sizes.flatMap { case (d, n) =>
        (0 until n).map(i => (d.hashCode.toLong * 100000 + i, d))
      }.toDF("id", "dom")
      val targets = Map("a" -> (1 + rnd.nextInt(4)),
        "b" -> (1 + rnd.nextInt(4)), "c" -> (1 + rnd.nextInt(4)))
      val denom = targets.values.sum
      val out = Sampling.mixtureRebalance(df, "dom", targets, "id")
        .groupBy("dom").count().as[(String, Long)].collect().toMap
      val t = sizes.map { case (d, n) => n.toLong * denom / targets(d) }.min
      targets.foreach { case (d, num) =>
        assert(out.getOrElse(d, 0L) === num.toLong * t / denom,
          s"domain $d off: targets=$targets sizes=$sizes got=$out")
      }
    }
  }

  test("piiRedact: idempotent, leaves no taggable span (150 generated texts)") {
    import graft.functions.TextFunctions._
    // fragment semantics, asserted exactly below: 'not@an' (no TLD)
    // and '55-0100' (2-digit prefix) are true near-misses that
    // survive verbatim; '1.2.3.4.5' is PARTIALLY redacted ('<IP>.5' —
    // the pattern takes the leftmost four octets) and
    // '999.999.999.999' fully (the pattern is shape-level, not
    // value-level — both are documented pattern semantics, not gaps)
    val frags = Vector("hello", "x9", "a@b.cc", "not@an", "10.1.2.3",
      "1.2.3.4.5", "555-0100", "55-0100", "user.name+t@ex-a.org",
      "999.999.999.999", "end.")
    val exact = Seq("not@an", "55-0100", "1.2.3.4.5", "999.999.999.999")
      .toDF("t").select(piiRedact($"t")).as[String].collect()
    assert(exact(0) === "not@an")
    assert(exact(1) === "55-0100")
    assert(exact(2) === "<IP>.5")
    assert(exact(3) === "<IP>")
    val inputs = Seq.fill(150)(
      Seq.fill(1 + rnd.nextInt(8))(frags(rnd.nextInt(frags.length)))
        .mkString(" "))
    val got = inputs.toDF("t")
      .select(piiRedact($"t").as("r1"))
      .select($"r1", piiRedact($"r1").as("r2"),
        emailCount($"r1").as("e"), ipv4Count($"r1").as("i"),
        phoneCount($"r1").as("p"))
      .collect()
    got.foreach { r =>
      assert(r.getAs[String]("r1") === r.getAs[String]("r2"),
        "redaction not idempotent")
      assert(r.getAs[Int]("e") === 0 && r.getAs[Int]("i") === 0 &&
        r.getAs[Int]("p") === 0, s"taggable span survived: ${r.getAs[String]("r1")}")
    }
  }

  test("dedupSegments ≡ plain-Scala keep-first reference (8 random corpora)") {
    import graft.operators.Dedup
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    (1 to 8).foreach { _ =>
      val docs = (0L until (3 + rnd.nextInt(8)).toLong).map { d =>
        (d, Seq.fill(rnd.nextInt(7))(vocab(rnd.nextInt(vocab.size))))
      }
      val seen = scala.collection.mutable.Set[String]()
      val expected = docs.map { case (d, segs) =>
        val kept = segs.filter(s => seen.add(s))
        (d, segs.size.toLong, kept.size.toLong, kept.mkString(" "))
      }
      val got = Dedup.dedupSegments(docs.toDF("doc_id", "lines"),
          "doc_id", col("lines"))
        .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
      assert(got === expected)
    }
  }}

class GraftSqlSpec extends SparkSpec {
  test("registerAll exposes tables + native functions to spark.sql") {
    GraftSql.registerAll(spark, "/root/testdata/sf0.001")
    val n = spark.sql("SELECT count(*) FROM lineitem").collect()(0).getLong(0)
    assert(n > 0)
    val cube = spark.sql(
      """SELECT r_name, count(*) FROM region JOIN nation ON n_regionkey = r_regionkey
        |GROUP BY CUBE(r_name)""".stripMargin).count()
    assert(cube > 0)
    val cos = spark.sql(
      """SELECT graft_cosine(a.embedding, b.embedding) c,
        |  graft_sorted_intersect_count(array('a','b'), array('b','c')) i
        |FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin)
      .collect()(0)
    assert(cos.getDouble(0) >= -1.0 && cos.getDouble(0) <= 1.0)
    assert(cos.getInt(1) === 1)
  }

  test("graft_sorted_intersect_count rejects mixed element types at analysis") {
    GraftSql.registerAll(spark, "/root/testdata/sf0.001")
    // long comparator + string accessor would read garbage at runtime;
    // must fail type checking instead
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT graft_sorted_intersect_count(array('a','b'), array(1L, 2L))")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("element type") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("signature + top-k functions work from SQL") {
    GraftSql.registerAll(spark, "/root/testdata/sf0.001")
    val sig = spark.sql(
      """SELECT graft_simhash64(array('alpha','beta')) s,
        |  graft_minhash(array('alpha','beta'), 8) m,
        |  graft_rhp_sig(CAST(array(0.5, -0.25) AS ARRAY<DOUBLE>), 8, 0) r""".stripMargin)
      .collect()(0)
    assert(sig.getSeq[Long](1).length === 8)
    assert(sig.getInt(2) >= 0 && sig.getInt(2) < 256)
    // graft_top_k as a SQL aggregate: top 3 docs by length per bucket
    val topk = spark.sql(
      """SELECT doc_id % 2 AS b,
        |  graft_top_k(CAST(length(text) AS DOUBLE), doc_id, 3) t
        |FROM documents GROUP BY doc_id % 2""".stripMargin)
      .collect()
    assert(topk.length === 2)
    topk.foreach(r => assert(r.getSeq[org.apache.spark.sql.Row](1).length === 3))
    val bc = spark.sql(
      """SELECT graft_bounded_collect(CAST(embedding AS ARRAY<DOUBLE>), 2) c
        |FROM embeddings WHERE vec_id < 10""".stripMargin).collect()(0)
    assert(bc.getSeq[Any](0).length === 2)
    val fk = spark.sql(
      "SELECT graft_frequent_keys(o_custkey, 16) FROM orders").collect()(0)
    assert(fk.getSeq[org.apache.spark.sql.Row](0).nonEmpty)
  }

}
