package graft

import graft.operators.{DedupPipeline, Packing, Sampling}
import org.apache.spark.sql.functions._

/** Sampling, mixture rebalance, composed dedup pipeline, sequence
  * packing, HLL sketch rollups — the curation operator suite.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ---------- deterministic sampling ----------

  test("hexThreshold: exact 8-hex-digit boundaries") {
    assert(Sampling.hexThreshold(0.25) === "40000000")
    assert(Sampling.hexThreshold(0.5) === "80000000")
    assert(Sampling.hexThreshold(0.75) === "c0000000")
    assert(Sampling.hexThreshold(0.0) === "00000000")
    intercept[IllegalArgumentException](Sampling.hexThreshold(1.0))
  }

  private lazy val ids = (0L until 4000L).toDF("id")

  test("deterministicSample: rate within tolerance, reproducible, nested") {
    val s02 = Sampling.deterministicSample(ids, "id", 0.2)
      .select("id").as[Long].collect().toSet
    val s05 = Sampling.deterministicSample(ids, "id", 0.5)
      .select("id").as[Long].collect().toSet
    // md5 is uniform: 4000 draws at p=0.2 → ±4 sigma ≈ ±101
    assert(math.abs(s02.size - 800) < 110, s"got ${s02.size}")
    assert(math.abs(s05.size - 2000) < 130, s"got ${s05.size}")
    // NESTED: the 20% sample is a subset of the 50% sample
    assert(s02.subsetOf(s05))
    // reproducible under repartitioning (pure function of the row)
    val again = Sampling.deterministicSample(ids.repartition(7), "id", 0.2)
      .select("id").as[Long].collect().toSet
    assert(again === s02)
  }

  test("stratifiedSample: per-stratum rates and default applied") {
    val df = ids.withColumn("stratum",
      when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b")
        .otherwise("c"))
    val kept = Sampling.stratifiedSample(df, "stratum",
      Map("a" -> 1.0, "b" -> 0.25), defaultRate = 0.0, idCol = "id")
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(kept("a") === 1334)           // rate 1.0 keeps every row
    assert(math.abs(kept("b") - 333) < 75)
    assert(!kept.contains("c"))          // default 0.0 drops all
  }

  test("stratifiedSample/qualityFilter: null ids and null strata are kept, not dropped") {
    // null id at a keep-everything rate: before the sentinel coalesce,
    // md5(NULL) nulled the predicate and the row silently vanished
    val withNullId = Seq((Some(1L), "a"), (None, "a"), (Some(2L), "a"))
      .toDF("id", "stratum")
    val kept = Sampling.stratifiedSample(withNullId, "stratum",
      Map("a" -> 1.0), defaultRate = 0.0, idCol = "id")
    assert(kept.count() === 3, "rate-1.0 stratum must keep null-id rows")
    // null-id rows behave as ONE ordinary key: same decision at any
    // rate regardless of partitioning (pure function of the sentinel)
    val half = Sampling.stratifiedSample(withNullId, "stratum",
      Map("a" -> 0.5), defaultRate = 0.0, idCol = "id")
      .filter(col("id").isNull).count()
    val halfAgain = Sampling.stratifiedSample(withNullId.repartition(3),
      "stratum", Map("a" -> 0.5), defaultRate = 0.0, idCol = "id")
      .filter(col("id").isNull).count()
    assert(half === halfAgain)
    // null stratum is a stratum like any other for qualityFilter: the
    // === join dropped every null-stratum row; <=> keeps their top half
    val scored = Seq((1L, Some("en"), 0.9), (2L, Some("en"), 0.1),
      (3L, None, 0.8), (4L, None, 0.2)).toDF("id", "lang", "q")
    val top = Sampling.qualityFilter(scored, "lang", col("q"), 1, 2, "id")
      .select("id").as[Long].collect().toSet
    assert(top === Set(1L, 3L), "top-half per stratum incl. the null stratum")
  }

  test("mixtureRebalance: integer quotas hit the target mixture exactly") {
    // 600 of x, 100 of y, 300 of z; target 2:1:1 → T bounded by y:
    // T = 100*4 div 1 = 400 → quotas x=200, y=100, z=100
    val df = ((0L until 600L).map(i => (i, "x")) ++
      (600L until 700L).map(i => (i, "y")) ++
      (700L until 1000L).map(i => (i, "z"))).toDF("id", "dom")
    val out = Sampling.mixtureRebalance(df, "dom",
      Map("x" -> 2, "y" -> 1, "z" -> 1), idCol = "id")
    val cnt = out.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(cnt === Map("x" -> 200L, "y" -> 100L, "z" -> 100L))
    // domains not in the target are dropped entirely
    val out2 = Sampling.mixtureRebalance(df, "dom",
      Map("x" -> 1, "y" -> 1), idCol = "id")
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(out2 === Map("x" -> 100L, "y" -> 100L))
    // a target domain with no rows → honestly EMPTY, not a silently
    // wrong mixture over the domains that do exist
    val empty = Sampling.mixtureRebalance(df, "dom",
      Map("x" -> 1, "missing" -> 1), idCol = "id")
    assert(empty.count() === 0)
    // selection is deterministic: rerun picks the identical id set
    val a = out.select("id").as[Long].collect().toSet
    val b = Sampling.mixtureRebalance(df.repartition(5), "dom",
      Map("x" -> 2, "y" -> 1, "z" -> 1), idCol = "id")
      .select("id").as[Long].collect().toSet
    assert(a === b)
  }

  test("qualityFilter: exact per-stratum keep counts, worst docs dropped") {
    // stratum a: 10 docs scored by id (keep 3/4 → ceil(7.5)=8 best);
    // stratum b: 5 docs (keep ceil(3.75)=4)
    val df = ((1L to 10L).map(i => (i, "a", i.toDouble)) ++
      (11L to 15L).map(i => (i, "b", (20 - i).toDouble)))
      .toDF("id", "s", "score")
    val kept = Sampling.qualityFilter(df, "s", col("score"), 3, 4, "id")
      .select("id").as[Long].collect().toSet
    // a keeps scores 3..10 (drops the 2 worst), b keeps 11..14 (score
    // 9..5 desc, drops 15)
    assert(kept === ((3L to 10L) ++ (11L to 14L)).toSet)
  }

  // ---------- composed dedup pipeline ----------

  // 1↔2 exact dup; 3~4~5 a near-dup CHAIN (3~4 and 4~5 share 14/15
  // tokens but 3~5 only 13/16 < 0.8 — transitivity must merge all
  // three); 6 shares the bucket key with 3-5 but is unrelated; 7 has
  // its own bucket.
  private lazy val pipeDocs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "Alpha  beta gamma delta epsilon zeta eta theta iota kappa"),
    (3L, "pack my box with five dozen liquor jugs before the long summer night ends"),
    (4L, "pack my box with five dozen liquor jugs before the long winter night ends"),
    (5L, "pack my box with five dozen liquor jugs before the cold winter night ends"),
    (6L, "pack my crate entirely differently worded text goes right here now"),
    (7L, "sphinx of black quartz judge my vow tonight"))
    .toDF("doc_id", "text")

  test("nearDupGroups: exact stage + chain closure + singleton election") {
    val out = DedupPipeline.nearDupGroups(pipeDocs, "doc_id", "text", 0.8)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    // doc 2 was removed by the exact stage
    assert(out.map(_._1).toSeq === Seq(1L, 3L, 4L, 5L, 6L, 7L))
    val byId = out.map(r => r._1 -> r).toMap
    // chain 3~4~5 closed transitively into group 3 of size 3
    assert(byId(3L) === ((3L, 3L, 3L, true)))
    assert(byId(4L) === ((4L, 3L, 3L, false)))
    assert(byId(5L) === ((5L, 3L, 3L, false)))
    // same-bucket-but-dissimilar and lone docs are singleton survivors
    assert(byId(6L) === ((6L, 6L, 1L, true)))
    assert(byId(7L) === ((7L, 7L, 1L, true)))
    assert(byId(1L) === ((1L, 1L, 1L, true)))
  }

  test("nearDupGroups: mega-bucket cull skips pairing but keeps docs") {
    // 30 docs share a bucket; with maxBucketSize=10 none may pair, so
    // all must surface as singleton survivors (silent drop = bias)
    val many = (0L until 30L)
      .map(i => (i, s"common prefix payload number $i end"))
      .toDF("doc_id", "text")
    val out = DedupPipeline.nearDupGroups(many, "doc_id", "text", 0.5,
      maxBucketSize = 10)
    assert(out.count() === 30)
    assert(out.filter(col("survivor") && col("group_size") === 1).count() === 30)
  }

  test("admitIncremental: rejects corpus dups, admits new survivors, ≡ full pipeline") {
    // corpus (already deduplicated): two established docs. Corpus ids
    // are LOWER than batch ids (the realistic invariant: the corpus
    // is older), which also makes the full-pipeline comparison exact —
    // an exact dup across corpus/new always resolves to the corpus doc.
    val corpus = Seq(
      (10L, "pack my box with five dozen liquor jugs before the long summer night ends"),
      (20L, "sphinx of black quartz judge my vow while wizards explode frequently"))
      .toDF("doc_id", "text")
    val newDocs = Seq(
      // exact dup (mod case/ws) of corpus 10 → reject
      (101L, "Pack my box  with five dozen liquor jugs before the long summer night ends"),
      // near-dup of corpus 10 (one word) → reject
      (102L, "pack my box with five dozen liquor jugs before the long winter night ends"),
      // near-dup CHAIN to doc 102 only (two words off corpus) → still
      // reject: transitively touches the corpus through doc 102
      (103L, "pack my box with five dozen liquor jugs before the cold winter night ends"),
      // novel doc → admit
      (104L, "completely novel content about catalyst optimizer internals right here"),
      // exact dup pair among new docs → admit min id only
      (105L, "fresh new sentence that appears twice in this batch tonight"),
      (106L, "fresh NEW sentence that appears twice in this batch tonight"))
      .toDF("doc_id", "text")
    val admitted = graft.operators.DedupPipeline
      .admitIncremental(newDocs, corpus, "doc_id", "text", 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted === Set(104L, 105L))
    // equivalence contract: admitted = new survivors of corpus-free
    // groups in the FULL pipeline over corpus ∪ new
    val full = graft.operators.DedupPipeline
      .nearDupGroups(corpus.unionByName(newDocs), "doc_id", "text", 0.8)
    val corpusIds = Set(10L, 20L)
    val corpusGroups = full.filter(col("doc_id").isin(corpusIds.toSeq: _*))
      .select("dup_group").as[Long].collect().toSet
    val expected = full
      .filter(col("survivor") && !col("dup_group").isin(corpusGroups.toSeq: _*)
        && !col("doc_id").isin(corpusIds.toSeq: _*))
      .select("doc_id").as[Long].collect().toSet
    assert(admitted === expected)
  }

  test("temperatureRebalance: sqrt-proportional quotas, hand-checked") {
    // A:100, B:400 → W_A=10e6, W_B=20e6, S=30e6; T=min(300,600)=300;
    // quota_A=100 (all of A — the binding domain), quota_B=200 —
    // kept shares 1:2, the sqrt of the raw 1:4
    val docs = ((1L to 100L).map(i => (i, "A")) ++
      (101L to 500L).map(i => (i, "B"))).toDF("doc_id", "dom")
    val out = Sampling.temperatureRebalance(docs, "dom", "doc_id")
    val byDom = out.groupBy("dom").count().as[(String, Long)]
      .collect().toMap
    assert(byDom === Map("A" -> 100L, "B" -> 200L))
    // deterministic under repartitioning
    val a = out.select("doc_id").as[Long].collect().toSet
    val b = Sampling.temperatureRebalance(docs.repartition(13), "dom",
      "doc_id").select("doc_id").as[Long].collect().toSet
    assert(a === b)
    // nested under count drift: quotas never exceed domain counts
    assert(byDom.forall { case (d, k) =>
      k <= docs.filter(col("dom") === d).count() })
  }

  test("temperatureRebalance: flattens skew toward sqrt shares") {
    // raw 9:1 → kept 3:1 (sqrt); the smoothing property itself
    val docs = ((1L to 900L).map(i => (i, "hot")) ++
      (901L to 1000L).map(i => (i, "cold"))).toDF("doc_id", "dom")
    val byDom = Sampling.temperatureRebalance(docs, "dom", "doc_id")
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    // W_hot=30e6, W_cold=10e6, S=40e6; T=min(900*4/3=1200, 100*4)=400
    // quota_hot=300, quota_cold=100
    assert(byDom === Map("hot" -> 300L, "cold" -> 100L))
  }

  test("temperatureRebalance: random domain mixes match an independent BigInt derivation (10 rounds)") {
    // dual-implementation pin beyond the oracle: the quota formula
    // re-derived with plain BigInt arithmetic (no Spark, no decimal
    // types) must predict every kept count exactly
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 10) {
      val nDoms = 2 + rnd.nextInt(4)
      val domCounts = (0 until nDoms)
        .map(d => s"d$d" -> (1 + rnd.nextInt(300))).toMap
      var id = 0L
      val rows = domCounts.toSeq.flatMap { case (d, n) =>
        (1 to n).map { _ => id += 1; (id, d) }
      }
      val got = Sampling.temperatureRebalance(
          rows.toDF("doc_id", "dom"), "dom", "doc_id")
        .groupBy("dom").count().as[(String, Long)].collect().toMap
      val w = domCounts.view.mapValues(n =>
        BigInt(math.round(math.sqrt(n.toDouble) * 1e6))).toMap
      val s = w.values.sum
      val t = domCounts.map { case (d, n) => (BigInt(n) * s) / w(d) }.min
      val expect = domCounts.keys.map { d =>
        d -> (w(d) * t / s).toLong }.filter(_._2 > 0).toMap
      assert(got === expect, s"round $round: counts $domCounts")
    }
  }

  test("unimaxRebalance: water-filling hand-checked; budget conserved") {
    // A:10, B:40, C:100, budget 90 → fair 30: A keeps 10 (surplus
    // redistributes), B vs (80//2)=40 keeps 40, C min(100, 40)=40
    val docs = ((1L to 10L).map(i => (i, "A")) ++
      (11L to 50L).map(i => (i, "B")) ++
      (51L to 150L).map(i => (i, "C"))).toDF("doc_id", "dom")
    val byDom = Sampling.unimaxRebalance(docs, "dom", "doc_id", budget = 90L)
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(byDom === Map("A" -> 10L, "B" -> 40L, "C" -> 40L))
    assert(byDom.values.sum === 90L)
    // budget >= corpus: everything kept
    val all = Sampling.unimaxRebalance(docs, "dom", "doc_id", budget = 500L)
      .count()
    assert(all === 150L)
    // zero budget: nothing kept
    assert(Sampling.unimaxRebalance(docs, "dom", "doc_id", 0L).count() === 0L)
    // determinism under repartitioning
    val a = Sampling.unimaxRebalance(docs, "dom", "doc_id", 90L)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.unimaxRebalance(docs.repartition(13), "dom",
      "doc_id", 90L).select("doc_id").as[Long].collect().toSet
    assert(a === b)
    // nested: raising the budget only ADDS docs (md5-rank prefixes)
    val small = Sampling.unimaxRebalance(docs, "dom", "doc_id", 60L)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(a))
  }

  test("temperature/unimax: null domain is a stratum, walks NULLS-LAST on ties") {
    // null-domain rows must be kept as their own stratum (the
    // qualityFilter discipline) and, in the UniMax walk, a null
    // domain TIED in count with a real domain walks LAST — the
    // oracle's ORDER BY ... NULLS LAST (review r8)
    val docs = ((1L to 4L).map(i => (i, Some("A"))) ++
      (5L to 8L).map(i => (i, Option.empty[String]))).toDF("doc_id", "dom")
    // budget 5 over tied counts (4, 4): first walker gets 5//2=2,
    // second gets 3 — NULLS LAST means A takes 2, null takes 3
    val uni = Sampling.unimaxRebalance(docs, "dom", "doc_id", budget = 5L)
      .groupBy("dom").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(uni === Map(Some("A") -> 2L, None -> 3L))
    // temperature: the null stratum participates with its sqrt weight
    val temp = Sampling.temperatureRebalance(docs, "dom", "doc_id")
      .groupBy("dom").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(temp === Map(Some("A") -> 4L, None -> 4L))
  }

  // ---------- sequence packing ----------

  private def checkPackingInvariants(
      docs: org.apache.spark.sql.DataFrame, maxTokens: Int,
      numShards: Int): Unit = {
    val out = Packing.packSequences(docs, "doc_id",
      col("w"), maxTokens, numShards).collect()
    val inIds = docs.select(col("doc_id").cast("long")).as[Long]
      .collect().sorted.toSeq
    // every doc exactly once
    assert(out.map(_.doc_id).sorted.toSeq === inIds)
    // per-bin: fill = Σ weights; ≤ cap unless a lone oversize doc
    out.groupBy(p => (p.shard, p.bin)).foreach { case ((_, _), members) =>
      val fill = members.map(_.weight).sum
      assert(members.forall(_.bin_fill === fill))
      if (fill > maxTokens) {
        assert(members.length === 1 && members.head.oversize,
          s"overfull bin not a lone oversize doc: $members")
      }
      assert(members.forall(p => p.oversize === (p.weight > maxTokens)))
    }
    // FFD quality per shard: bins ≤ 11/9·OPT + 1, OPT ≥ ceil(Σw/cap)
    out.groupBy(_.shard).foreach { case (_, members) =>
      val regular = members.filter(!_.oversize)
      if (regular.nonEmpty) {
        val bins = regular.map(_.bin).distinct.length
        val lower = math.ceil(regular.map(_.weight.toLong).sum
          / maxTokens.toDouble)
        assert(bins <= math.ceil(11.0 / 9.0 * lower) + 1,
          s"FFD bound violated: $bins bins for lower bound $lower")
      }
    }
  }

  test("packSequences: invariants on a crafted mix") {
    val docs = ((1L to 40L).map(i => (i, 100 + (i % 7).toInt * 50)) ++
      Seq((98L, 700), (99L, 513))) // two oversize docs (cap 512)
      .toDF("doc_id", "w")
    checkPackingInvariants(docs, maxTokens = 512, numShards = 4)
  }

  test("packSequencesPortable: same FFD kernel, md5 shard hash") {
    val docs = ((1L to 60L).map(i => (i, 50 + ((i * 31) % 300).toInt)) ++
      Seq((98L, 700))).toDF("doc_id", "w")
    val out = Packing.packSequencesPortable(docs, "doc_id", col("w"),
      512, 8).collect()
    // identical invariants as the native variant
    assert(out.map(_.doc_id).sorted.toSeq ===
      docs.select(col("doc_id")).as[Long].collect().sorted.toSeq)
    out.groupBy(p => (p.shard, p.bin)).foreach { case (_, members) =>
      val fill = members.map(_.weight).sum
      assert(members.forall(_.bin_fill === fill))
      if (fill > 512) assert(members.length === 1 && members.head.oversize)
    }
    // the md5-prefix shard matches a hand computation (the oracle's rule)
    out.foreach { p =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(p.doc_id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      assert(p.shard === (java.lang.Long.parseLong(hex, 16) % 8).toInt)
    }
  }

  test("packSequences: deterministic under repartitioning") {
    val docs = (1L to 200L).map(i => (i, 1 + ((i * 37) % 400).toInt))
      .toDF("doc_id", "w")
    val a = Packing.packSequences(docs, "doc_id", col("w"), 512, 8)
      .collect().sortBy(_.doc_id).toSeq
    val b = Packing.packSequences(docs.repartition(13), "doc_id", col("w"), 512, 8)
      .collect().sortBy(_.doc_id).toSeq
    assert(a === b)
  }

  // ---------- n-grams / repetition / decontamination ----------

  test("ngrams and dupNgramFraction: hand-checked, short-doc guarded") {
    import graft.functions.TextFunctions.{dupNgramFraction, ngrams}
    val df = Seq((1L, "a b c d"), (2L, "x y x y x y"), (3L, "one two"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), ngrams(col("text"), 3).as("g"),
        dupNgramFraction(col("text"), 3).as("f"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[String](1), Option(r.get(2)))).toMap
    assert(df(1L)._1 === Seq("a b c", "b c d"))
    assert(df(1L)._2 === Some(0.0))
    // "x y x y x y": 3-grams [x y x, y x y, x y x, y x y] → 2 dups of 4
    assert(df(2L)._1 === Seq("x y x", "y x y", "x y x", "y x y"))
    assert(df(2L)._2 === Some(0.5))
    // below n tokens: empty grams, NULL fraction (never negative/crash)
    assert(df(3L)._1 === Seq.empty)
    assert(df(3L)._2 === None)
  }

  test("flagContaminated: exact hit counts, short docs never flagged") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      // shares "the quick brown" + "quick brown fox" + "brown fox jumps"
      (1L, "we saw the quick brown fox jumps high today"),
      (2L, "nothing in common with anything at all here"),
      (3L, "fox jumps"), // < 3 tokens: no grams, cannot be flagged
      (4L, "the quick brown dog sat still")) // 1 hit of 4 grams
      .toDF("doc_id", "text")
    val out = graft.operators.Decontamination
      .flagContaminated(train, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet === Set(1L, 4L))
    assert(out(1L) === ((3L, 7L, math.rint(3.0 / 7.0 * 1e6) / 1e6)))
    assert(out(4L) === ((1L, 4L, 0.25)))
  }

  // ---------- HLL sketch rollup ----------

  test("portable HLL (q75 twin): accuracy within 4σ; merge path BIT-identical") {
    import graft.operators.PortableHll
    val df = (0L until 6000L)
      .map(i => (s"g${i % 2}", s"part${i % 8}", s"tok${i % (900 + 100 * (i % 2).toInt)}"))
      .toDF("grp", "part", "tok")
    // accuracy: m=1024 → rse ≈ 3.25%; exact distinct per grp computed
    // directly
    val exact = df.groupBy("grp")
      .agg(countDistinct(col("tok")).as("n"))
      .as[(String, Long)].collect().toMap
    val est = PortableHll.estimate(
        PortableHll.registers(df, Seq("grp"), col("tok")), Seq("grp"))
      .select(col("grp"), col("est_distinct")).as[(String, Double)]
      .collect().toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n) <= 4 * 0.0325 * n + 10,
        s"$g: est ${est(g)} vs exact $n")
    }
    // mergeability is EXACT here (max-associativity), not
    // within-error-band like the builtin sketch: fine partials merged
    // up equal the direct coarse registers value-for-value
    val direct = PortableHll.estimate(
        PortableHll.registers(df, Seq("grp"), col("tok")), Seq("grp"))
      .collect().map(_.toSeq).toSet
    val merged = PortableHll.estimate(
        PortableHll.registers(df, Seq("grp", "part"), col("tok")), Seq("grp"))
      .collect().map(_.toSeq).toSet
    assert(merged === direct)
    // small-range: a tiny group takes the linear-counting branch and
    // lands essentially exact
    val tiny = (0 until 30).map(i => ("t", s"w$i")).toDF("grp", "tok")
    val tinyEst = PortableHll.estimate(
        PortableHll.registers(tiny, Seq("grp"), col("tok")), Seq("grp"))
      .select("est_distinct").as[Double].head()
    assert(math.abs(tinyEst - 30.0) < 2.0, s"linear-counting est $tinyEst")
  }

  test("portable HLL: null tokens drop out (no phantom register)") {
    import graft.operators.PortableHll
    val withNulls = Seq(("g", Option("a")), ("g", None), ("g", Option("b")),
      ("g", None)).toDF("grp", "tok")
    val clean = Seq(("g", "a"), ("g", "b")).toDF("grp", "tok")
    def run(df: org.apache.spark.sql.DataFrame) = PortableHll.estimate(
        PortableHll.registers(df, Seq("grp"), col("tok")), Seq("grp"))
      .collect().map(_.toSeq).toSet
    // ADVICE r7: a null token used to yield a (NULL, NULL) register
    // counted in `occupied` — estimates must be identical with and
    // without the nulls
    assert(run(withNulls) === run(clean))
  }

  test("loadWeights: truncated / out-of-range weight files fail loudly") {
    import graft.operators.QualityClassifier
    def load(s: String) = QualityClassifier.loadWeights(
      new java.io.ByteArrayInputStream(s.getBytes("UTF-8")))
    // complete file loads
    val (w, icpt) = load("meta 2 0.5\nw 0 1.0\nw 1 -2.0")
    assert(w.toSeq === Seq(1.0, -2.0) && icpt === 0.5)
    // truncated: bucket 1 missing
    assertThrows[IllegalArgumentException](load("meta 2 0.5\nw 0 1.0"))
    // out-of-range bucket index: pointed error, not AIOOBE
    val e = intercept[IllegalArgumentException](
      load("meta 2 0.5\nw 0 1.0\nw 5 2.0"))
    assert(e.getMessage.contains("out of range"))
  }

  test("portable LR scoring (q77 twin): plain-Scala parity; fixture separates") {
    import graft.operators.QualityClassifier
    // hand-checkable parity: 4 buckets, known weights — the operator's
    // decimal-summed sigmoid must equal the plain-Scala computation
    val w = Array(0.5, -1.0, 0.0, 2.0)
    val docs = Seq((1L, "a a b"), (2L, "c"), (3L, "")).toDF("doc_id", "text")
    def bucketOf(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(tok.getBytes("UTF-8"))
      var h = 0L
      for (i <- 0 until 7) h = (h << 8) | (d(i) & 0xFFL)
      h = (h << 4) | ((d(7) >> 4) & 0xFL)
      (h % 4).toInt
    }
    val got = QualityClassifier.scorePortable(docs, "doc_id", "text", w, 0.25)
      .as[(Long, Double)].collect().toMap
    def ref(toks: Seq[String]): Double = {
      val margin = 0.25 + toks.groupBy(bucketOf).map {
        case (b, ts) => BigDecimal(w(b) * ts.size)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      BigDecimal(1.0 / (1.0 + math.exp(-margin)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got(1L) === ref(Seq("a", "a", "b")))
    assert(got(2L) === ref(Seq("c")))
    assert(got(3L) === ref(Seq.empty), "token-free doc scores at the intercept")
    // the committed fixture genuinely separates its median-split
    // training labels on the sf0.01 corpus
    import graft.functions.TextFunctions.qualityScore
    val (fw, fi) = QualityClassifier.loadFixtureWeights()
    val d = Tables(spark, "/root/testdata/sf0.01").documents
      .filter(col("doc_id") % 2 === 0)
    val joined = QualityClassifier.scorePortable(d, "doc_id", "text", fw, fi)
      .join(d.select(col("doc_id").as("id"),
        (qualityScore(col("text")) >= 0.97).as("lbl")), "id")
    val acc = joined.filter((col("p_quality") >= 0.5) === col("lbl")).count()
      .toDouble / joined.count()
    assert(acc >= 0.9, s"fixture training accuracy $acc")
  }

  test("hll union of partial sketches tracks exact distinct counts") {
    val df = (0L until 5000L)
      .map(i => (s"part${i % 8}", s"tok${i % 700}"))
      .toDF("part", "tok")
    val partials = df.groupBy("part")
      .agg(hll_sketch_agg(col("tok"), lit(12)).as("sk"))
    val est = partials
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))))
      .as[Long].head()
    // HLL at lgK=12 has ~1.6% rse; 700 distinct → ±4 sigma ≈ 45
    assert(math.abs(est - 700L) <= 45, s"estimate $est vs exact 700")
    // mergeability: union of partials estimates within the same error
    // band as one global sketch (not bit-equal: the union path may
    // promote sketch mode, shifting the estimator by < 2 rse)
    val global = df.agg(hll_sketch_estimate(
      hll_sketch_agg(col("tok"), lit(12)))).as[Long].head()
    assert(math.abs(est - global) <= 25, s"union $est vs global $global")
  }

  test("assignSplit: exhaustive, proportional, and leakage-free on the key") {
    import graft.operators.Sampling
    val weights = Seq("train" -> 8, "val" -> 1, "test" -> 1)
    val keys = (0L until 4000L).toDF("k")
      .select(col("k"), Sampling.assignSplit(col("k"), weights).as("split"))
    val counts = keys.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    // exhaustive: every row assigned, only the three labels
    assert(counts.values.sum === 4000L)
    assert(counts.keySet === Set("train", "val", "test"))
    // proportional within 5 sigma of binomial
    def within(name: String, p: Double): Unit = {
      val sigma = math.sqrt(4000 * p * (1 - p))
      assert(math.abs(counts(name) - 4000 * p) <= 5 * sigma,
        s"$name: ${counts(name)} vs ${4000 * p}")
    }
    within("train", 0.8); within("val", 0.1); within("test", 0.1)
    // leakage-free: rows sharing a fingerprint key always share a
    // split, regardless of their row ids
    val docs = Seq(
      (1L, "the SAME   text"), (900L, "The same text"), (7L, "other words"))
      .toDF("doc_id", "text")
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
      .select(col("doc_id"),
        Sampling.assignSplit(col("fp"), weights).as("split"))
      .as[(Long, String)].collect().toMap
    assert(docs(1L) === docs(900L))
    // deterministic across invocations
    val again = keys.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = keys.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again === first)
    // NULL keys: assigned (not dumped in the last bucket by CASE
    // fallthrough) and all land in the SAME split — a null fingerprint
    // is one shared leakage key, so its rows must never straddle
    // train/eval
    val nulls = Seq((1L, null: String), (2L, null: String), (3L, "real key"))
      .toDF("id", "fp")
      .select(col("id"), Sampling.assignSplit(col("fp"), weights).as("split"))
      .as[(Long, String)].collect().toMap
    assert(nulls(1L) != null && nulls(1L) === nulls(2L))
    // the null bucket is the sentinel's md5 bucket, not the
    // fallthrough: with an 80/10/10 split the sentinel hashes into
    // train (pinned so a sentinel change is a visible decision)
    assert(nulls(1L) === "train")
  }

  test("fuzzyContaminated: catches the one-word edit exact n-gram decon misses") {
    import graft.operators.Decontamination
    val bench = Seq(
      (1000L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"), // verbatim
      (2L, "alpha beta gamma delta CHANGED zeta eta theta iota"), // 1-word edit
      (3L, "totally unrelated content about something else entirely"))
      .toDF("doc_id", "text")
    // exact 8-gram decon: the 9-token doc has two 8-grams, and the
    // middle-word edit kills both — doc 2 escapes
    val exact = Decontamination.flagContaminated(train, bench,
      "doc_id", "text", n = 8).select("doc_id").as[Long].collect().toSet
    assert(exact === Set(1L))
    // fuzzy MinHash decon: shingle Jaccard barely moves — both flagged
    val fuzzy = Decontamination.fuzzyContaminated(train, bench,
        "doc_id", "text", shingleK = 2, numHashes = 32, bands = 16,
        threshold = 0.4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(fuzzy.keySet === Set(1L, 2L))
    assert(fuzzy(1L) === ((1000L, 1.0))) // verbatim: jaccard exactly 1
    assert(fuzzy(2L)._1 === 1000L && fuzzy(2L)._2 >= 0.4 && fuzzy(2L)._2 < 1.0)
    // precision: flagged pairs are >= threshold under brute-force
    // token-shingle Jaccard (no false flags from banding)
    def shingleSet(s: String) =
      s.split(" ").sliding(2).map(_.mkString(" ")).toSet
    val benchSh = shingleSet("alpha beta gamma delta epsilon zeta eta theta iota")
    fuzzy.foreach { case (id, (_, j)) =>
      val t = train.filter(col("doc_id") === id)
        .select("text").as[String].collect()(0)
      val ts = shingleSet(t)
      val bruteJ = ts.intersect(benchSh).size.toDouble /
        ts.union(benchSh).size
      assert(math.abs(bruteJ - j) < 1e-6, s"doc $id: $bruteJ vs $j")
    }
  }

  test("fuzzyContaminatedPortable (q72 twin): same flags, md5 hash family") {
    import graft.operators.Decontamination
    val bench = Seq(
      (1000L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"), // verbatim
      (2L, "alpha beta gamma delta CHANGED zeta eta theta iota"), // 1-word edit
      (3L, "totally unrelated content about something else entirely"))
      .toDF("doc_id", "text")
    val fuzzy = Decontamination.fuzzyContaminatedPortable(train, bench,
        "doc_id", "text", shingleK = 2, numHashes = 32, bands = 16,
        threshold = 0.4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // identical flag semantics to the native path on the same corpus:
    // the hash family changes candidate probabilities, not the verify
    assert(fuzzy.keySet === Set(1L, 2L))
    assert(fuzzy(1L) === ((1000L, 1.0)))
    assert(fuzzy(2L)._1 === 1000L && fuzzy(2L)._2 >= 0.4 && fuzzy(2L)._2 < 1.0)
  }

  test("quality classifier: separates planted classes, distills the heuristic") {
    import graft.operators.QualityClassifier
    val rnd = new scala.util.Random(11)
    val goodWords = Vector("clear", "prose", "reads", "well", "argued",
      "coherent", "measured", "precise")
    val spamWords = Vector("BUY", "NOW", "click", "FREE", "winner",
      "$$$", "offer", "urgent")
    def doc(words: Vector[String]) =
      Seq.fill(12)(words(rnd.nextInt(words.size))).mkString(" ")
    val rows = (0L until 200L).map { i =>
      val good = i % 2 == 0
      (i, doc(if (good) goodWords else spamWords), if (good) 1 else 0)
    }
    val df = rows.toDF("doc_id", "text", "label")
    val trainDf = df.filter(col("doc_id") < 150)
    val held = df.filter(col("doc_id") >= 150)
    val model = QualityClassifier.train(trainDf, "text", "label")
    val scored = QualityClassifier.score(held, "doc_id", "text", model)
      .join(held.select(col("doc_id"), col("label")), "doc_id")
      .select(col("doc_id"), col("p_quality"), col("label"))
      .as[(Long, Double, Int)].collect()
    val correct = scored.count { case (_, p, l) =>
      (p >= 0.5 && l == 1) || (p < 0.5 && l == 0) }
    assert(correct.toDouble / scored.length >= 0.95,
      s"held-out accuracy ${correct.toDouble / scored.length}")
    // scoring the same docs twice with the same model is identical
    val again = QualityClassifier.score(held, "doc_id", "text", model)
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(again.toSeq === scored.map(t => (t._1, t._2)).sortBy(_._1).toSeq)
  }

  test("shuffleShards: permutation, balance, determinism, partitioning-independence") {
    val ids = (0L until 2000L).toDF("doc_id")
    val out = Sampling.shuffleShards(ids, "doc_id", numShards = 8,
      seed = "epoch0")
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // every id exactly once
    assert(rows.map(_._1).sorted.toSeq === (0L until 2000L))
    // per-shard positions are dense 0..n_s-1 (a valid loader order)
    rows.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (0L until rs.length))
    }
    // binomial balance: no empty shard, no shard over 2x the mean
    val sizes = rows.groupBy(_._2).view.mapValues(_.length).values.toSeq
    assert(sizes.size === 8 && sizes.min > 100 && sizes.max < 500)
    // deterministic AND independent of input partitioning
    val again = Sampling.shuffleShards(ids.repartition(13), "doc_id",
        numShards = 8, seed = "epoch0")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(again.sortBy(_._1).toSeq === rows.sortBy(_._1).toSeq)
    // a different seed is a different permutation (epochs differ)
    val epoch1 = Sampling.shuffleShards(ids, "doc_id", numShards = 8,
        seed = "epoch1")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(epoch1.sortBy(_._1).toSeq != rows.sortBy(_._1).toSeq)
  }

  test("semanticDecontaminate: planted paraphrase flagged, clean corpus not; nlist=1 is exhaustive") {
    import graft.operators.{Decontamination, KMeansPortable}
    def v(a: Double, b: Double, c: Double, d: Double) = Seq(a, b, c, d)
    // bench: two held-out "test set" vectors in different clusters
    val bench = Seq(
      (100L, v(1.0, 0.02, 0.0, 0.0)),
      (101L, v(0.0, 0.0, 1.0, 0.05)))
      .toDF("vec_id", "embedding")
    // corpus: 10 = semantic paraphrase of bench 100 (flag), 11/12 =
    // same cluster but genuinely different (clean), 13 = paraphrase
    // of bench 101 (flag), 14 = far from everything (clean)
    val corpus = Seq(
      (10L, v(0.99, 0.03, 0.0, 0.01)),
      (11L, v(0.6, 0.75, 0.0, 0.0)),
      (12L, v(0.7, -0.6, 0.0, 0.0)),
      (13L, v(0.0, 0.01, 0.98, 0.06)),
      (14L, v(0.0, -0.9, 0.0, 0.4)))
      .toDF("vec_id", "embedding")
    val m = KMeansPortable.trainModel(corpus, k = 2, iters = 2)
    val out = Decontamination
      .semanticDecontaminate(corpus, bench, m.centroids, threshold = 0.95)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(out.keySet === Set(10L, 11L, 12L, 13L, 14L),
      "one row per corpus item, bench never in the output")
    assert(out(10L)._2 && out(13L)._2, "planted paraphrases flagged")
    assert(!out(11L)._2 && !out(12L)._2 && !out(14L)._2,
      "same-cluster-but-different and far corpus items stay clean")
    // nlist = 1: every pair shares the single cell — the exhaustive
    // scan; the planted flags and hit counts must be unchanged
    val one = Decontamination.semanticDecontaminate(corpus, bench,
        Array(Array(0.0, 0.0, 0.0, 0.0)), threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(one === out.map { case (k, (_, f)) => k -> f })
    // partitioning-proof
    val rep = Decontamination.semanticDecontaminate(corpus.repartition(7),
        bench, m.centroids, threshold = 0.95)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(rep === out)
    // bounded-broadcast guard: cap = 0 trips the guard, dropping the
    // broadcast HINT (an oversized "bench" must not be FORCED into a
    // driver broadcast; the planner may still elect one for a small
    // side, which is fine) — same rows either way
    val fbRows = Decontamination.semanticDecontaminate(corpus, bench,
        m.centroids, threshold = 0.95, maxBroadcastBench = 0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(fbRows === out)
  }

  test("semanticDecontaminateTwoLevel: supers=1 ≡ flat; planted paraphrases flagged at auto supers; partitioning-proof") {
    import graft.operators.{Decontamination, KMeansPortable}
    def v(a: Double, b: Double, c: Double, d: Double) = Seq(a, b, c, d)
    val bench = Seq(
      (100L, v(1.0, 0.02, 0.0, 0.0)),
      (101L, v(0.0, 0.0, 1.0, 0.05)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, v(0.99, 0.03, 0.0, 0.01)),
      (11L, v(0.6, 0.75, 0.0, 0.0)),
      (12L, v(0.7, -0.6, 0.0, 0.0)),
      (13L, v(0.0, 0.01, 0.98, 0.06)),
      (14L, v(0.0, -0.9, 0.0, 0.4)))
      .toDF("vec_id", "embedding")
    // supers = 1 degenerates the two-level trainer to the flat one
    // (spec-pinned in KMeansPortableSpec), so the DECON outputs must
    // be identical row-for-row — the established degeneracy contract
    val flat = Decontamination.semanticDecontaminate(corpus, bench,
        KMeansPortable.trainModel(corpus, k = 2, iters = 2).centroids,
        threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), r.getBoolean(3))).sortBy(_._1).toSeq
    val one = Decontamination.semanticDecontaminateTwoLevel(corpus,
        bench, KMeansPortable.trainTwoLevel(corpus, nlist = 2,
          iters = 2, supers = 1), threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), r.getBoolean(3))).sortBy(_._1).toSeq
    assert(one === flat)
    // auto supers: planted paraphrases still flagged, clean stays
    // clean, and the result is partitioning-proof
    val m = KMeansPortable.trainTwoLevel(corpus, nlist = 2, iters = 2)
    val out = Decontamination.semanticDecontaminateTwoLevel(corpus,
        bench, m, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out(10L) && out(13L), "planted paraphrases flagged")
    assert(!out(11L) && !out(12L) && !out(14L), "clean stays clean")
    val rep = Decontamination.semanticDecontaminateTwoLevel(
        corpus.repartition(7), bench, m, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(rep === out)
  }

  test("semanticDecontaminate rejects a quantizer too coarse for the corpus (no cull to hide behind)") {
    import graft.operators.{Decontamination, KMeansPortable}
    // 30 corpus vectors into ONE cell with a bound of 8: this path
    // has no oversized-cell cull by design, so the contract fails
    // loudly instead of paying the uncullable within-cell blow-up
    val corpus = (0L until 30L).map(i => (i, Seq(i.toDouble, 1.0)))
      .toDF("vec_id", "embedding")
    val bench = Seq((100L, Seq(1.0, 1.0))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      Decontamination.semanticDecontaminate(corpus, bench,
        Array(Array(0.0, 0.0)), threshold = 0.9,
        maxExpectedCellSize = 8L))
    assert(e.getMessage.contains("semanticDecontaminate"))
    assert(e.getMessage.contains("nlistFor"))
    // in-contract: a quantizer sized by the contract passes
    val k = KMeansPortable.nlistFor(30L, targetCellSize = 8)
    assert(k === 4)
    val m = KMeansPortable.trainModel(corpus, k = k, iters = 2)
    val rows = Decontamination.semanticDecontaminate(corpus, bench,
      m.centroids, threshold = 0.9, maxExpectedCellSize = 8L).count()
    assert(rows === 30L)
  }

  test("importanceResample: target-like candidates win, target never a candidate, empty docs survive") {
    import graft.operators.DataSelection
    // target sample (domain "tgt"): feline corpus. Candidates in two
    // domains: per domain, 2 docs target-like and 2 off-distribution
    // — keep 1/2 per domain must pick exactly the target-like tails.
    val docs = Seq(
      (1L, "tgt", "cat purr cat whisker purr"),
      (2L, "tgt", "whisker cat purr feline cat"),
      (10L, "web", "cat purr whisker feline cat purr"),
      (11L, "web", "purr cat cat whisker"),
      (12L, "web", "stock market futures swap spread"),
      (13L, "web", "bond yield curve inversion risk"),
      (20L, "forum", "my cat s whisker purr story"),
      (21L, "forum", "feline purr whisker cat cat"),
      (22L, "forum", "gpu shader pipeline raster batch"),
      (23L, "forum", "kernel driver interrupt vector"))
      .toDF("doc_id", "dom", "text")
    val kept = DataSelection.importanceResample(docs,
        col("dom") === "tgt", "doc_id", "text", "dom",
        buckets = 64, keepNum = 1, keepDenom = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(kept.map(_._1).sorted.toSeq === Seq(10L, 11L, 20L, 21L),
      s"the target-like half per domain: $kept")
    assert(kept.forall(_._2 != "tgt"), "target docs are never candidates")
    // absolute scores are smoothing-shifted; what selection rests on
    // is the ORDERING — every kept candidate outscores every dropped
    // one within its domain
    val dropped = Map("web" -> Seq(12L, 13L), "forum" -> Seq(22L, 23L))
    val allScores = DataSelection.importanceResample(docs,
        col("dom") === "tgt", "doc_id", "text", "dom",
        buckets = 64, keepNum = 1, keepDenom = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    kept.foreach { case (id, dom, s) =>
      assert(dropped(dom).forall(d => s > allScores(d)),
        s"kept $id ($s) must outscore dropped ${dropped(dom)} in $dom")
    }
    // empty doc: survives the chain with score 0 (explode_outer), and
    // a keep-everything fraction returns it
    val withEmpty = docs.union(Seq((30L, "web", "   ")).toDF("d", "m", "t"))
    val all = DataSelection.importanceResample(withEmpty,
        col("dom") === "tgt", "doc_id", "text", "dom",
        buckets = 64, keepNum = 1, keepDenom = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(all.contains(30L) && all(30L) === 0.0,
      "a token-free doc rides through with score 0")
    assert(all.keySet === Set(10L, 11L, 12L, 13L, 20L, 21L, 22L, 23L, 30L))
    // partitioning-proof: decimal score sums and rank selection are
    // order-free
    val rep = DataSelection.importanceResample(docs.repartition(7),
        col("dom") === "tgt", "doc_id", "text", "dom",
        buckets = 64, keepNum = 1, keepDenom = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rep.sortBy(_._1).toSeq === kept.sortBy(_._1).toSeq)
  }
}
