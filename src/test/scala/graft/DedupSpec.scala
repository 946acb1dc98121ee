package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // Planted corpus: 1↔2 exact dup (mod whitespace/case), 3↔4 near-dup
  // (one word changed), 5/6 unrelated.
  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "The quick  brown fox jumps over the lazy dog near the river bank today"),
    (3L, "pack my box with five dozen liquor jugs before the long summer night ends"),
    (4L, "pack my box with five dozen liquor jugs before the long winter night ends"),
    (5L, "sphinx of black quartz judge my vow while wizards explode frequently"),
    (6L, "completely different content about spark catalyst optimizer internals here"))
    .toDF("doc_id", "text")

  test("exactDupGroups finds the normalized-exact pair only") {
    val groups = Dedup.exactDupGroups(docs, "doc_id", "text").collect()
    assert(groups.length === 1)
    assert(groups(0).getAs[String]("members") === "1,2")
    assert(groups(0).getAs[Long]("canonical_id") === 1L)
  }

  test("dropExactDups keeps min-id survivor") {
    val kept = Dedup.dropExactDups(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 3L, 4L, 5L, 6L))
  }

  test("jaccardToAnchors matches a hand-computed score") {
    // anchor=3 vs 4: 14 distinct tokens each, 13 shared → 13/15
    val got = Dedup.jaccardToAnchors(docs, "doc_id", "text",
      col("id") === 3, 0.5).collect()
    assert(got.length === 1)
    assert(got(0).getAs[Long]("b_id") === 4L)
    assert(math.abs(got(0).getAs[Double]("jaccard") - 13.0 / 15.0) < 1e-12)
  }

  test("jaccardToAnchors: a non-prefix anchor still sees lower-id near-dups") {
    // anchor=4 alone: its near-dup is doc 3, whose id is SMALLER —
    // the old a_id < id join silently lost this pair for any anchor
    // set that is not an id-prefix
    val got = Dedup.jaccardToAnchors(docs, "doc_id", "text",
      col("id") === 4, 0.5).collect()
    assert(got.length === 1)
    assert(got(0).getAs[Long]("a_id") === 4L)
    assert(got(0).getAs[Long]("b_id") === 3L)
    assert(math.abs(got(0).getAs[Double]("jaccard") - 13.0 / 15.0) < 1e-12)
    // anchor–anchor pairs are still reported exactly once, a_id < b_id
    val both = Dedup.jaccardToAnchors(docs, "doc_id", "text",
      col("id") === 3 || col("id") === 4, 0.5).collect()
    assert(both.length === 1)
    assert((both(0).getAs[Long]("a_id"), both(0).getAs[Long]("b_id")) === ((3L, 4L)))
  }

  test("minhashLshPairs recalls planted near-dups and exact dups") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleK = 2, numHashes = 32, bands = 16, threshold = 0.4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))  // exact dup: identical shingles
    assert(pairs.contains((3L, 4L)))  // near dup: high shingle overlap
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("portable MinHash LSH (q69): same mechanics, md5 hash family") {
    // same planted structure as the native-path test: the mechanics
    // (banding recall, verify threshold, skew cull) are hash-agnostic
    val pairs = Dedup.minhashLshPairsPortable(docs, "doc_id", "text",
        shingleK = 2, numHashes = 32, bands = 16, threshold = 0.4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) === 1.0) // exact dup
    assert(pairs.contains((3L, 4L)))                            // near dup
    assert(!pairs.keySet.exists(p => p._1 == 6L || p._2 == 6L))
    // every reported jaccard is the TRUE shingle-set jaccard (the
    // verify stage is exact; only candidate RECALL is probabilistic)
    import graft.functions.TextFunctions._
    val shs = docs.select(col("doc_id"),
        shingles(normalized(col("text")), 2).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    pairs.foreach { case ((a, b), j) =>
      val (sa, sb) = (shs(a).toSet, shs(b).toSet)
      val expect = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(math.abs(expect - j) < 1e-12, s"($a,$b): $expect vs $j")
    }
  }

  test("portable SimHash (q70): planted dups at hamming 0, disjoint docs unpaired") {
    val pairs = Dedup.simhashPairsPortable(docs, "doc_id", "text",
        maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    // identical docs: identical token sets → identical signature
    assert(pairs.get((1L, 2L)) === Some(0))
    // the unrelated doc never pairs
    assert(!pairs.keySet.exists(p => p._1 == 6L || p._2 == 6L))
    // every reported hamming is the true signature distance (verify
    // is exact; banding only gates candidates)
    pairs.values.foreach(h => assert(h >= 0 && h <= 3))
  }

  test("native MinHashSignature is bit-identical to the min-agg formulation") {
    import graft.functions.TextFunctions._
    val numHashes = 32
    // builtin formulation the native expression replaced:
    // explode shingles → min(xxhash64(lit(i), shingle)) per slot
    val sh = docs.select(col("doc_id").as("id"),
      explode(shingles(normalized(col("text")), 2)).as("shingle"))
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    val viaAgg = sh.groupBy(col("id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
      .orderBy("id").as[(Long, Seq[Long])].collect()
    val viaNative = Dedup.minhashSignatures(docs, "doc_id", "text", 2, numHashes)
      .orderBy("id").as[(Long, Seq[Long])].collect()
    assert(viaNative.toSeq === viaAgg.toSeq)
  }

  test("Md5MinHashes kernel ≡ the hex-parse Column derivation") {
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.graft.SignatureExpressions
    val numHashes = 8
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "一番 短い ドキュメント"), (4L, "x")).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id").as("id"),
      shingles(normalized(col("text")), 2).as("sh"))
    // the portable contract, spelled out relationally: one md5 hex per
    // shingle; sig_i = min(h1 + i·h2) over its 56-bit hex halves; hsh
    // = sorted 60-bit prefixes — exactly what the q69/q72 DuckDB
    // oracles compute
    val viaColumns = sh
      .select(col("id"), transform(col("sh"), s => md5(s)).as("hex"))
      .select(col("id"),
        transform(sequence(lit(0), lit(numHashes - 1)), i =>
          array_min(transform(col("hex"), m =>
            conv(substring(m, 1, 14), 16, 10).cast("long") +
              i.cast("long") * conv(substring(m, 15, 14), 16, 10)
                .cast("long")))).as("sig"),
        array_sort(transform(col("hex"), m =>
          conv(substring(m, 1, 15), 16, 10).cast("long"))).as("hsh"))
      .orderBy("id").as[(Long, Seq[Long], Seq[Long])].collect()
    val viaKernel = sh
      .select(col("id"), SignatureExpressions.md5MinHashes(
        col("sh"), numHashes).as("mh"))
      .select(col("id"), col("mh.sig"), col("mh.hsh"))
      .orderBy("id").as[(Long, Seq[Long], Seq[Long])].collect()
    assert(viaKernel.toSeq === viaColumns.toSeq)
  }

  test("Md5SimHash60 kernel ≡ the exploded 60-column sign aggregate") {
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.graft.SimHashExpression
    val toks = docs.select(col("doc_id").as("id"),
      tokenSet(normalized(col("text"))).as("ts"))
    // the relational contract: md5-60 per token, ±1 vote per bit,
    // bit set on sum >= 0 — exactly the q70 oracle's arithmetic
    val sums = (0 until 60).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"s$j"))
    val viaAgg = toks
      .select(col("id"), explode(col("ts")).as("t"))
      .select(col("id"), Dedup.md5Hash60(col("t")).as("h"))
      .groupBy(col("id")).agg(sums.head, sums.tail: _*)
      .select(col("id"), (0 until 60).map(j =>
        when(col(s"s$j") >= 0, lit(1L << j)).otherwise(0L))
        .reduce(_ + _).as("sig"))
      .orderBy("id").as[(Long, Long)].collect()
    val viaKernel = toks
      .select(col("id"), SimHashExpression.md5SimHash60(col("ts")).as("sig"))
      .filter(col("sig").isNotNull)
      .orderBy("id").as[(Long, Long)].collect()
    assert(viaKernel.toSeq === viaAgg.toSeq)
  }

  test("MinHashSignature: empty token set → null (matches groupBy drop)") {
    import org.apache.spark.sql.graft.SignatureExpressions
    val got = Seq((1L, Seq.empty[String]), (2L, Seq("a", "b")))
      .toDF("id", "toks")
      .select(col("id"),
        SignatureExpressions.minhashSignature(col("toks"), 8).as("sig"))
      .orderBy("id").collect()
    assert(got(0).isNullAt(1))
    assert(got(1).getSeq[Long](1).length === 8)
  }

  test("winnowing cull removes boilerplate from numerator AND denominator") {
    // two identical content docs whose text also carries a corpus-wide
    // boilerplate sentence (df above maxDf): with a pre-cull
    // denominator their containment was the fraction of their text
    // that ISN'T chrome (< 1); the culled-index rule scores them 1.0
    val chrome = "subscribe to our newsletter accept all cookies terms of service apply"
    val content = "the migratory patterns of arctic terns span both polar regions yearly"
    val twins = Seq(
      (1L, content + " " + chrome),
      (2L, content + " " + chrome))
    val crowd = (10L until 16L).map(i =>
      (i, s"filler document number $i mentioning nothing shared " + chrome))
    val docs3 = (twins ++ crowd).toDF("doc_id", "text")
    val pairs = Dedup.winnowedOverlapPairs(docs3, "doc_id", "text",
        shingleK = 3, window = 4, minContainment = 0.5, maxDf = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.getAs[Double]("containment"))).toMap
    assert(pairs.contains((1L, 2L)), s"identical twins must pair: $pairs")
    assert(pairs((1L, 2L)) === 1.0,
      s"culled-index containment of identical docs is 1.0, got ${pairs((1L, 2L))}")
  }

  test("winnowing detects containment that whole-doc Jaccard misses") {
    val contained = "pack my box with five dozen liquor jugs before the long summer night ends"
    val container = "completely unrelated preamble text goes here first and then " +
      contained + " with a very long trailing section of additional filler " +
      "words extending the document so the token sets diverge substantially " +
      "making whole document jaccard drop far below any sensible threshold"
    val docs2 = Seq((10L, contained), (11L, container),
      (12L, "sphinx of black quartz judge my vow tonight")).toDF("doc_id", "text")
    val pairs = Dedup.winnowedOverlapPairs(docs2, "doc_id", "text",
        shingleK = 3, window = 4, minContainment = 0.5)
      .collect()
    assert(pairs.length === 1)
    assert((pairs(0).getLong(0), pairs(0).getLong(1)) === ((10L, 11L)))
    assert(pairs(0).getAs[Double]("containment") > 0.8)
    // whole-document Jaccard on the same pair is LOW — the case this
    // operator exists for
    val jac = Dedup.jaccardToAnchors(docs2, "doc_id", "text",
      col("id") === 10, 0.5).collect()
    assert(jac.isEmpty)
  }

  test("winnowing guarantee: shared run ≥ k+w-1 tokens ⇒ shared fingerprint") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    // shares exactly the 8-token run above inside other text; k=3,w=4
    // → guarantee threshold k+w-1 = 6 tokens
    val b = "prefix words " + a + " suffix words"
    val fps = Dedup.winnowedFingerprints(
        Seq((1L, a), (2L, b)).toDF("doc_id", "text"), "doc_id", "text",
        shingleK = 3, window = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty)
  }

  test("native WinnowedMinHashes ≡ array_min(slice(...)) HOF formulation") {
    import org.apache.spark.sql.graft.ArrayExpressions.winnowedMinHashes
    // real documents (sf0.001) + crafted edges: constant array, n < w,
    // n == w, strictly increasing/decreasing, repeated non-adjacent min
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long").as("id"), col("text"))
    val crafted = Seq(
      (9001L, "x x x x x x x x"),              // constant hashes
      (9002L, "one two"),                       // few tokens → n < w
      (9003L, "a b c d"),                       // small n
      (9004L, "a b c a b c a b c")).toDF("id", "text")
    for ((w, k) <- Seq((4, 5), (4, 3), (7, 2), (1, 3))) {
      val hashed = docs.unionByName(crafted)
        .select(col("id"), transform(
          graft.functions.TextFunctions.shingles(
            graft.functions.TextFunctions.normalized(col("text")), k),
          s => xxhash64(s)).as("hs"))
      val mismatches = hashed
        .select(col("id"),
          winnowedMinHashes(col("hs"), w).as("native"),
          array_distinct(transform(
            sequence(lit(0), greatest(size(col("hs")) - w, lit(0))),
            i => array_min(slice(col("hs"), i + 1, lit(w))))).as("hof"))
        .filter(col("native") =!= col("hof"))
        .count()
      assert(mismatches === 0, s"window=$w shingleK=$k")
    }
  }

  test("graft_winnow_mins registered for SQL") {
    GraftSql.registerAll(spark, "/root/testdata/sf0.001")
    val r = spark.sql(
      "SELECT graft_winnow_mins(array(5L, 3L, 4L, 1L, 2L), 2) w")
      .collect()(0).getSeq[Long](0)
    // windows: min(5,3)=3, min(3,4)=3, min(4,1)=1, min(1,2)=1 → [3,1]
    assert(r === Seq(3L, 1L))
  }

  test("simhashPairs finds hamming-close docs, not unrelated ones") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))  // identical token sets → hamming 0
    assert(!pairs.contains((5L, 6L)))
  }

  test("simhashPairs mega-bucket cull: identical-doc pile is dropped, normal pairs survive") {
    // the q19 scale guard: thousands of identical docs share ONE
    // 16-bit bucket in every band — without the cull the self-join on
    // that bucket is quadratic. Plant 60 identical docs with
    // maxBucketSize=50: their bucket is culled in all 4 bands (no
    // pairs, no blow-up) while the unrelated near-dup pair, whose
    // buckets hold ≤ a handful of ids, is still found.
    val mega = (100L until 160L).map(i =>
      (i, "identical boilerplate row repeated across the whole corpus shard"))
    val planted = (mega ++ Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "The quick  BROWN fox jumps over the lazy dog near the river")))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(planted, "doc_id", "text",
        maxHamming = 3, maxBucketSize = 50)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 >= 100L || p._2 >= 100L))
    // and with the default (large) cap the pile IS reported — the cull
    // is a guard, not a semantics change at sane bucket sizes
    val uncapped = Dedup.simhashPairs(planted, "doc_id", "text", maxHamming = 3)
      .count()
    assert(uncapped === 60L * 59 / 2 + 1)
  }

  test("simhash hamming(1,2)=0 and signature is deterministic") {
    val sigs = Dedup.simhashSignatures(docs, "doc_id", "text")
      .orderBy("id").select("sig").as[Long].collect()
    val sigs2 = Dedup.simhashSignatures(docs, "doc_id", "text")
      .orderBy("id").select("sig").as[Long].collect()
    assert(sigs.toSeq === sigs2.toSeq)
    assert(sigs(0) === sigs(1))
  }

  test("dedupSegments drops repeated lines corpus-wide, keeps first occurrence") {
    // doc 1 owns "header boilerplate"; docs 2 and 3 repeat it; doc 3
    // also repeats doc 2's "unique two". Reassembly must preserve each
    // doc's original segment order.
    val pages = Seq(
      (1L, Seq("header boilerplate", "body one")),
      (2L, Seq("header boilerplate", "unique two")),
      (3L, Seq("unique two", "header boilerplate", "tail three")),
      (4L, Seq.empty[String]))
      .toDF("doc_id", "lines")
    val got = Dedup.dedupSegments(pages, "doc_id", col("lines"), sep = "\n")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(got(0) === ((1L, 2L, 2L, "header boilerplate\nbody one")))
    assert(got(1) === ((2L, 2L, 1L, "unique two")))
    assert(got(2) === ((3L, 3L, 1L, "tail three")))
    assert(got(3) === ((4L, 0L, 0L, "")))
  }

  test("dedupSegments survivor rule: earlier (doc, pos) wins within one doc too") {
    val pages = Seq((7L, Seq("x", "y", "x", "x"))).toDF("doc_id", "lines")
    val got = Dedup.dedupSegments(pages, "doc_id", col("lines"))
      .as[(Long, Long, Long, String)].collect()
    assert(got(0) === ((7L, 4L, 2L, "x y")))
  }

  test("dedupSubstrings cuts a repeated span from later docs, first copy intact") {
    val corpus = Seq(
      (1L, "a1 a2 s1 s2 s3 s4 a3 a4"), // owns the span s1..s4
      (2L, "b1 b2 b3 s1 s2 s3 s4 b4"), // repeats it mid-doc → span cut
      (3L, "s1 s2"))                   // shorter than k → untouched
      .toDF("doc_id", "text")
    val got = Dedup.dedupSubstrings(corpus, "doc_id", "text", k = 3)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(got(0) === ((1L, 8L, 8L, "a1 a2 s1 s2 s3 s4 a3 a4")))
    assert(got(1) === ((2L, 8L, 4L, "b1 b2 b3 b4")))
    assert(got(2) === ((3L, 2L, 2L, "s1 s2")))
  }

  test("dedupSubstrings keeps exactly one copy under self-overlap and in-doc repeats") {
    val corpus = Seq(
      (1L, "r r r r r"),          // one gram, overlapping itself
      (2L, "x y z m x y z"))      // same gram twice, disjoint, one doc
      .toDF("doc_id", "text")
    val got = Dedup.dedupSubstrings(corpus, "doc_id", "text", k = 3)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    // canonical window [0,2] is protected; cut windows at 1,2 cover 1..4
    assert(got(0) === ((1L, 5L, 3L, "r r r")))
    assert(got(1) === ((2L, 7L, 4L, "x y z m")))
  }

  test("dedupSubstrings ≡ brute-force reference on a collision-heavy corpus") {
    val k = 3
    val rnd = new scala.util.Random(42)
    val vocab = Vector("v0", "v1", "v2", "v3", "v4")
    val corpus = (0L until 40L).map(i =>
      (i, Seq.fill(8 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")))
    // reference: global first per gram, protect-first / cut-rest
    val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val occ = scala.collection.mutable.Map.empty[String, Vector[(Long, Int)]]
    for ((id, ts) <- toks.toSeq.sortBy(_._1); s <- 0 to ts.length - k)
      occ(ts.slice(s, s + k).mkString(" ")) =
        occ.getOrElse(ts.slice(s, s + k).mkString(" "), Vector.empty) :+ (id, s)
    val expected = corpus.map { case (id, _) =>
      val ts = toks(id)
      val marked = occ.values.filter(_.size > 1).toSeq.flatMap { os =>
        val f = os.min
        os.filter(_._1 == id).map(o => (o._2, o == f))
      }
      val kept = ts.indices.filter(i => !marked.exists {
        case (s, isFirst) => !isFirst && s <= i && i < s + k
      } || marked.exists {
        case (s, isFirst) => isFirst && s <= i && i < s + k
      }).map(ts)
      (id, ts.length.toLong, kept.length.toLong, kept.mkString(" "))
    }
    val got = Dedup.dedupSubstrings(corpus.toDF("doc_id", "text"),
        "doc_id", "text", k)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got === expected)
  }

  test("semanticDedup keeps one representative per planted near-dup group") {
    // Two well-separated clusters; ids 0/1/2 are near-identical
    // (cosine ≈ 1) around axis e0, ids 10/11 near-identical around e1,
    // ids 20/21 are in the e0 cluster but orthogonal-ish to everything.
    def v(axis: Int, eps: Double, at: Int): Seq[Double] =
      Seq.tabulate(8)(i => (if (i == axis) 1.0 else 0.0) +
        (if (i == at) eps else 0.0))
    val vecs = Seq(
      (0L, v(0, 0.01, 3)), (1L, v(0, 0.02, 3)), (2L, v(0, 0.015, 4)),
      (10L, v(1, 0.01, 5)), (11L, v(1, 0.02, 5)),
      (20L, v(6, 0.3, 7)), (21L, v(7, 0.3, 6)))
      .toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(vecs, "vec_id", "embedding",
        threshold = 0.95, nlist = 2, maxCellSize = 100)
      .orderBy("id")
      .as[(Long, Long, Boolean)].collect()
    val byId = got.map(r => r._1 -> r).toMap
    // e0 trio collapses to group 0, survivor 0
    assert(byId(0L)._2 === 0L && byId(0L)._3)
    assert(byId(1L)._2 === 0L && !byId(1L)._3)
    assert(byId(2L)._2 === 0L && !byId(2L)._3)
    // e1 pair collapses to group 10, survivor 10
    assert(byId(10L)._2 === 10L && byId(10L)._3)
    assert(byId(11L)._2 === 10L && !byId(11L)._3)
    // the orthogonal-ish vectors survive as their own groups
    assert(byId(20L)._2 === 20L && byId(20L)._3)
    assert(byId(21L)._2 === 21L && byId(21L)._3)
    // every input vector is accounted for exactly once
    assert(got.length === 7)
  }

  test("semanticDedup with no pairs above threshold keeps everything") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0)),
      (3L, Seq(0.0, 0.0, 1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(vecs, "vec_id", "embedding",
        threshold = 0.99, nlist = 2, maxCellSize = 100)
      .as[(Long, Long, Boolean)].collect()
    assert(got.forall(_._3))
    assert(got.map(_._1).toSet === Set(1L, 2L, 3L))
  }

  test("admitIncrementalSemantic ≡ semanticDedupPortable over corpus ∪ batch (incl. transitive corpus chains)") {
    def v(a: Double, b: Double, c: Double, d: Double) = Seq(a, b, c, d)
    // deduplicated corpus survivors: no within-corpus pairs at 0.95
    val corpus = Seq(
      (1L, v(1.0, 0.05, 0.0, 0.0)),
      (2L, v(0.0, 1.0, 0.05, 0.0)),
      (3L, v(0.6, 0.6, 0.0, 0.1)))
      .toDF("vec_id", "embedding")
    val m = graft.operators.KMeansPortable.trainModel(corpus, k = 2,
      iters = 2)
    // batch: 10 near corpus 1 (reject); 11 novel (admit); 12 near 11
    // (reject — fresh group, 11 is min); 13 novel other cluster
    // (admit); 14 near 10 but NOT near corpus 1 directly — the
    // TRANSITIVE chain corpus1—10—14 must reject BOTH (the
    // corpus-touching component rule, not a direct-pair rule)
    val batch = Seq(
      (10L, v(1.0, 0.055, 0.0, 0.0)),
      (11L, v(0.0, 0.05, 1.0, 0.3)),
      (12L, v(0.0, 0.05, 1.0, 0.31)),
      (13L, v(0.0, 1.0, 0.5, 0.0)),
      (14L, v(1.0, 0.06, 0.001, 0.0)),
      (15L, v(1.0, 0.07, 0.0, 0.002)))
      .toDF("vec_id", "embedding")
    def twinAdmitted(maxCell: Int): Set[Long] = {
      val union = corpus.unionByName(batch)
      val groups = Dedup.semanticDedupPortable(union, m.centroids, 0.95,
        maxCellSize = maxCell)
      val corpusGroups = groups.filter(col("id") <= 3L)
        .select(col("group_id")).distinct()
      groups.filter(col("id") > 3L && col("keep"))
        .join(corpusGroups, Seq("group_id"), "left_anti")
        .select("id").as[Long].collect().toSet
    }
    val got = Dedup.admitIncrementalSemantic(batch, corpus, m.centroids,
        threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(got === twinAdmitted(10000))
    assert(got === Set(11L, 13L))
    // SKEWED culled cell: 9 union vectors in 2 cells keeps the
    // expected population (4) inside maxCellSize = 4 (the scale
    // contract passes) but the e0-adjacent cell actually holds 7
    // (1, 3, 10, 11, 12, 14, 15 — verified assignment) — it is
    // culled, its members pair with nothing in BOTH formulations,
    // so its fresh vectors ADMIT (including 10/14/15, which would
    // otherwise reject against corpus 1, and 12, which would
    // otherwise reject against 11); the equivalence must hold
    // through the cull too
    val culled = Dedup.admitIncrementalSemantic(batch, corpus,
        m.centroids, threshold = 0.95, maxCellSize = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(culled === twinAdmitted(4))
    assert(culled === Set(10L, 11L, 12L, 13L, 14L, 15L))
    // negative id fails loudly (the disjoint-key-space precondition)
    val bad = Seq((-5L, v(1.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Dedup.admitIncrementalSemantic(bad, corpus, m.centroids, 0.95)
        .collect()
    }
    assert(e.getMessage.contains("non-negative"))
  }

  test("auto-structure dispatch: flat at the boundary, two-level past it, dispatcher ≡ the explicit paths") {
    import graft.operators.KMeansPortable
    // the boundary is pure arithmetic — pin it directly
    assert(KMeansPortable.autoNlist(512, 4) === 128)
    assert(KMeansPortable.autoNlist(513, 4) === 129)
    assert(KMeansPortable.FlatAutoMaxNlist === 128)
    // past the two-level clamp the auto path still clamps loudly-
    // documentedly (the third-level regime), never overflows
    assert(KMeansPortable.autoNlist(Long.MaxValue / 2, 4)
      === KMeansPortable.MaxAutoNlistTwoLevel)
    // deterministic corpus with one planted near-dup pair; sizes
    // straddle the dispatch boundary at targetCellSize = 4
    val r = new scala.util.Random(11)
    def corpus(n: Int) = {
      val base = (0 until n - 2).map(i =>
        (i.toLong, Seq.fill(4)(r.nextDouble() * 2 - 1)))
      val v = Seq.fill(4)(r.nextDouble() * 2 - 1)
      (base :+ (n - 2L, v) :+ (n - 1L, v.updated(0, v.head + 1e-4)))
        .toDF("vec_id", "embedding")
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(_.toSeq).toSeq
    // n = 512 → auto nlist 128 = the boundary → FLAT: the dispatcher
    // must reproduce the explicit flat-portable path exactly
    val at = corpus(512).cache()
    val flatModel = KMeansPortable.trainModel(at, k = 128, iters = 3)
    assert(rows(Dedup.semanticDedupAuto(at, 0.999, targetCellSize = 4))
      === rows(Dedup.semanticDedupPortable(at, flatModel.centroids, 0.999)))
    // n = 520 → auto nlist 130 > 128 → TWO-LEVEL: the dispatcher must
    // reproduce the explicit two-level path exactly
    val past = corpus(520).cache()
    val tlModel = KMeansPortable.trainTwoLevel(past, nlist = 130,
      iters = 3)
    // threshold 0.999: random dim-4 cosines routinely exceed 0.9, so a
    // looser cut would chain unplanted pairs and hide the planted one
    val auto = rows(Dedup.semanticDedupAuto(past, 0.999, targetCellSize = 4))
    assert(auto === rows(Dedup.semanticDedupTwoLevel(past, tlModel, 0.999)))
    // the planted pair collapses on the two-level path too
    val dup = auto.find(_.head == 519L).get
    assert(dup(1) === 518L && dup(2) == false)
    at.unpersist(); past.unpersist()
  }

  test("semanticDedupAuto THIRD tier: past relationalPastNlist the door dedups over the relational structure ≡ the manual calls") {
    import graft.operators.{Dedup, SimilaritySearch}
    val r = new scala.util.Random(11)
    def corpus(n: Int) = {
      val base = (0 until n - 2).map(i =>
        (i.toLong, Seq.fill(4)(r.nextDouble() * 2 - 1)))
      val v = Seq.fill(4)(r.nextDouble() * 2 - 1)
      (base :+ (n - 2L, v) :+ (n - 1L, v.updated(0, v.head + 1e-4)))
        .toDF("vec_id", "embedding")
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(_.toSeq).toSeq
    // unclamped auto nlist 130 > the lowered dispatch bound 128 →
    // the relational tier fires at gate scale (production keeps the
    // clamp default; the knob exists for exactly this parity)
    val past = corpus(520).cache()
    val door = rows(Dedup.semanticDedupAuto(past, 0.999,
      targetCellSize = 4, relationalPastNlist = 128))
    val rel = SimilaritySearch.trainThreeLevel(past, 130, iters = 3)
    assert(door === rows(
      Dedup.semanticDedupRelational(past, rel, 0.999)))
    // the planted pair still collapses through the relational cells
    // (same COMPONENT — under these cells a rare random ≥0.999 pair
    // may chain more members in, moving the min-id survivor, so the
    // assertion is membership, not the exact group id)
    val g519 = door.find(_.head == 519L).get
    val g518 = door.find(_.head == 518L).get
    assert(g519(1) === g518(1) && g519(2) == false)
    past.unpersist()
  }

  test("admitIncrementalSemanticTwoLevel ≡ semanticDedupTwoLevel over corpus ∪ batch") {
    def v(a: Double, b: Double, c: Double, d: Double) = Seq(a, b, c, d)
    val corpus = Seq(
      (1L, v(1.0, 0.05, 0.0, 0.0)),
      (2L, v(0.0, 1.0, 0.05, 0.0)),
      (3L, v(0.6, 0.6, 0.0, 0.1)))
      .toDF("vec_id", "embedding")
    val m = graft.operators.KMeansPortable.trainTwoLevel(corpus,
      nlist = 2, iters = 2)
    // same planted structure as the flat spec: 10 near corpus 1
    // (reject), 11 novel (admit), 12 near 11 (reject), 13 novel
    // (admit), 14 transitively corpus-touching via 10 (reject)
    val batch = Seq(
      (10L, v(1.0, 0.055, 0.0, 0.0)),
      (11L, v(0.0, 0.05, 1.0, 0.3)),
      (12L, v(0.0, 0.05, 1.0, 0.31)),
      (13L, v(0.0, 1.0, 0.5, 0.0)),
      (14L, v(1.0, 0.06, 0.001, 0.0)))
      .toDF("vec_id", "embedding")
    val union = corpus.unionByName(batch)
    val groups = Dedup.semanticDedupTwoLevel(union, m, 0.95)
    val corpusGroups = groups.filter(col("id") <= 3L)
      .select(col("group_id")).distinct()
    val twin = groups.filter(col("id") > 3L && col("keep"))
      .join(corpusGroups, Seq("group_id"), "left_anti")
      .select("id").as[Long].collect().toSet
    val got = Dedup.admitIncrementalSemanticTwoLevel(batch, corpus, m,
        threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(got === twin)
    assert(got === Set(11L, 13L))
  }
}
