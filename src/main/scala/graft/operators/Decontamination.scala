package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that contain
  * n-gram overlap with an evaluation/benchmark corpus, the standard
  * pre-training hygiene step (n-gram collision scrubbing à la GPT-3
  * appendix C / PaLM / Llama; typically n = 8..13 on real corpora).
  *
  * Shape at 100 TB: benchmark suites are SMALL (milions of n-grams at
  * most) and the corpus is huge, so the n-gram index of the benchmark
  * side builds once (distinct md5 of each n-token window) and the
  * join is an equi-join on the gram hash that AQE broadcasts when the
  * suite fits — the corpus side never shuffles its text, only
  * (doc_id, gram_hash) pairs, and docs with zero hits drop at the
  * join (the common case: contamination is rare). The gram hash is
  * md5 so the flag decision is auditable by any engine (same
  * discipline as the sampling thresholds).
  *
  * Returns one row per CONTAMINATED doc: (doc_id, n_hits — distinct
  * benchmark grams seen in the doc, n_grams — the doc's distinct
  * gram count, contamination — n_hits/n_grams rounded to 6). Docs
  * shorter than n tokens have no n-grams and cannot be flagged.
  */
object Decontamination {

  /** Distinct md5 hashes of every n-token window (empty below n
    * tokens — see [[graft.functions.TextFunctions.ngrams]]).
    * Carried as the 16 raw digest BYTES (unhex), not the 32-char hex
    * string: the gram relation is what shuffles in the join, so the
    * key width is the shuffle payload — same derivation, same
    * auditability (any engine re-computes md5 and unhexes), half the
    * bytes on the wire.
    */
  def gramHashes(text: Column, n: Int): Column =
    array_distinct(transform(
      graft.functions.TextFunctions.ngrams(text, n), g => unhex(md5(g))))

  /** The benchmark-side gram index: distinct md5 gram hashes. Built
    * once; at 100 TB this is the small static relation every
    * ingest batch (or stream) joins against.
    */
  def benchIndex(benchmark: DataFrame, textCol: String, n: Int): DataFrame =
    benchmark
      .select(explode(gramHashes(col(textCol), n)).as("g"))
      .distinct()

  /** Streaming-compatible flagging against a pre-built gram index —
    * ONE pass: the doc's total gram count rides alongside the
    * exploded grams through the join, so no second input pass and no
    * join back onto the (possibly streaming) source. NOTE for batch:
    * carrying size() next to explode() evaluates the gram transform
    * twice inside one task pipeline, measured ~1.6× SLOWER at sf0.1
    * than [[flagContaminated]]'s two independent scans (which
    * parallelize across stages) — use this only where the input
    * cannot be scanned twice (streams).
    */
  def flagWithIndex(docs: DataFrame, benchGrams: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        gramHashes(col(textCol), n).as("grams"))
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"),
        explode(col("grams")).as("g"))
      .join(benchGrams, "g")
      .groupBy(col("doc_id"), col("n_grams"))
      .agg(count(lit(1)).as("n_hits"))
      .select(col("doc_id"), col("n_hits"), col("n_grams"),
        round(col("n_hits").cast("double") / col("n_grams").cast("double"), 6)
          .as("contamination"))

  /** Fuzzy (MinHash-similarity) decontamination — catches
    * near-verbatim benchmark leakage that exact n-gram collision
    * misses: reformatting or a one-word edit breaks every n-token
    * window (spec pins exactly that case) while the shingle Jaccard
    * barely moves. This is the fuzzy decon pass of the Llama/OLMo
    * lineage, the directed sibling of [[Dedup.minhashLshPairs]].
    *
    * Shape at 100 TB: the benchmark side is TINY, so its banded
    * signature relation and hashed shingle sets both BROADCAST — the
    * training corpus never shuffles. Candidates fall out of a
    * broadcast equi-join on (band, bucket); only candidates pay the
    * exact-Jaccard verify, with the bench shingle sets again on the
    * broadcast side. Training text never leaves its executor: the
    * moving relations are all ids + longs.
    *
    * Returns one row per contaminated train doc:
    * (doc_id, bench_id — the most-similar flagging bench doc, ties
    * broken toward the larger id, jaccard rounded to 6).
    */
  def fuzzyContaminated(train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, shingleK: Int = 2,
      numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    import graft.functions.TextFunctions.{normalized, shingles}
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    def base(df: DataFrame) = df.select(col(idCol).as("id"),
        shingles(normalized(col(textCol)), shingleK).as("sh"))
      .select(col("id"),
        org.apache.spark.sql.graft.SignatureExpressions.minhashSignature(
          col("sh"), numHashes).as("sig"),
        array_sort(transform(col("sh"), s => xxhash64(s))).as("hsh"))
    def banded(df: DataFrame) = df.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * r + 1, lit(r)))))
        .as(Seq("band", "bucket")))
    // train signatures are consumed twice (banding + verify join-back);
    // ensureWide: the signature projection is the CPU cost and a small
    // corpus scans as one partition (see Par)
    val trainBase = graft.CacheScope.track(base(Par.ensureWide(train)))
    val benchBase = base(Par.ensureWide(bench))
    val cands = banded(trainBase)
      .join(broadcast(banded(benchBase)
          .select(col("id").as("bench_id"), col("band"), col("bucket"))),
        Seq("band", "bucket"))
      .select(col("id").as("doc_id"), col("bench_id")).distinct()
    cands
      .join(trainBase.select(col("id").as("doc_id"), col("hsh").as("t_sh")),
        "doc_id")
      .join(broadcast(benchBase
          .select(col("id").as("bench_id"), col("hsh").as("b_sh"))),
        "bench_id")
      .withColumn("inter", org.apache.spark.sql.graft.ArrayExpressions
        .sortedIntersectCount(col("t_sh"), col("b_sh")))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("t_sh")) + size(col("b_sh")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("doc_id"))
      .agg(max(struct(round(col("jaccard"), 6).as("jaccard"),
        col("bench_id").as("bench_id"))).as("f"))
      .select(col("doc_id"), col("f.bench_id").as("bench_id"),
        col("f.jaccard").as("jaccard"))
  }

  /** Fuzzy decontamination with ENGINE-PORTABLE hashing — the
    * verification twin of [[fuzzyContaminated]], completing the
    * q69/q70/q71 playbook for the last LSH *application*: every hash
    * derives from ONE md5 digest per shingle (double-hashing
    * signature family `h1 + i·h2`, as in
    * [[Dedup.minhashLshPairsPortable]]; band buckets md5 of the
    * comma-joined slice), so a SQL engine re-derives the signatures,
    * the directed banded candidates, the verified Jaccard AND the
    * per-doc argmax value-for-value (q72 full oracle). Same directed
    * shape as the native path: the bench side broadcasts, the
    * training corpus never shuffles text.
    */
  def fuzzyContaminatedPortable(train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, shingleK: Int = 2,
      numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    import graft.functions.TextFunctions.{normalized, shingles}
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // ONE md5 digest per shingle, double-hashing signature family
    // (h1 + i·h2 — Kirsch & Mitzenmacher; the fused Md5MinHashes
    // kernel, same derivation as minhashLshPairsPortable);
    // array_distinct on the sorted hsh preserves order, matching the
    // previous sort∘distinct
    def base(df: DataFrame) = df.select(col(idCol).as("id"),
        org.apache.spark.sql.graft.SignatureExpressions.md5MinHashes(
          shingles(normalized(col(textCol)), shingleK), numHashes).as("mh"))
      .select(col("id"), col("mh.sig").as("sig"),
        array_distinct(col("mh.hsh")).as("hsh"))
    def banded(df: DataFrame) = df.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        md5(array_join(slice(col("sig"), b * r + 1, lit(r)), ","))))
        .as(Seq("band", "bucket")))
    // ensureWide matters MOST here: the salted-md5 signatures are
    // ~33 crypto hashes per shingle, and a one-partition scan
    // serializes all of it on one core (measured 10.6 s → ~2.5 s at
    // sf0.1 on 32 cores)
    val trainBase = graft.CacheScope.track(base(Par.ensureWide(train)))
    val benchBase = base(Par.ensureWide(bench))
    val cands = banded(trainBase)
      .join(broadcast(banded(benchBase)
          .select(col("id").as("bench_id"), col("band"), col("bucket"))),
        Seq("band", "bucket"))
      .select(col("id").as("doc_id"), col("bench_id")).distinct()
    cands
      .join(trainBase.select(col("id").as("doc_id"), col("hsh").as("t_sh")),
        "doc_id")
      .join(broadcast(benchBase
          .select(col("id").as("bench_id"), col("hsh").as("b_sh"))),
        "bench_id")
      .withColumn("inter", org.apache.spark.sql.graft.ArrayExpressions
        .sortedIntersectCount(col("t_sh"), col("b_sh")))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("t_sh")) + size(col("b_sh")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("doc_id"))
      .agg(max(struct(round(col("jaccard"), 6).as("jaccard"),
        col("bench_id").as("bench_id"))).as("f"))
      .select(col("doc_id"), col("f.bench_id").as("bench_id"),
        col("f.jaccard").as("jaccard"))
  }

  /** SEMANTIC decontamination — the embedding sibling of the exact
    * n-gram (q49) and fuzzy MinHash (q67/q72) scrubs, closing the
    * modality triangle the dedup family already has: flag every
    * corpus item whose EMBEDDING is a semantic near-dup of a
    * held-out benchmark item, so paraphrased or translated test
    * leakage that no token-level scrub can see still surfaces
    * (the motivation of SemDeDup §5 and the decontamination
    * discussions in Gopher/Llama appendices: token overlap misses
    * reworded contamination).
    *
    * Mechanics are SemDeDup's, composed from the single-sited
    * portable pieces, so the whole pipeline sits under one oracle
    * (q86): both sides cell-assign against the SAME trained centroid
    * matrix ([[KMeansPortable.assignCells]] — the q76/q78/q80
    * arithmetic), candidates are corpus × bench WITHIN a cell only,
    * scored by the rounded decimal cosine. Unlike the dedup path
    * there is deliberately NO oversized-cell cull: dropping a hot
    * cell would silently skip contamination checks, and the join
    * fan-out is bounded by the BENCH side (a benchmark suite is
    * small by nature — it broadcasts), not by the corpus.
    *
    * The within-cell restriction is the SemDeDup approximation: a
    * contaminated pair whose members quantize to different cells is
    * missed (recall, like SemDeDup's, is governed by nlist and the
    * training fit — spec-pinned with planted cross-subset near-dups;
    * nlist = 1 degenerates to the exhaustive scan).
    *
    * Output: one row per CORPUS item — (id, n_hits, max_score,
    * flagged); max_score is null when nothing matched.
    *
    * The bench side broadcasts — but behind the same bounded-broadcast
    * guard as the anchor paths (ADVICE r8 discipline): a "benchmark"
    * argument that unexpectedly carries a corpus-sized relation must
    * not build an unbounded driver broadcast. Mechanics and the
    * probe-not-cached-base subtlety are single-sited in
    * [[Par.boundedBroadcast]] (a dodge-column probe counted through
    * a pushed LIMIT; above the cap, a plain hash-partitioned cell
    * join). `maxBroadcastBench` is parameterized so the fallback
    * path is spec-exercisable (cap = 0).
    */
  def semanticDecontaminate(corpus: DataFrame, bench: DataFrame,
      centroids: Array[Array[Double]], threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBroadcastBench: Int = 100000,
      maxExpectedCellSize: Long = 10000L): DataFrame = {
    import org.apache.spark.sql.graft.RhpExpressions
    require(centroids.nonEmpty)
    // Scale contract (VERDICT r9 item 1): this path deliberately has
    // NO oversized-cell cull (a culled cell would skip contamination
    // checks), so a quantizer too coarse for the corpus is the
    // uncullable O(|corpus|·|bench|/nlist) blow-up — the q86 sibling
    // of the measured α 1.92 fixed-nlist quadratic (SCALE.md). Fail
    // loudly instead; train with KMeansPortable.nlistFor-many
    // centroids to be in-contract by construction. Cost: one
    // count-only scan of the corpus relation (column-pruned to the
    // id), a separate job that leaves the result plan untouched.
    KMeansPortable.requireBoundedCells("semanticDecontaminate",
      corpus.select(col(idCol)).count(), centroids.length,
      maxExpectedCellSize)
    def assigned(df: DataFrame): DataFrame =
      KMeansPortable.assignCells(
        Par.ensureWide(df)
          .select(col(idCol).cast("long").as("id"),
            col(vecCol).cast("array<double>").as("vec"))
          .withColumn("n2",
            RhpExpressions.decimalScaledDot(col("vec"), col("vec"))),
        centroids)
    decontaminateAssigned(assigned(corpus), assigned(bench), bench,
      threshold, maxBroadcastBench)
  }

  /** Semantic decontamination over a TWO-LEVEL quantizer — the q86
    * operator at the [[KMeansPortable.trainTwoLevel]] structure, for
    * the corpus-sized-nlist regime where the flat argmin is the
    * measured assignment bottleneck (SCALE.md round 10: 1075.8 s →
    * 285.7 s at 100×; decontamination shares the shape). Same
    * NO-CULL contract as the flat path. Rows either side routes to a
    * CHILDLESS super land in the per-super pseudo-cell — shared by
    * construction across the two sides, so a bench row and a corpus
    * row in the same empty-in-training coarse region still meet in
    * the join: the conservative direction (a check can only be
    * ADDED, never skipped). Tail is the single-sited helper.
    */
  def semanticDecontaminateTwoLevel(corpus: DataFrame, bench: DataFrame,
      model: KMeansPortable.TwoLevelModel, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBroadcastBench: Int = 100000,
      maxExpectedCellSize: Long = 10000L): DataFrame = {
    import org.apache.spark.sql.graft.RhpExpressions
    require(model.nlist > 0)
    KMeansPortable.requireBoundedCells("semanticDecontaminateTwoLevel",
      corpus.select(col(idCol)).count(), model.nlist,
      maxExpectedCellSize)
    def assigned(df: DataFrame): DataFrame =
      KMeansPortable.assignCellsTwoLevel(
        Par.ensureWide(df)
          .select(col(idCol).cast("long").as("id"),
            col(vecCol).cast("array<double>").as("vec"))
          .withColumn("n2",
            RhpExpressions.decimalScaledDot(col("vec"), col("vec"))),
        model)
    decontaminateAssigned(assigned(corpus), assigned(bench), bench,
      threshold, maxBroadcastBench)
  }

  /** The shared decontamination tail: bounded-broadcast bench side,
    * LEFT cell join + conditional aggregation. Single-sited so the
    * flat and two-level assignment paths cannot drift in
    * score/hit/flag semantics (the semanticDedupFromAssigned
    * pattern). `c`/`b0` must carry (id, vec, n2, cell). */
  private def decontaminateAssigned(c: DataFrame, b0: DataFrame,
      bench: DataFrame, threshold: Double,
      maxBroadcastBench: Int): DataFrame = {
    import org.apache.spark.sql.graft.RhpExpressions
    val b = b0.select(col("cell"), col("id").as("bench_id"),
      col("vec").as("b_vec"), col("n2").as("b_n2"))
    val benchSide = Par.boundedBroadcast(b,
      bench.select(lit(1).as("__bench_probe")), maxBroadcastBench)
    // LEFT join + conditional aggregation, not aggregate-then-rejoin:
    // clean corpus rows ride through the same single shuffle as hits
    // (a second corpus-keyed join for the zero rows would be an SMJ
    // the static planner cannot avoid — and a broadcast of the hit
    // relation would be unbounded in the all-contaminated worst case)
    c.join(benchSide, Seq("cell"), "left")
      .withColumn("score", when(col("bench_id").isNotNull, round(
        RhpExpressions.decimalScaledDot(col("vec"), col("b_vec")) /
          (sqrt(col("n2")) * sqrt(col("b_n2"))), 6)))
      .withColumn("hit", col("score") >= threshold)
      .groupBy(col("id"))
      .agg(count(when(col("hit"), lit(1))).as("n_hits"),
        max(when(col("hit"), col("score"))).as("max_score"))
      .select(col("id"), col("n_hits"), col("max_score"),
        (col("n_hits") > 0L).as("flagged"))
  }

  def flagContaminated(docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val grams = docs.select(col(idCol).as("doc_id"),
        explode(gramHashes(col(textCol), n)).as("g"))
    val benchGrams = benchIndex(benchmark, textCol, n)
    val perDoc = docs.select(col(idCol).as("doc_id"),
      size(gramHashes(col(textCol), n)).cast("long").as("n_grams"))
    grams.join(benchGrams, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
      .join(perDoc, "doc_id")
      .select(col("doc_id"), col("n_hits"), col("n_grams"),
        round(col("n_hits").cast("double") / col("n_grams").cast("double"), 6)
          .as("contamination"))
  }
}
