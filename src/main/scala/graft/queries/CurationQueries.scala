package graft.queries

import graft.Tables
import graft.functions.TextFunctions.{tokenCount, tokens}
import graft.operators.{Packing, Sampling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation suite: deterministic sampling, mixture
  * rebalancing, sequence packing, and mergeable-sketch cardinality —
  * the operations between deduplication and shard writing in a
  * training-data pipeline.
  *
  * q45/q46 are fully oracle-backed: the md5-hex-threshold sample and
  * the integer-quota mixture are bit-reproducible in any engine with
  * md5 (that is the point of deterministic curation — an auditor can
  * re-derive exactly which rows a 100 TB run kept). q47 (packing) and
  * q48 (HLL sketches) have no SQL oracle — packing is an imperative
  * per-shard decision and sketch bytes are engine-specific — so both
  * are rows-only with invariant/error-bound specs (PackingSpec,
  * SketchSpec).
  */
object CurationQueries {

  /** q45: per-language deterministic downsampling (keep all zh, half
    * de, a quarter of en, three quarters of everything else) — a pure
    * zero-shuffle filter; thresholds are compile-time hex literals.
    */
  private def q45(s: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSample(Tables(s, dir).documents, "lang",
        Map("en" -> 0.25, "de" -> 0.5, "zh" -> 1.0),
        defaultRate = 0.75, idCol = "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  // thresholds: 0.25->40000000 0.5->80000000 0.75->c0000000 1.0->keep
  // (Sampling.hexThreshold; 'g' sorts above every hex digit)
  private val q45Sql =
    """SELECT doc_id, lang, source, n_chars FROM documents
      |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
      |  CASE lang WHEN 'zh' THEN 'g' WHEN 'en' THEN '40000000'
      |    WHEN 'de' THEN '80000000' ELSE 'c0000000' END
      |ORDER BY doc_id""".stripMargin

  /** q46: rebalance sources to a 2:1:1 target mixture. All quota math
    * is integer (rational targets), selection is md5-rank order —
    * bit-reproducible cross-engine, nested under target changes.
    */
  private def q46(s: SparkSession, dir: String): DataFrame =
    Sampling.mixtureRebalance(Tables(s, dir).documents, "source",
        Map("src0" -> 2, "src1" -> 1, "src2" -> 1), idCol = "doc_id")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  private val q46Sql =
    """WITH tagged AS (
      |  SELECT doc_id, lang, source,
      |    CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 1
      |      WHEN 'src2' THEN 1 END AS num
      |  FROM documents
      |  WHERE source IN ('src0', 'src1', 'src2')),
      |counts AS (SELECT source, num, count(*) AS cnt FROM tagged GROUP BY 1, 2),
      |t AS (SELECT min(cnt * 4 // num) AS t FROM counts),
      |quotas AS (SELECT source, num * t.t // 4 AS quota FROM counts, t),
      |ranked AS (
      |  SELECT doc_id, lang, source, row_number() OVER (
      |    PARTITION BY source
      |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM tagged)
      |SELECT r.doc_id, r.lang, r.source
      |FROM ranked r JOIN quotas q USING (source)
      |WHERE r.rk <= q.quota
      |ORDER BY r.doc_id""".stripMargin

  /** q81: temperature-smoothed mixture (α = 1/2) over languages —
    * kept shares follow sqrt(n_lang), the mBERT/XLM-R/mT5 smoothing.
    * FULL oracle: sqrt is the one correctly-rounded power, so the
    * integer-scaled weights and every quota re-derive exactly
    * (see [[graft.operators.Sampling.temperatureRebalance]]).
    */
  private def q81(s: SparkSession, dir: String): DataFrame =
    Sampling.temperatureRebalance(Tables(s, dir).documents, "lang",
        idCol = "doc_id")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  private val q81Sql =
    """WITH counts AS (
      |  SELECT lang, count(*) AS n FROM documents GROUP BY lang),
      |wts AS (
      |  SELECT lang, n,
      |    CAST(round(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS w
      |  FROM counts),
      |s AS (SELECT CAST(sum(w) AS HUGEINT) AS s FROM wts),
      |t AS (SELECT min(n * s.s // w) AS t FROM wts, s),
      |quotas AS (
      |  SELECT lang, (w * t.t) // s.s AS quota FROM wts, s, t),
      |ranked AS (
      |  SELECT doc_id, lang, source, row_number() OVER (
      |    PARTITION BY lang
      |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |SELECT r.doc_id, r.lang, r.source
      |FROM ranked r JOIN quotas q
      |  ON r.lang IS NOT DISTINCT FROM q.lang
      |WHERE r.rk <= q.quota
      |ORDER BY r.doc_id""".stripMargin

  /** q82: UniMax budget allocation over languages (Chung et al.,
    * ICLR 2023) at a 4/5-corpus budget — the fair water-filling
    * alternative to q81's power smoothing: small languages keep
    * everything, the surplus redistributes, the dominant language
    * absorbs the remainder. The budget straddles the per-language
    * counts at every SF so BOTH walk branches (keep-all vs truncate)
    * are exercised. FULL oracle: the ascending walk is integer
    * arithmetic over L scalar states, replayed by a recursive CTE.
    */
  private def q82(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir).documents
    // budget = 4/5 of the corpus, derived from the walk's own
    // per-domain counts — no separate count() scan (review r8)
    Sampling.unimaxRebalanceFraction(d, "lang", idCol = "doc_id",
        budgetNum = 4, budgetDenom = 5)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  private val q82Sql =
    """WITH RECURSIVE b AS (
      |  SELECT count(*) * 4 // 5 AS b FROM documents),
      |counts AS (
      |  SELECT lang, count(*) AS n FROM documents GROUP BY lang),
      |ordered AS (
      |  SELECT lang, n, row_number() OVER (ORDER BY n, lang) AS i,
      |    count(*) OVER () AS l
      |  FROM counts),
      |walk(i, lang, q, brem, lrem) AS (
      |  SELECT o.i, o.lang, least(o.n, b.b // o.l),
      |    b.b - least(o.n, b.b // o.l), o.l - 1
      |  FROM ordered o, b WHERE o.i = 1
      |  UNION ALL
      |  SELECT o.i, o.lang, least(o.n, w.brem // w.lrem),
      |    w.brem - least(o.n, w.brem // w.lrem), w.lrem - 1
      |  FROM walk w JOIN ordered o ON o.i = w.i + 1
      |  WHERE w.lrem > 0),
      |ranked AS (
      |  SELECT doc_id, lang, source, row_number() OVER (
      |    PARTITION BY lang
      |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |SELECT r.doc_id, r.lang, r.source
      |FROM ranked r JOIN walk w
      |  ON r.lang IS NOT DISTINCT FROM w.lang
      |WHERE r.rk <= w.q
      |ORDER BY r.doc_id""".stripMargin

  /** q47: pack documents into 512-token training sequences (16
    * deterministic shards, FFD within shard). Rows-only: the packing
    * invariants (every doc exactly once, no bin over capacity unless
    * oversize, FFD bin-count bound) are pinned by PackingSpec.
    */
  private def q47(s: SparkSession, dir: String): DataFrame =
    Packing.packSequences(Tables(s, dir).documents, "doc_id",
        tokenCount(col("text")), maxTokens = 512, numShards = 16)
      .toDF()
      .orderBy(col("doc_id"))

  /** q79: the PORTABLE packing twin of q47 — identical FFD kernel,
    * md5-prefix shard hash instead of xxhash64 (the one q47
    * ingredient a SQL engine could not re-derive). The oracle replays
    * first-fit-decreasing doc-by-doc with a recursive CTE carrying
    * each shard's bin-fill list — feasible because packing is
    * BOUNDED PER SHARD by construction (the same property that makes
    * the operator scale: the recursion depth is docs-per-shard, never
    * corpus size). Closes the last rows-only query without a
    * portable twin (VERDICT r7 item 2).
    */
  private def q79(s: SparkSession, dir: String): DataFrame =
    Packing.packSequencesPortable(Tables(s, dir).documents, "doc_id",
        tokenCount(col("text")), maxTokens = 512, numShards = 16)
      .toDF()
      .orderBy(col("doc_id"))

  private val q79Sql =
    """WITH RECURSIVE docs AS (
      |  SELECT doc_id,
      |    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |      AS BIGINT) % 16 AS INTEGER) AS shard,
      |    CAST(length(list_filter(regexp_split_to_array(trim(text), '\s+'),
      |      x -> length(x) > 0)) AS INTEGER) AS weight
      |  FROM documents),
      |ordered AS (
      |  SELECT doc_id, shard, weight, row_number() OVER (
      |    PARTITION BY shard ORDER BY weight DESC, doc_id) AS rn
      |  FROM docs),
      |walk(shard, rn, doc_id, weight, bin, fills) AS (
      |  SELECT shard, rn, doc_id, weight, 1, [weight]
      |  FROM ordered WHERE rn = 1
      |  UNION ALL
      |  SELECT t.shard, t.rn, t.doc_id, t.weight,
      |    coalesce(t.fit, len(t.fills) + 1),
      |    CASE WHEN t.fit IS NULL THEN list_append(t.fills, t.weight)
      |         ELSE list_transform(range(1, len(t.fills) + 1),
      |           i -> CASE WHEN i = t.fit THEN t.fills[i] + t.weight
      |                     ELSE t.fills[i] END) END
      |  FROM (
      |    SELECT w.fills, d.shard, d.rn, d.doc_id, d.weight,
      |      CASE WHEN d.weight > 512 THEN NULL
      |           ELSE list_filter(range(1, len(w.fills) + 1),
      |             i -> w.fills[i] + d.weight <= 512)[1] END AS fit
      |    FROM walk w JOIN ordered d ON d.shard = w.shard
      |      AND d.rn = w.rn + 1) t)
      |SELECT doc_id, shard, CAST(bin - 1 AS INTEGER) AS bin, weight,
      |  CAST(sum(weight) OVER (PARTITION BY shard, bin) AS INTEGER)
      |    AS bin_fill,
      |  weight > 512 AS oversize
      |FROM walk
      |ORDER BY doc_id""".stripMargin

  /** q48: per-language distinct-token cardinality via MERGEABLE HLL
    * sketches — per-(lang, source) partial sketches union'd up to
    * language level, the two-level rollup a 100 TB corpus profile
    * runs (partials merge across executors/days without re-reading
    * text). Rows-only: sketch bytes are engine-specific; SketchSpec
    * pins the estimates against exact distinct counts.
    */
  private def q48(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir).documents
    val partials = d
      .select(col("lang"), col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("lang"), col("source"))
      .agg(hll_sketch_agg(col("tok"), lit(12)).as("sketch"),
        count(lit(1)).as("n_toks"))
    partials.groupBy(col("lang"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
          .as("est_distinct_tokens"),
        sum(col("n_toks")).as("total_tokens"),
        count(lit(1)).as("n_partials"))
      .orderBy(col("lang"))
  }

  /** q75: the PORTABLE HyperLogLog twin of q48 — per-language
    * distinct-token estimates whose ENTIRE derivation (md5-60 token
    * hashes, 1024 bucket addresses, leading-zero ranks via binary
    * string length, max-merged registers, the integer-scaled harmonic
    * sum, and the linear-counting branch) re-derives in DuckDB, so
    * the estimates hash-match value-for-value. The Spark side
    * deliberately runs TWO-LEVEL ((lang, source) partials max-merged
    * to lang — the 100 TB rollup path) while the oracle computes
    * single-level: max-associativity makes them identical, which is
    * exactly the mergeability claim q48's engine-specific sketch
    * bytes could never let an oracle verify.
    */
  private def q75(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir).documents
    val toks = d.select(col("lang"), col("source"),
      explode(tokens(col("text"))).as("tok"))
    val partials = graft.operators.PortableHll.registers(
      toks, Seq("lang", "source"), col("tok"))
    graft.operators.PortableHll.estimate(partials, Seq("lang"))
      .orderBy(col("lang"))
  }

  // the one estimate constant, embedded verbatim (shortest-repr
  // double literals round-trip identically in both engines)
  private val q75Sql = {
    val c = graft.operators.PortableHll.EstimateConstant
    s"""WITH toks AS (
       |  SELECT lang, unnest(list_filter(
       |    regexp_split_to_array(trim(text), '\\s+'),
       |    x -> length(x) > 0)) AS tok
       |  FROM documents),
       |hs AS (
       |  SELECT lang,
       |    CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS h
       |  FROM toks),
       |regs AS (
       |  SELECT lang, h % 1024 AS bucket,
       |    max(CASE WHEN h // 1024 = 0 THEN 51
       |      ELSE 51 - length(bin(h // 1024)) END) AS rho_max
       |  FROM hs GROUP BY 1, 2),
       |agg AS (
       |  SELECT lang, count(*) AS occupied,
       |    CAST(sum(1::BIGINT << (51 - rho_max)) AS BIGINT) AS s_occ
       |  FROM regs GROUP BY lang),
       |est AS (
       |  SELECT lang, occupied,
       |    $c / CAST(s_occ + (1024 - occupied) * (1::BIGINT << 51)
       |      AS DOUBLE) AS e_raw,
       |    1024 - occupied AS v
       |  FROM agg)
       |SELECT lang, occupied,
       |  round(CASE WHEN e_raw <= 2560.0 AND v > 0
       |    THEN 1024.0 * ln(1024.0 / CAST(v AS DOUBLE))
       |    ELSE e_raw END, 3) AS est_distinct
       |FROM est ORDER BY lang""".stripMargin
  }

  /** q49: benchmark decontamination — flag training docs sharing
    * 3-gram windows with the "benchmark suite" (stand-in: every 97th
    * doc). Real corpora use n = 8..13; the synthetic vocabulary is
    * tiny, so n=3 keeps the collision signal non-trivial at every SF.
    * Full oracle: the gram hashes are md5, so DuckDB re-derives the
    * exact flag set (the auditability property).
    */
  private def q49(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir).documents
    graft.operators.Decontamination.flagContaminated(
        d.filter(col("doc_id") % 97 =!= 0), d.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 3)
      .orderBy(col("doc_id"))
  }

  private val q49Sql =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(text), '\s+'),
      |      x -> length(x) > 0) AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    list_distinct([md5(list_aggregate(toks[i:i+2], 'string_agg', ' '))
      |      for i in generate_series(1, length(toks) - 2)]) AS grams
      |  FROM t),
      |bench AS (SELECT DISTINCT unnest(grams) AS gr FROM g WHERE doc_id % 97 = 0),
      |docg AS (
      |  SELECT doc_id, unnest(grams) AS gr, length(grams) AS n_grams
      |  FROM g WHERE doc_id % 97 <> 0)
      |SELECT d.doc_id, count(*) AS n_hits,
      |  CAST(any_value(d.n_grams) AS BIGINT) AS n_grams,
      |  round(CAST(count(*) AS DOUBLE) / any_value(d.n_grams), 6)
      |    AS contamination
      |FROM docg d JOIN bench b ON d.gr = b.gr
      |GROUP BY d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** q50: Gopher-style repetition quality signal — duplicate-3-gram
    * fraction per doc, a pure zero-shuffle projection (the q12-q15
    * family extended with the repetition filter real curation uses).
    */
  private def q50(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.ngrams
    // the gram array and its distinct form materialize ONCE as named
    // columns (CollapseProject won't inline a non-cheap expression
    // referenced more than once) — inlining `g` into all three output
    // columns re-derived the grams per column
    Tables(s, dir).documents
      .withColumn("g", ngrams(col("text"), 3))
      .withColumn("n_grams", size(col("g")).cast("long"))
      .withColumn("n_dup",
        (size(col("g")) - size(array_distinct(col("g")))).cast("long"))
      .select(col("doc_id"), col("n_grams"), col("n_dup"),
        round(col("n_dup").cast("double") /
          nullif(col("n_grams"), lit(0L)).cast("double"), 6).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  private val q50Sql =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(text), '\s+'),
      |      x -> length(x) > 0) AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, [list_aggregate(toks[i:i+2], 'string_agg', ' ')
      |    for i in generate_series(1, length(toks) - 2)] AS grams
      |  FROM t)
      |SELECT doc_id, length(grams) AS n_grams,
      |  length(grams) - length(list_distinct(grams)) AS n_dup,
      |  round(CAST(length(grams) - length(list_distinct(grams)) AS DOUBLE)
      |    / nullif(length(grams), 0), 6) AS dup_frac
      |FROM g ORDER BY doc_id""".stripMargin

  /** q51: per-language quality filtering — keep the top 3/4 of each
    * language by the q13 quality score, RANK-based (integer keep
    * counts + deterministic (score desc, id) order) rather than
    * threshold-based, so boundary docs can't flip on a cross-engine
    * percentile ulp. The score itself is the q13 formulation, whose
    * cross-engine value equality the q13 hash gate already pins.
    */
  private def q51(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.qualityScore
    val scored = Tables(s, dir).documents
      .withColumn("quality", qualityScore(col("text")))
    Sampling.qualityFilter(scored, "lang", col("quality"),
        keepNum = 3, keepDenom = 4, idCol = "doc_id")
      .select(col("doc_id"), col("lang"), col("quality"))
      .orderBy(col("doc_id"))
  }

  private val q51Sql =
    """WITH q AS (
      |  SELECT doc_id, lang, round(
      |    0.25 * (CASE WHEN length(text) BETWEEN 20 AND 10000 THEN 1.0 ELSE 0.0 END)
      |    + 0.25 * (CASE WHEN CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / greatest(length(text), 1) < 0.1 THEN 1.0 ELSE 0.0 END)
      |    + 0.25 * (CASE WHEN CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / greatest(length(text), 1) < 0.3 THEN 1.0 ELSE 0.0 END)
      |    + 0.25 * least(CAST(length(list_distinct(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> length(x) > 0))) AS DOUBLE)
      |        / greatest(length(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> length(x) > 0)), 1) * 2.0, 1.0)
      |  , 6) AS quality
      |  FROM documents),
      |counts AS (SELECT lang, count(*) AS cnt FROM q GROUP BY 1),
      |keeps AS (SELECT lang, (cnt * 3 + 3) // 4 AS keep FROM counts),
      |ranked AS (
      |  SELECT doc_id, lang, quality, row_number() OVER (
      |    PARTITION BY lang ORDER BY quality DESC, doc_id) AS rk
      |  FROM q)
      |SELECT r.doc_id, r.lang, r.quality
      |FROM ranked r JOIN keeps k USING (lang)
      |WHERE r.rk <= k.keep
      |ORDER BY r.doc_id""".stripMargin

  /** q56: leakage-free 80/10/10 train/val/test split — keyed on the
    * normalized-content FINGERPRINT (not the doc id), so exact
    * duplicates always land in the same split and can never leak from
    * train into eval. Zero-shuffle projection; full DuckDB oracle
    * (md5 thresholds: 0.8 → cccccccc, 0.9 → e6666666 — the same
    * auditability discipline as q45).
    */
  private def q56(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
      .select(col("doc_id"), col("fp"),
        Sampling.assignSplit(col("fp"),
          Seq("train" -> 8, "val" -> 1, "test" -> 1)).as("split"))
      .orderBy(col("doc_id"))

  private val q56Sql =
    """WITH f AS (
      |  SELECT doc_id,
      |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
      |  FROM documents)
      |SELECT doc_id, fp, CASE
      |  WHEN substring(md5(fp), 1, 8) < 'cccccccc' THEN 'train'
      |  WHEN substring(md5(fp), 1, 8) < 'e6666666' THEN 'val'
      |  ELSE 'test' END AS split
      |FROM f ORDER BY doc_id""".stripMargin

  /** Deterministic training-order shuffle + sharding (q65) under a
    * FULL DuckDB oracle: seeded-md5 global permutation, hash-bit
    * shards, per-shard rank — the epoch handoff a data loader
    * consumes. The oracle re-derives hash, shard arithmetic, and the
    * within-shard ordering.
    */
  private def q65(s: SparkSession, dir: String): DataFrame =
    Sampling.shuffleShards(
        Tables(s, dir).documents.select(col("doc_id")),
        "doc_id", numShards = 8, seed = "epoch0")
      .orderBy(col("doc_id"))

  private val q65Sql =
    """WITH h AS (
      |  SELECT doc_id, md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS hh
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, hh,
      |    CAST(CAST(('0x' || substring(hh, 1, 15)) AS BIGINT) % 8
      |      AS INTEGER) AS shard
      |  FROM h)
      |SELECT doc_id, shard,
      |  CAST(row_number() OVER (
      |    PARTITION BY shard ORDER BY hh, doc_id) - 1 AS BIGINT) AS pos
      |FROM s ORDER BY doc_id""".stripMargin

  /** Fuzzy MinHash decontamination (q67) — rows-only (the LSH
    * candidate set depends on the hash family, the q18/q42 class);
    * CurationSpec pins the flag set on planted near-verbatim leaks
    * INCLUDING the one-word-edit case exact n-gram decon (q49)
    * provably misses, plus precision against brute-force Jaccard.
    * Bench side = every 89th doc — NOT q49's 97: the synthetic
    * corpus's near-dup pairs straddle the 89-split at every SF
    * (verified ≥3 cross-split pairs with exact Jaccard ≥ 0.93 at
    * sf0.001/0.01/0.1) but not the 97-split (zero at sf0.01), which
    * made the rows-only gate vacuous. q72 is this query's portable
    * twin under a full oracle.
    */
  private def q67(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir).documents
    graft.operators.Decontamination.fuzzyContaminated(
        d.filter(col("doc_id") % 89 =!= 0), d.filter(col("doc_id") % 89 === 0),
        "doc_id", "text", shingleK = 2, numHashes = 32, bands = 8,
        threshold = 0.5)
      .orderBy(col("doc_id"))
  }

  /** Fuzzy decontamination under a FULL DuckDB oracle (q72) — the
    * md5-portable twin of q67 (same split, same parameters),
    * completing the q69/q70/q71 playbook for the last LSH
    * *application*: the oracle re-derives shingles, the double-hashed
    * md5 signatures, the directed banded candidate join, the verified
    * Jaccard and the per-doc (jaccard, bench_id) argmax
    * value-for-value. q67's xxhash64 path stays the scale default;
    * the hash family is its only unverified ingredient.
    */
  private def q72(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir).documents
    graft.operators.Decontamination.fuzzyContaminatedPortable(
        d.filter(col("doc_id") % 89 =!= 0), d.filter(col("doc_id") % 89 === 0),
        "doc_id", "text", shingleK = 2, numHashes = 32, bands = 8,
        threshold = 0.5)
      .orderBy(col("doc_id"))
  }

  private val q72Sql =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(
      |      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
      |      x -> length(x) > 0) AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, list_distinct(CASE WHEN length(toks) < 2
      |    THEN [array_to_string(toks, ' ')]
      |    ELSE [array_to_string(toks[i:i+1], ' ')
      |          for i in generate_series(1, length(toks) - 1)] END) AS shs
      |  FROM t),
      |hx AS (
      |  SELECT doc_id, [md5(s) for s in shs] AS hexes FROM sh),
      |base AS (
      |  SELECT doc_id,
      |    [list_min([CAST(('0x' || substring(m, 1, 14)) AS BIGINT)
      |        + i * CAST(('0x' || substring(m, 15, 14)) AS BIGINT)
      |      for m in hexes]) for i in generate_series(0, 31)] AS sig,
      |    list_distinct([CAST(('0x' || substring(m, 1, 15)) AS BIGINT)
      |      for m in hexes]) AS hsh
      |  FROM hx),
      |banded AS (
      |  SELECT doc_id, b AS band,
      |    md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bucket
      |  FROM base, generate_series(0, 7) AS g(b)),
      |cands AS (
      |  SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS bench_id
      |  FROM banded x JOIN banded y
      |    ON x.band = y.band AND x.bucket = y.bucket
      |  WHERE x.doc_id % 89 <> 0 AND y.doc_id % 89 = 0),
      |verified AS (
      |  SELECT c.doc_id, c.bench_id,
      |    CAST(length(list_intersect(a.hsh, b.hsh)) AS DOUBLE)
      |      / (length(a.hsh) + length(b.hsh)
      |         - length(list_intersect(a.hsh, b.hsh))) AS jaccard
      |  FROM cands c
      |  JOIN base a ON a.doc_id = c.doc_id
      |  JOIN base b ON b.doc_id = c.bench_id
      |  WHERE CAST(length(list_intersect(a.hsh, b.hsh)) AS DOUBLE)
      |      / (length(a.hsh) + length(b.hsh)
      |         - length(list_intersect(a.hsh, b.hsh))) >= 0.5)
      |SELECT doc_id, bench_id, jaccard FROM (
      |  SELECT doc_id, bench_id, round(jaccard, 6) AS jaccard,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY round(jaccard, 6) DESC, bench_id DESC) AS rn
      |  FROM verified) WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  /** Trained quality classifier (q68) — rows-only (L-BFGS float
    * accumulation is partitioning-dependent in its last ulps; the
    * row set — one score per document — is exact). Trains on the
    * even-id half with labels distilled from the q13 heuristic, then
    * scores every document; CurationSpec pins high held-out accuracy
    * on separable corpora and agreement with the teacher heuristic
    * here.
    */
  private def q68(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.qualityScore
    val d = Tables(s, dir).documents
    val labeled = d.withColumn("label",
      (qualityScore(col("text")) >= 0.75).cast("int"))
    val model = graft.operators.QualityClassifier.train(
      labeled.filter(col("doc_id") % 2 === 0), "text", "label")
    graft.operators.QualityClassifier.score(d, "doc_id", "text", model)
      .join(labeled.select(col("doc_id"), col("label")), "doc_id")
      .orderBy(col("doc_id"))
  }

  /** Portable classifier SCORING under a FULL oracle (q77) — the q68
    * twin on the committed weight fixture (tools.TrainQualityLrFixture
    * — the q73/q76 offline-training split): md5-bucket feature counts,
    * exact-decimal weighted sums, sigmoid rounded to 6. DuckDB
    * re-derives every score value-for-value (the weights ride into
    * the oracle as shortest-repr double literals), so the only
    * assumed ingredient in the trained-classifier path is L-BFGS
    * training itself.
    */
  private def q77(s: SparkSession, dir: String): DataFrame = {
    val (w, b0) = graft.operators.QualityClassifier.loadFixtureWeights()
    graft.operators.QualityClassifier.scorePortable(
        Tables(s, dir).documents, "doc_id", "text", w, b0)
      .orderBy(col("id"))
  }

  private val q77Sql = {
    val (w, b0) = graft.operators.QualityClassifier.loadFixtureWeights()
    val rows = w.zipWithIndex.map { case (x, b) =>
      s"($b, ${java.lang.Double.toString(x)})"
    }.mkString(", ")
    val icpt = java.lang.Double.toString(b0)
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_filter(
       |    regexp_split_to_array(trim(text), '\\s+'),
       |    x -> length(x) > 0)) AS tok
       |  FROM documents),
       |counts AS (
       |  SELECT doc_id,
       |    CAST(CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) % 256
       |      AS INT) AS bucket,
       |    count(*) AS n
       |  FROM toks GROUP BY 1, 2),
       |wts AS (SELECT * FROM (VALUES $rows) AS t(bucket, w)),
       |margins AS (
       |  SELECT c.doc_id,
       |    CAST(sum(CAST(round(w.w * c.n, 12) AS DECIMAL(38,12)))
       |      AS DOUBLE) + $icpt AS margin
       |  FROM counts c JOIN wts w USING (bucket) GROUP BY c.doc_id)
       |SELECT d.doc_id AS id,
       |  round(1.0 / (1.0 + exp(-coalesce(m.margin, $icpt))), 6) AS p_quality
       |FROM (SELECT DISTINCT doc_id FROM documents) d
       |LEFT JOIN margins m USING (doc_id)
       |ORDER BY id""".stripMargin
  }

  /** SEMANTIC decontamination under a FULL oracle (q86) — the
    * embedding sibling of q49 (exact n-grams) and q67/q72 (fuzzy
    * MinHash), end-to-end TRAINED (the q80/q85 discipline, zero
    * fixtures): the corpus is the embeddings table minus a held-out
    * 1/97 "benchmark" slice, the coarse quantizer is portable Lloyd
    * trained on the corpus, both sides cell-assign with the
    * single-sited argmin, and every within-cell corpus×bench decimal
    * cosine, hit count and max score re-derives in one generated
    * DuckDB statement. */
  private def q86(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir).embeddings
    val corpus = emb.filter(col("vec_id") % 97 =!= 0)
    val bench = emb.filter(col("vec_id") % 97 === 0)
    val m = graft.operators.KMeansPortable.trainModel(corpus, k = 8,
      iters = 2)
    graft.operators.Decontamination.semanticDecontaminate(
        corpus, bench, m.centroids, threshold = 0.35)
      .orderBy(col("id"))
  }

  /** The bench-side vector scaffolding (bv/bdims/bnorms over the
    * held-out 1/97 slice) + the decontamination scoring tail
    * (cell-join candidates → decimal dots → rounded scores → per-
    * corpus-id hits → LEFT-enumerated final frame) — ONE source for
    * the q86/q92 oracle arithmetic, the oracle-side image of the
    * Scala `decontaminateAssigned` single-siting (round-10 review).
    * `corpusAssign`/`benchAssign` are (id, cell) relations; the
    * caller supplies the training + assignment chains.
    */
  private def deconBenchCtes: String =
    """bv AS MATERIALIZED (
      |  SELECT vec_id AS id, [CAST(x AS DOUBLE) for x in embedding] AS xs
      |  FROM embeddings WHERE vec_id % 97 = 0),
      |bdims AS MATERIALIZED (
      |  SELECT id, generate_subscripts(xs, 1) - 1 AS d, unnest(xs) AS x
      |  FROM bv),
      |bnorms AS MATERIALIZED (
      |  SELECT id, CAST(sum(CAST(round(x * x, 12) AS DECIMAL(38,12)))
      |    AS DOUBLE) AS n2
      |  FROM bdims GROUP BY id),
      |""".stripMargin

  private def deconTailSql(corpusAssign: String, benchAssign: String,
      threshold: Double): String =
    s"""cand AS (
       |  SELECT a.id AS cid, b.id AS bid
       |  FROM $corpusAssign a JOIN $benchAssign b ON a.cell = b.cell),
       |cdots AS (
       |  SELECT c.cid, c.bid,
       |    CAST(sum(CAST(round(da.x * db.x, 12) AS DECIMAL(38,12)))
       |      AS DOUBLE) AS dot
       |  FROM cand c
       |  JOIN dims da ON da.id = c.cid
       |  JOIN bdims db ON db.id = c.bid AND db.d = da.d
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.cid, round(d.dot / (sqrt(cn.n2) * sqrt(bn.n2)), 6) AS score
       |  FROM cdots d
       |  JOIN norms cn ON cn.id = d.cid
       |  JOIN bnorms bn ON bn.id = d.bid),
       |hits AS (
       |  SELECT cid AS id, CAST(count(*) AS BIGINT) AS n_hits,
       |    max(score) AS max_score
       |  FROM scored WHERE score >= $threshold GROUP BY cid)
       |SELECT v.id, coalesce(h.n_hits, 0) AS n_hits, h.max_score,
       |  coalesce(h.n_hits, 0) > 0 AS flagged
       |FROM (SELECT id FROM v) v
       |LEFT JOIN hits h USING (id)
       |ORDER BY id""".stripMargin

  private val q86Sql = {
    val iters = 2
    val lloyd = graft.operators.KMeansPortable.lloydCtes(
      "(SELECT * FROM embeddings WHERE vec_id % 97 <> 0)",
      "vec_id", "embedding", k = 8, iters = iters)
    val assignCorpus = graft.operators.KMeansPortable.assignmentCtes(
      "ca", s"cd$iters")
    val assignBench = graft.operators.KMeansPortable.assignmentCtes(
      "cb", s"cd$iters", "bdims", "bnorms")
    s"""WITH $lloyd$assignCorpus
       |$deconBenchCtes
       |$assignBench
       |${deconTailSql("asca", "ascb", 0.35)}""".stripMargin
  }

  /** Two-level semantic decontamination under a FULL oracle (q92) —
    * the q86 statement at the hierarchical-quantizer structure
    * (SCALE.md round 10): trainTwoLevel on the corpus, BOTH sides
    * two-level-assigned (route via super argmin, child argmin
    * restricted to the routed super, childless-super fallback on
    * both — the conservative never-skip-a-check direction), same
    * LEFT-join hit aggregation. The oracle composes
    * [[KMeansPortable.twoLevelCtes]] (corpus training + assignment)
    * with a second [[KMeansPortable.assignmentCtes]] route +
    * [[KMeansPortable.childAssignCtes]] pass for the bench side.
    */
  private def q92(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir).embeddings
    val corpus = emb.filter(col("vec_id") % 97 =!= 0)
    val bench = emb.filter(col("vec_id") % 97 === 0)
    val m = graft.operators.KMeansPortable.trainTwoLevel(corpus,
      nlist = 8, iters = 2)
    graft.operators.Decontamination.semanticDecontaminateTwoLevel(
        corpus, bench, m, threshold = 0.35)
      .orderBy(col("id"))
  }

  private val q92Sql = {
    val iters = 2
    val chain = graft.operators.KMeansPortable.twoLevelCtes(
      "(SELECT * FROM embeddings WHERE vec_id % 97 <> 0)",
      "vec_id", "embedding", nlist = 8, iters = iters)
    val routeBench = graft.operators.KMeansPortable.assignmentCtes(
      "br", s"cd$iters", "bdims", "bnorms")
    val assignBench = graft.operators.KMeansPortable.childAssignCtes(
      "bf", s"ccd$iters", "bdims", "bnorms", "asbr",
      withFallback = true)
    s"""WITH $chain
       |$deconBenchCtes
       |$routeBench$assignBench
       |${deconTailSql("askf", "asbf", 0.35)}""".stripMargin
  }

  /** DSIR importance resampling under a FULL oracle (q87) — the
    * data-SELECTION capability (Xie et al. 2023): pick the most
    * target-like quarter of every source's candidates, where
    * "target-like" is learned IN-QUERY from a designated target
    * sample (here source src1 — the trusted-domain reference; its
    * docs are the training signal and never candidates). End-to-end
    * trained, zero fixtures: hashed unigram∪bigram bucket counts,
    * add-1-smoothed ln-ratio weights rounded to 6 (the q75/q77
    * transcendental discipline), exact-decimal score dot, rank-based
    * per-domain keep — every stage re-derived by the DuckDB oracle
    * from the same documents table. */
  private def q87(s: SparkSession, dir: String): DataFrame =
    graft.operators.DataSelection.importanceResample(
        Tables(s, dir).documents, col("source") === "src1",
        "doc_id", "text", "source",
        buckets = 256, keepNum = 1, keepDenom = 4)
      .orderBy(col("id"))

  private val q87Sql =
    """WITH base AS (
      |  SELECT doc_id, source, (source = 'src1') AS tgt,
      |    list_filter(regexp_split_to_array(trim(text), '\s+'),
      |      x -> length(x) > 0) AS toks
      |  FROM documents),
      |toks AS (
      |  SELECT doc_id, source, tgt, generate_subscripts(toks, 1) AS pos,
      |    unnest(toks) AS tok
      |  FROM base),
      |feats AS (
      |  SELECT doc_id, source, tgt, tok AS f FROM toks
      |  UNION ALL
      |  SELECT doc_id, source, tgt, f FROM (
      |    SELECT doc_id, source, tgt,
      |      tok || ' ' || lead(tok) OVER (
      |        PARTITION BY doc_id ORDER BY pos) AS f
      |    FROM toks) WHERE f IS NOT NULL),
      |counts AS (
      |  SELECT doc_id, source, tgt,
      |    CAST(CAST(('0x' || substring(md5(f), 1, 15)) AS BIGINT) % 256
      |      AS INT) AS bucket,
      |    count(*) AS n
      |  FROM feats GROUP BY 1, 2, 3, 4),
      |totals AS (
      |  SELECT bucket,
      |    sum(CASE WHEN tgt THEN n ELSE 0 END) AS tp,
      |    sum(CASE WHEN NOT tgt THEN n ELSE 0 END) AS rq
      |  FROM counts GROUP BY bucket),
      |scalars AS (SELECT sum(tp) AS np, sum(rq) AS nq FROM totals),
      |weights AS (
      |  SELECT bucket,
      |    round(ln((tp + 1) / CAST(np + 256 AS DOUBLE)) -
      |          ln((rq + 1) / CAST(nq + 256 AS DOUBLE)), 6) AS w
      |  FROM totals, scalars),
      |scores AS (
      |  SELECT c.doc_id, c.source,
      |    sum(CAST(round(w.w * c.n, 12) AS DECIMAL(38,12))) AS s
      |  FROM counts c JOIN weights w USING (bucket)
      |  WHERE NOT c.tgt
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT b.doc_id AS id, b.source AS domain,
      |    coalesce(s.s, CAST(0 AS DECIMAL(38,12))) AS score
      |  FROM (SELECT doc_id, source FROM base WHERE NOT tgt) b
      |  LEFT JOIN scores s USING (doc_id)),
      |quotas AS (
      |  SELECT domain, (count(*) * 1 + 3) // 4 AS quota
      |  FROM scored GROUP BY domain),
      |ranked AS (
      |  SELECT id, domain, score, row_number() OVER (
      |    PARTITION BY domain ORDER BY score DESC, id) AS rk
      |  FROM scored)
      |SELECT r.id, r.domain, CAST(r.score AS DOUBLE) AS score
      |FROM ranked r JOIN quotas q USING (domain)
      |WHERE r.rk <= q.quota
      |ORDER BY r.id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q45_stratified_sample", q45, Some(q45Sql)),
    Q("q46_mixture_rebalance", q46, Some(q46Sql), headline = true),
    Q("q81_temperature_mixture", q81, Some(q81Sql)),
    Q("q82_unimax_allocation", q82, Some(q82Sql)),
    Q("q47_sequence_packing", q47, None, headline = true),
    Q("q79_packing_oracle", q79, Some(q79Sql)),
    Q("q48_hll_rollup", q48, None),
    Q("q75_portable_hll_oracle", q75, Some(q75Sql)),
    Q("q49_decontamination", q49, Some(q49Sql), headline = true),
    Q("q50_repetition", q50, Some(q50Sql)),
    Q("q51_quality_filter", q51, Some(q51Sql)),
    Q("q56_leakage_free_split", q56, Some(q56Sql)),
    Q("q65_shuffle_shards", q65, Some(q65Sql)),
    Q("q67_fuzzy_decontamination", q67, None),
    Q("q68_quality_classifier", q68, None),
    Q("q77_portable_lr_oracle", q77, Some(q77Sql)),
    Q("q72_fuzzy_decon_oracle", q72, Some(q72Sql)),
    Q("q86_semantic_decon_oracle", q86, Some(q86Sql), headline = true),
    Q("q87_dsir_selection", q87, Some(q87Sql), headline = true),
    Q("q92_semantic_decon_twolevel", q92, Some(q92Sql)))
}
