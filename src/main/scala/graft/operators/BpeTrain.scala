package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016) — the
  * TRAINING half of the tokenizer story ([[graft.functions
  * .TextFunctions]]'s `bpeTokens` applies a merges table; this learns
  * one from the corpus).
  *
  * The scale insight is the classic one: BPE statistics live on the
  * WORD-FREQUENCY table, not the corpus — one corpus-wide
  * aggregation collapses 100 TB of text to |distinct words| rows
  * (Zipf: millions, not trillions), and every merge iteration then
  * runs on that small persisted relation. Per iteration:
  *
  *   1. adjacent-pair counts — explode (symbol_i, symbol_i+1) per
  *      word weighted by word frequency, ONE keyed aggregation with
  *      map-side combine;
  *   2. the argmax pair — a 1-row collect (freq DESC, then pair ASC:
  *      deterministic on any partitioning, the CC convergence-scalar
  *      discipline);
  *   3. greedy left-to-right merge within each word — a typed
  *      Dataset.map (genuinely sequential per-row logic; the row set
  *      never grows), with a lazy localCheckpoint every few rounds so
  *      lineage stays flat across the iteration chain.
  *
  * Rows whose symbols don't contain the winning pair pass through
  * untouched, so late iterations (when merges are rare words) cost a
  * scan of a compact cached relation and a near-empty shuffle.
  *
  * Symbols are characters; merges are word-internal (no end-of-word
  * marker — callers wanting Sennrich's `</w>` semantics append a
  * marker to each word before training, the operator is agnostic).
  *
  * Returns (rank, left, right, freq): the merge table in learned
  * order, directly consumable as a merges fixture by `bpeTokens`.
  */
object BpeTrain {

  /** Greedy left-to-right single-pair merge — the textbook BPE inner
    * loop. */
  private[graft] def mergePair(syms: Seq[String], l: String,
      r: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn `numMerges` merges. `collectThreshold` bounds the LOCAL
    * fallback (the ConnectedComponents.componentsLocal discipline,
    * and what production trainers — SentencePiece, HF tokenizers —
    * actually do): the corpus-wide aggregation is always distributed,
    * and when the resulting word-frequency table has at most that
    * many rows the merge loop runs on the driver over the collected
    * vocab (memory ≈ Σ word lengths — megabytes for real languages)
    * instead of paying numMerges × (shuffle + collect) in fixed job
    * overhead; measured 5.3 s → 0.74 s for 30 merges at sf0.1. Vocabs
    * above the threshold iterate distributed, result-identical
    * (spec-pinned: both paths against the same Python reference).
    * 0 = always distributed. */
  def learnMerges(docs: DataFrame, textCol: String,
      numMerges: Int, checkpointEvery: Int = 8,
      collectThreshold: Long = 1L << 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // 100 TB → |vocab| in one aggregation; this is the ONLY pass over
    // the corpus
    var words: Dataset[(Seq[String], Long)] = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(split(col("w"), "").as("syms"), col("freq"))
      .as[(Seq[String], Long)]
      .localCheckpoint(true)
    if (collectThreshold > 0 && words.count() <= collectThreshold) {
      val vocab = words.collect()
      words.unpersist()
      return learnLocal(spark, vocab, numMerges)
    }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    // Superseded-checkpoint lifecycle: each lazy localCheckpoint cuts
    // lineage THROUGH the previous one's blocks, so the old blocks can
    // only be freed after the next action materializes the new
    // checkpoint (unpersisting earlier would orphan data no lineage
    // can rebuild). Without this, numMerges/checkpointEvery full
    // copies of the word-frequency table pile up in the block manager
    // for the whole training run — the leak class CacheScope exists
    // to prevent for persist().
    var live = words
    var pending: Option[Dataset[(Seq[String], Long)]] = None
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = words.toDF("syms", "freq")
        // single-symbol words carry no pairs; sequence(1, 0) would
        // count BACKWARD (the ngrams lesson), so filter explicitly
        .filter(size(col("syms")) >= 2)
        .select(posexplode(expr(
          "transform(sequence(1, size(syms) - 1), i -> struct(syms[i-1] AS l, syms[i] AS r))"))
          .as(Seq("__p", "pair")), col("freq"))
        .groupBy(col("pair.l").as("l"), col("pair.r").as("r"))
        .agg(sum(col("freq")).as("f"))
        .orderBy(col("f").desc, col("l"), col("r"))
        .limit(1).collect()
      // this action materialized any lazy checkpoint created at the
      // end of the previous iteration — its predecessor's blocks are
      // now safely releasable
      pending.foreach(_.unpersist())
      pending = None
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((rank, l, r, f))
        val prev = words
        words = prev.map { case (syms, freq) => (mergePair(syms, l, r), freq) }
        // lazy checkpoint: the NEXT iteration's pair-count job (or the
        // final action) materializes it; cut lineage before the plan
        // chain deepens enough to re-run every map
        if ((rank + 1) % checkpointEvery == 0 || rank + 1 == numMerges) {
          words = words.localCheckpoint(false)
          pending = Some(live)
          live = words
        }
        rank += 1
      }
    }
    // the merge table lives in the local builder — every word-table
    // checkpoint is now dead weight
    pending.foreach(_.unpersist())
    live.unpersist()
    merges.result()
      .toDF("rank", "left", "right", "freq")
      .orderBy(col("rank"))
  }

  /** DuckDB oracle replaying [[learnMerges]] exactly — the merge loop
    * IS SQL-expressible after all (the q78 Lloyd precedent: unroll the
    * fixed iteration count as a generated CTE chain). Per iteration k:
    * `p(k)` re-derives the weighted adjacent-pair counts, `b(k)` takes
    * the argmax under (freq DESC, l, r) — DuckDB's default string
    * ordering is binary UTF-8, the same comparator as Spark's
    * UTF8String sort and [[ltUtf8]] — and `w(k+1)` replays the greedy
    * leftmost merge. The one non-obvious step is greedy-leftmost in
    * set-oriented SQL: a merge at position i consumes i and i+1, so a
    * match at i is taken iff the run of consecutive matches ending
    * just before i has even length; consecutive match positions can
    * only occur when left == right (pair (x,y) matching at both i and
    * i+1 forces y = x), so islands-by-parity — group consecutive
    * match positions (gaps-and-islands), keep even offsets — is
    * EXACTLY the sequential left-to-right walk. Iteration relations
    * are `AS MATERIALIZED`: each w(k) is referenced twice (pair counts
    * + merge), and DuckDB 1.x inlines CTEs by default, which would
    * re-evaluate the chain exponentially at depth 30.
    *
    * Word symbols: DuckDB `w[i:i]` slices by code point, matching
    * Spark's `split(w, "")` (Java regex splits between code points,
    * never inside a surrogate pair).
    */
  def oracleSql(table: String, textCol: String, numMerges: Int): String = {
    require(numMerges >= 1,
      s"numMerges must be >= 1 (got $numMerges): zero iterations would " +
        "generate an empty UNION body — invalid SQL (learnMerges returns " +
        "an empty table for 0; there is nothing to verify)")
    val sb = new StringBuilder
    sb ++=
      s"""WITH toks AS MATERIALIZED (
         |  SELECT unnest(list_filter(regexp_split_to_array(trim($textCol), '\\s+'),
         |    x -> length(x) > 0)) AS w
         |  FROM $table),
         |w0 AS MATERIALIZED (
         |  SELECT w, list_transform(range(1, length(w) + 1), i -> w[i:i]) AS syms,
         |    CAST(count(*) AS BIGINT) AS freq
         |  FROM toks GROUP BY w),
         |""".stripMargin
    for (k <- 0 until numMerges) {
      sb ++=
        s"""p$k AS (
           |  SELECT syms[i] AS l, syms[i+1] AS r, CAST(sum(freq) AS BIGINT) AS f
           |  FROM w$k, unnest(range(1, length(syms))) AS t(i)
           |  GROUP BY 1, 2),
           |b$k AS MATERIALIZED (SELECT l, r, f FROM p$k ORDER BY f DESC, l, r LIMIT 1),
           |w${k + 1} AS MATERIALIZED (
           |  SELECT w, freq, list(CASE WHEN st THEN l || r ELSE sym END ORDER BY i) AS syms
           |  FROM (
           |    SELECT w, freq, i, sym, st, l, r,
           |      coalesce(lag(st) OVER (PARTITION BY w ORDER BY i), false) AS cons
           |    FROM (
           |      SELECT w, freq, i, sym, l, r, m, grp,
           |        CASE WHEN m THEN (row_number() OVER (PARTITION BY w, grp ORDER BY i) - 1) % 2 = 0
           |          ELSE false END AS st
           |      FROM (
           |        SELECT w, freq, i, syms[i] AS sym, b.l, b.r,
           |          (i < length(syms) AND syms[i] = b.l AND syms[i+1] = b.r) AS m,
           |          CASE WHEN (i < length(syms) AND syms[i] = b.l AND syms[i+1] = b.r)
           |            THEN i - row_number() OVER (PARTITION BY w,
           |              (i < length(syms) AND syms[i] = b.l AND syms[i+1] = b.r) ORDER BY i)
           |            END AS grp
           |        FROM w$k, b$k b, unnest(range(1, length(syms) + 1)) AS t(i))))
           |  WHERE NOT cons
           |  GROUP BY w, freq),
           |""".stripMargin
    }
    val finals = (0 until numMerges)
      .map(k => s"""SELECT $k AS rank, l AS "left", r AS "right", f AS freq FROM b$k""")
      .mkString(" UNION ALL ")
    // drop the trailing ",\n" of the last CTE
    sb.setLength(sb.length - 2)
    sb.toString + "\n" +
      s"""SELECT CAST(rank AS INTEGER) AS rank, "left", "right", freq
         |FROM ($finals) ORDER BY rank""".stripMargin
  }

  /** UTF-8 byte-wise (= code-point) lexicographic less-than on (l, r)
    * pairs — matches Spark's UTF8String binary ordering used by the
    * distributed argmax's `orderBy(l, r)`. Java String ordering
    * compares UTF-16 code UNITS, which disagrees with code-point
    * order for supplementary-plane symbols vs chars in [U+E000,
    * U+FFFF]; tie-breaking with it would break the result-identical
    * local/distributed guarantee on non-BMP corpora. */
  private[graft] def ltUtf8(a: (String, String), b: (String, String)): Boolean = {
    def cmp(x: String, y: String): Int = {
      val xb = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val yb = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(xb.length, yb.length)
      while (i < n) {
        val d = (xb(i) & 0xFF) - (yb(i) & 0xFF)
        if (d != 0) return d
        i += 1
      }
      xb.length - yb.length
    }
    val c = cmp(a._1, b._1)
    c < 0 || (c == 0 && cmp(a._2, b._2) < 0)
  }

  /** Driver merge loop over the collected word-frequency table — the
    * small-vocab path of [[learnMerges]]. Same pair statistics, same
    * (freq DESC, l ASC, r ASC) argmax, same greedy merge; pinned
    * result-identical to the distributed loop. */
  private def learnLocal(spark: SparkSession,
      vocab: Array[(Seq[String], Long)], numMerges: Int): DataFrame = {
    import spark.implicits._
    val words = vocab.map { case (s, f) => (s.toArray, f) }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val pairs = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          pairs.merge((syms(i), syms(i + 1)), f, _ + _)
          i += 1
        }
      }
      if (pairs.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        pairs.forEach { (p, f) =>
          if (best == null || f > best._2 ||
            (f == best._2 && ltUtf8(p, best._1)))
            best = (p, f)
        }
        val ((l, r), f) = best
        merges += ((rank, l, r, f))
        var wi = 0
        while (wi < words.length) {
          words(wi) = (mergePair(words(wi)._1.toSeq, l, r).toArray,
            words(wi)._2)
          wi += 1
        }
        rank += 1
      }
    }
    merges.result().toDF("rank", "left", "right", "freq")
      .orderBy(col("rank"))
  }
}
