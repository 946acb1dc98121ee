package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Real-vocab byte-pair encoding for token budgeting (the
  * data-pipeline complement to `TextFunctions.tokensRegex`, which is a
  * vocab-free stand-in).
  *
  * Algorithm: Sennrich/Haddow/Birch, "Neural Machine Translation of
  * Rare Words with Subword Units" (ACL 2016) — word-level BPE with an
  * end-of-word marker: a word is a char-symbol sequence + `</w>`, and
  * the merge list is applied greedily, lowest merge-rank first.
  *
  * Scale split, 100 TB shape:
  *  - [[wordCounts]] — the DISTRIBUTED half: one map-side-combined
  *    groupBy over the corpus (the only full-corpus pass training
  *    needs).
  *  - [[train]] — driver-side over the aggregated (word, count) vocab,
  *    which is orders of magnitude smaller than the corpus (standard
  *    practice trains on a sampled/aggregated vocabulary).
  *  - [[encodeCounts]] — the DISTRIBUTED encoder: merges broadcast to
  *    executors, greedy merge loop per distinct word with a
  *    per-partition memo cache (corpus word frequencies are Zipfian —
  *    the cache hit rate is the scale win), zero shuffles.
  */
object Bpe {

  type Ranks = Map[(String, String), Int]

  /** End-of-word symbol (Sennrich's `</w>`). */
  val EndOfWord = "</w>"

  /** Pre-tokenizer: lowercase words, letters/digits runs only —
    * mirrors `TextFunctions.normalized` + punctuation stripping so the
    * vocab is stable under the pipeline's own normalization. */
  def preTokenize(text: String): Seq[String] =
    if (text == null) Seq.empty
    else "[\\p{L}\\p{N}]+".r.findAllIn(text.toLowerCase).toSeq

  /** A word as its initial symbol sequence — split by CODE POINT, not
    * UTF-16 code unit: a supplementary-plane letter is one symbol.
    * This is the convention of every sibling surface (the Python
    * reference BpeSpec pins against iterates code points, BpeTrain's
    * `split(w, "")` never splits a surrogate pair, and the q37 DuckDB
    * oracle's `w[i:i]` slices characters); code-unit splitting would
    * silently hand the merge loop lone surrogate halves on non-BMP
    * corpora (review r9). */
  private def symbols(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    (out += EndOfWord).result()
  }

  /** Greedy BPE encode of one word: repeatedly merge the
    * lowest-ranked adjacent pair until none applies. */
  def encodeWord(word: String, ranks: Ranks): Vector[String] = {
    var syms = symbols(word)
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
        syms.drop(bestIdx + 2)
    }
    syms
  }

  /** Tokens of a text under the merge table. */
  def encode(text: String, ranks: Ranks): Seq[String] =
    preTokenize(text).flatMap(encodeWord(_, ranks))

  /** Parse a merges file (one `left right` pair per line, best first;
    * `#`-prefixed lines are comments). */
  def loadMerges(lines: Iterator[String]): Ranks =
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .zipWithIndex.map { case (l, i) =>
        l.split(" ", 2) match {
          case Array(a, b) => (a, b) -> i
          case _ => throw new IllegalArgumentException(
            s"malformed merges line ${i + 1}: expected 'left right', got '$l'")
        }
      }.toMap

  def loadMergesFile(path: String): Ranks = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try loadMerges(src.getLines()) finally src.close()
  }

  /** Load merges bundled on the classpath (test/demo vocab). */
  def loadMergesResource(resource: String): Ranks = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"missing merges resource $resource")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try loadMerges(src.getLines()) finally src.close()
  }

  /** The committed fixture vocab (BpeTrainDemo output at sf0.001), in
    * merge-priority order. */
  lazy val mergesFixture: Seq[(String, String)] =
    loadMergesResource("/graft/bpe/merges.txt").toSeq
      .sortBy(_._2).map(_._1)

  /** DuckDB oracle replaying [[encodeCounts]] exactly. [[encodeWord]]
    * is a data-dependent fixpoint (merge the lowest-RANKED adjacent
    * pair, first occurrence, until none applies), so unlike
    * `BpeTrain.oracleSql`'s fixed-depth unroll this generates a
    * RECURSIVE CTE over the distinct-word table: each step looks the
    * per-position ranks up with `list_position` against the inlined
    * merges list (rank = 1-based list index — the same total order as
    * the broadcast Ranks map), takes `list_min`, and splices the
    * first occurrence (`list_position(ranks, best)` — first match,
    * the bestIdx scan's strict `<`). Rows exit the recursion by
    * emitting themselves once with done = true; `final` keeps exactly
    * those. Working on DISTINCT words is the memo-cache trick in
    * relational form — the corpus joins back by word at the end.
    * Pre-tokenization parity: Java `[\p{L}\p{N}]+` on toLowerCase ==
    * RE2 `[\p{L}\p{N}]+` on DuckDB lower() for the Unicode property
    * classes both engines implement.
    */
  def encodeCountsOracleSql(table: String, idCol: String,
      textCol: String, merges: Seq[(String, String)]): String = {
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    val ml = merges.map { case (l, r) => lit(l + " " + r) }
      .mkString("[", ", ", "]")
    s"""WITH RECURSIVE
       |toks AS MATERIALIZED (
       |  SELECT $idCol AS doc_id,
       |    unnest(regexp_extract_all(lower($textCol), '[\\p{L}\\p{N}]+')) AS w
       |  FROM $table),
       |words AS MATERIALIZED (SELECT DISTINCT w FROM toks),
       |w0 AS MATERIALIZED (
       |  SELECT w, list_append(list_transform(range(1, length(w) + 1),
       |    i -> w[i:i]), '</w>') AS syms
       |  FROM words),
       |enc AS (
       |  SELECT w, syms, false AS done FROM w0
       |  UNION ALL
       |  SELECT w,
       |    CASE WHEN best IS NULL THEN syms
       |      ELSE syms[1:idx-1] || [syms[idx] || syms[idx+1]] || syms[idx+2:] END AS syms,
       |    best IS NULL AS done
       |  FROM (
       |    SELECT w, syms, best, list_position(ranks, best) AS idx FROM (
       |      SELECT w, syms, ranks, nullif(list_min(ranks), 2147483647) AS best
       |      FROM (
       |        SELECT w, syms,
       |          list_transform(range(1, length(syms)),
       |            i -> coalesce(list_position($ml, syms[i] || ' ' || syms[i+1]),
       |              2147483647)) AS ranks
       |        FROM enc WHERE NOT done)))),
       |fin AS (SELECT w, length(syms) AS n FROM enc WHERE done),
       |counts AS (
       |  SELECT t.doc_id, CAST(sum(f.n) AS INTEGER) AS bpe_tokens
       |  FROM toks t JOIN fin f USING (w) GROUP BY 1)
       |SELECT d.$idCol AS doc_id,
       |  CAST(coalesce(c.bpe_tokens, 0) AS INTEGER) AS bpe_tokens
       |FROM $table d LEFT JOIN counts c ON c.doc_id = d.$idCol
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // training
  // ------------------------------------------------------------------

  /** Distributed word counting — the corpus-wide pass of BPE training.
    * Returns (word, cnt), one shuffle with map-side combine. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(textCol).cast("string")).as[String]
      .flatMap(preTokenize)
      .groupBy(col("value").as("word"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Sennrich training loop over an aggregated vocabulary: at each
    * step merge the most frequent adjacent symbol pair (ties broken by
    * (left, right) UTF-8 BINARY order — [[graft.operators.BpeTrain
    * .ltUtf8]], the comparator Spark itself sorts strings with — so
    * the vocab really is deterministic across runs AND engines; Java
    * String order compares UTF-16 code units and disagrees on
    * supplementary-plane symbols). Driver-side by design — the vocab
    * is the AGGREGATED word list, not the corpus. */
  def train(vocab: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words: Map[Vector[String], Long] = vocab.groupBy(w => symbols(w._1))
      .map { case (syms, ws) => syms -> ws.map(_._2).sum }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        pairCounts.foreach { case (p, n) =>
          if (best == null || n > best._2 ||
            (n == best._2 && graft.operators.BpeTrain.ltUtf8(p, best._1)))
            best = (p, n)
        }
        val pair = best._1
        merges += pair
        // the one shared greedy-merge kernel (BpeTrain.mergePair) —
        // two inlined copies had already drifted on the tie-break
        words = words.map { case (syms, n) =>
          graft.operators.BpeTrain.mergePair(syms, pair._1, pair._2)
            .toVector -> n
        }.groupBy(_._1).map { case (k, vs) => k -> vs.values.sum }
        step += 1
      }
    }
    merges.toSeq
  }

  /** Train merges end-to-end on a corpus: distributed word count, then
    * the driver-side loop on the (bounded) vocabulary. `maxVocab`
    * caps driver memory — keep the most frequent words (ties by word,
    * deterministic). */
  def trainOnCorpus(docs: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 100000): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = wordCounts(docs, textCol)
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxVocab)
      .as[(String, Long)].collect().toSeq
    train(vocab, numMerges)
  }

  // ------------------------------------------------------------------
  // encoding at scale
  // ------------------------------------------------------------------

  /** Per-document BPE token count: (id, bpe_tokens INT). Merges are
    * broadcast; each partition keeps a word→length memo (Zipfian
    * corpora hit the memo for almost every token). Zero shuffles.
    * Ids must be NUMERIC: a non-numeric id raises with a pointed
    * message (the long cast silently nulled it and the primitive
    * tuple encoder then killed the task with an opaque NPE); a null
    * id passes through as a null id row. */
  def encodeCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranksB = spark.sparkContext.broadcast(
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap: Ranks)
    val idL = col(idCol).cast("long")
    docs.select(
        when(col(idCol).isNotNull && idL.isNull,
          raise_error(concat(lit("encodeCounts requires a numeric id; got "),
            col(idCol).cast("string"))).cast("long"))
          .otherwise(idL).as("id"),
        col(textCol).cast("string").as("text"))
      .as[(Option[Long], String)]
      .mapPartitions { it =>
        val ranks = ranksB.value
        val memo = scala.collection.mutable.Map.empty[String, Int]
        it.map { case (id, text) =>
          val n = preTokenize(text).iterator
            .map(w => memo.getOrElseUpdate(w, encodeWord(w, ranks).length))
            .sum
          (id, n)
        }
      }
      .toDF("id", "bpe_tokens")
  }
}
