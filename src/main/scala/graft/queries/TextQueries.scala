package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the documents table: token counting,
  * quality scoring, language ID, fingerprinting. All are single-pass
  * narrow scans (no shuffle at all except the final orderBy for
  * deterministic output) — at 100 TB these read parquet once with
  * only (doc_id, text) in the ReadSchema.
  */
object TextQueries {

  private def q12(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_uniq_tokens"),
        length(col("text")).as("n_chars_measured"))
      .orderBy(col("doc_id"))

  private val q12Sql =
    """SELECT doc_id,
      |  length(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> length(x) > 0)) AS n_tokens,
      |  length(list_distinct(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> length(x) > 0))) AS n_uniq_tokens,
      |  length(text) AS n_chars_measured
      |FROM documents ORDER BY doc_id""".stripMargin

  private def q13(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .select(col("doc_id"), qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  private val q13Sql =
    """SELECT doc_id, round(
      |  0.25 * (CASE WHEN length(text) BETWEEN 20 AND 10000 THEN 1.0 ELSE 0.0 END)
      |  + 0.25 * (CASE WHEN CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / greatest(length(text), 1) < 0.1 THEN 1.0 ELSE 0.0 END)
      |  + 0.25 * (CASE WHEN CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / greatest(length(text), 1) < 0.3 THEN 1.0 ELSE 0.0 END)
      |  + 0.25 * least(CAST(length(list_distinct(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> length(x) > 0))) AS DOUBLE)
      |      / greatest(length(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> length(x) > 0)), 1) * 2.0, 1.0)
      |, 6) AS quality
      |FROM documents ORDER BY doc_id""".stripMargin

  private def q14(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .select(col("doc_id"), langId(col("text")).as("lang_pred"))
      .orderBy(col("doc_id"))

  private val q14Sql =
    """SELECT doc_id, CASE
      |  WHEN CAST(length(text) - length(regexp_replace(text, '[\x{3040}-\x{30FF}]', '', 'g')) AS DOUBLE) / greatest(length(text), 1) > 0.05 THEN 'ja'
      |  WHEN CAST(length(text) - length(regexp_replace(text, '[\x{AC00}-\x{D7AF}]', '', 'g')) AS DOUBLE) / greatest(length(text), 1) > 0.2 THEN 'ko'
      |  WHEN CAST(length(text) - length(regexp_replace(text, '[\x{4E00}-\x{9FFF}]', '', 'g')) AS DOUBLE) / greatest(length(text), 1) > 0.2 THEN 'zh'
      |  WHEN CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE) / greatest(length(text), 1) > 0.4 THEN 'en'
      |  ELSE 'other' END AS lang_pred
      |FROM documents ORDER BY doc_id""".stripMargin

  private def q15(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  private val q15Sql =
    """SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Real-vocab BPE token counts (token budgeting for training
    * pipelines): merges from the committed fixture vocab (trained by
    * BpeTrainDemo, deterministic), broadcast to a zero-shuffle
    * per-partition encoder. FULL oracle since round 9: the
    * lowest-rank-first encode fixpoint is a DuckDB RECURSIVE CTE over
    * distinct words ([[graft.functions.Bpe.encodeCountsOracleSql]]) —
    * every merge decision, splice and per-doc count re-derives in SQL.
    * BpeSpec additionally pins counts against an independent Python
    * reference implementation on the same merges file. */
  private def q37(s: SparkSession, dir: String): DataFrame =
    graft.functions.Bpe.encodeCounts(Tables(s, dir).documents,
      "doc_id", "text",
      graft.functions.Bpe.mergesFixture)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** BM25 relevance of every document against a fixed topic query
    * (TextRank.bm25). k1 = 1.25 (not the 1.2 default) so every
    * constant in the weight formula is an exact binary double —
    * cross-engine parity then rests only on the rounded ln and exact
    * decimal sums. */
  private def q40(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextRank.bm25(Tables(s, dir).documents,
        "doc_id", "text", Seq("spark", "vector", "hash"),
        k1 = 1.25, b = 0.75)
      .orderBy(col("doc_id"))

  private val q40Sql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(
      |      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), '\s+'),
      |      x -> length(x) > 0) AS tk
      |  FROM documents),
      |lens AS (SELECT doc_id, length(tk) AS dl FROM toks),
      |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM lens),
      |hits AS (
      |  SELECT doc_id, t AS term, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(tk) AS t FROM toks)
      |  WHERE t IN ('spark', 'vector', 'hash') GROUP BY 1, 2),
      |dfreq AS (SELECT term, count(*) AS df FROM hits GROUP BY 1)
      |SELECT h.doc_id, count(*) AS n_hit,
      |  CAST(sum(
      |    CAST(round(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)), 6) AS DECIMAL(18,6))
      |    * CAST(round((CAST(h.tf AS DOUBLE) * 2.25)
      |        / (CAST(h.tf AS DOUBLE) + 1.25 * (0.25 + 0.75 *
      |            (CAST(l.dl AS DOUBLE)
      |             / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))), 6)
      |      AS DECIMAL(18,6))) AS DOUBLE) AS score
      |FROM hits h
      |JOIN dfreq d USING (term)
      |JOIN lens l USING (doc_id)
      |CROSS JOIN stats s
      |GROUP BY h.doc_id
      |ORDER BY doc_id""".stripMargin

  /** PII tagging + redaction (the Dolma/FineWeb-style pre-training
    * scrub: emails, IPv4s, phone-shaped spans → typed placeholders).
    * The synthetic corpus contains no natural PII (no digits, no '@'),
    * so PII-shaped spans are deterministically planted in every 7th
    * document INSIDE the query on both engines (the q41
    * synthesized-graph precedent) — the regex tag/redact machinery is
    * what the full DuckDB oracle verifies. Zero-shuffle projection.
    */
  /** The planted-PII fixture expression shared by q53 and q57's
    * composed pipeline (one site: a tweak to the planted span shape
    * must change both gate queries and their SQL oracles together —
    * the oracles necessarily duplicate the formula in SQL). */
  private[queries] def plantPii(docId: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(docId % 7 === 0,
      concat(text, lit(" contact user"), docId.cast("string"),
        lit("@example.com from 10.0."), (docId % 256).cast("string"),
        lit("."), (docId % 100).cast("string"),
        lit(" tel 555-"), lpad((docId % 10000).cast("string"), 4, "0")))
      .otherwise(text)

  private def q53(s: SparkSession, dir: String): DataFrame = {
    val aug = Tables(s, dir).documents.withColumn("text2",
      plantPii(col("doc_id"), col("text")))
    aug.select(col("doc_id"),
        emailCount(col("text2")).cast("long").as("n_emails"),
        ipv4Count(col("text2")).cast("long").as("n_ips"),
        phoneCount(col("text2")).cast("long").as("n_phones"),
        piiRedact(col("text2")).as("redacted"))
      .orderBy(col("doc_id"))
  }

  private val q53Sql =
    """WITH aug AS (
      |  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN
      |    text || ' contact user' || CAST(doc_id AS VARCHAR)
      |      || '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
      |      || '.' || CAST(doc_id % 100 AS VARCHAR)
      |      || ' tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |    ELSE text END AS text2
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(length(regexp_extract_all(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(length(regexp_extract_all(text2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
      |  CAST(length(regexp_extract_all(text2, '\b\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
      |  regexp_replace(regexp_replace(regexp_replace(text2,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
      |    '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted
      |FROM aug ORDER BY doc_id""".stripMargin

  /** Bigram-LM fluency scoring (q60) — the CCNet perplexity-filter
    * discipline as a relational operator: the model trains on a
    * deterministic trusted slice (every 7th doc), scores ALL docs, and
    * the full DuckDB oracle re-derives the model (bigram counts, head
    * counts, vocabulary) AND the per-doc surprisal sums — rounded
    * log2 terms accumulated in exact decimal (the q31/q40 float
    * discipline), so a drift in smoothing, tokenization, or the
    * OOV path fails the hash at all three SFs.
    */
  private def q60(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir).documents
    val model = graft.operators.NgramLm.train(
      d.filter(col("doc_id") % 7 === 0), "text")
    graft.operators.NgramLm.score(d, "doc_id", "text", model)
      .orderBy(col("doc_id"))
  }

  private val q60Sql =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(text), '\s+'),
      |      x -> length(x) > 0) AS toks
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, unnest(toks) AS w,
      |    generate_subscripts(toks, 1) AS p
      |  FROM t),
      |bg AS (
      |  SELECT doc_id, w AS w1,
      |    lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS w2
      |  FROM pos QUALIFY w2 IS NOT NULL),
      |tbg AS (SELECT w1, w2, count(*) AS c FROM bg
      |  WHERE doc_id % 7 = 0 GROUP BY 1, 2),
      |thead AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c1 FROM tbg GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS V FROM pos WHERE doc_id % 7 = 0),
      |terms AS (
      |  SELECT b.doc_id, g.c IS NULL AS oov,
      |    -round(log2(CAST(coalesce(g.c, 0) + 1 AS DOUBLE)
      |      / CAST(coalesce(u.c1, 0) + v.V AS DOUBLE)), 6) AS bits
      |  FROM bg b
      |  LEFT JOIN tbg g ON b.w1 = g.w1 AND b.w2 = g.w2
      |  LEFT JOIN thead u ON b.w1 = u.w1
      |  CROSS JOIN v),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_bigrams,
      |    CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |    CAST(sum(CAST(bits AS DECIMAL(28,6))) AS DOUBLE) AS sum_bits
      |  FROM terms GROUP BY doc_id)
      |SELECT t.doc_id,
      |  CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
      |  CAST(coalesce(a.n_oov, 0) AS BIGINT) AS n_oov,
      |  a.sum_bits, a.sum_bits / a.n_bigrams AS avg_bits
      |FROM t LEFT JOIN agg a USING (doc_id)
      |ORDER BY t.doc_id""".stripMargin

  /** CCNet perplexity-bucket filtering (q64) — the composition the
    * CCNet pipeline actually runs (Wenzek et al., LREC 2020 §4.4:
    * score every document under the trusted-corpus LM, split each
    * language at the 1/3 and 2/3 perplexity quantiles into
    * head/middle/tail, keep the fluent buckets): q60's bigram model
    * scores the corpus, per-language EXACT tercile boundaries come
    * from the q43 rank-pick (one window over the per-doc scores —
    * tiny: one row per document, not per token), and each doc is
    * bucketed against its language's boundaries. Docs too short to
    * score (no bigrams) bucket as 'na'.
    *
    * The full DuckDB oracle re-derives the model, the scores, the
    * quantile_cont tercile boundaries AND the bucketing. Boundary
    * doubles never appear in the output (bucket strings only), and the
    * boundary is interpolated with quantile_cont's OWN formula —
    * v_lo + frac·(v_hi − v_lo), the lo/hi rank values aggregated
    * separately — not the algebraically-equal-but-FP-different
    * v_lo·(1−frac) + v_hi·frac sum of shares. The distinction matters
    * exactly when the boundary straddles two EQUAL scores (duplicate
    * docs): the share formulation can land 1 ulp below the tied score
    * and flip that doc head↔middle between engines; with this formula
    * a tied straddle yields v + frac·0 = v bit-exactly in both
    * engines, and a non-tied straddle separates adjacent scores by
    * far more than 1 ulp, so bucketing is robust.
    */
  private def q64(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables(s, dir).documents
    val model = graft.operators.NgramLm.train(
      d.filter(col("doc_id") % 7 === 0), "text")
    val scored = graft.operators.NgramLm.score(d, "doc_id", "text", model)
      .join(d.select(col("doc_id"), col("lang")), "doc_id")
    val byLang = Window.partitionBy(col("lang"))
    val ranked = scored.filter(col("avg_bits").isNotNull)
      .withColumn("rn",
        row_number().over(byLang.orderBy(col("avg_bits"), col("doc_id"))) - 1)
      .withColumn("n", count(lit(1)).over(byLang))
    // rank-pick the lo/hi values at r = (n-1)p, plus the fractional
    // offset (constant per language); the group input is one row per
    // document, so the aggregate is tiny
    def r(p: Double): Column = (col("n") - 1) * lit(p)
    def lo(p: Double): Column = max(when(col("rn") === floor(r(p)), col("avg_bits")))
    def hi(p: Double): Column = max(when(col("rn") === ceil(r(p)), col("avg_bits")))
    def fr(p: Double): Column = max(r(p) - floor(r(p)))
    val bounds = ranked
      .groupBy(col("lang"))
      .agg(lo(1.0 / 3).as("lo33"), hi(1.0 / 3).as("hi33"), fr(1.0 / 3).as("f33"),
        lo(2.0 / 3).as("lo66"), hi(2.0 / 3).as("hi66"), fr(2.0 / 3).as("f66"))
      .select(col("lang"),
        (col("lo33") + col("f33") * (col("hi33") - col("lo33"))).as("b33"),
        (col("lo66") + col("f66") * (col("hi66") - col("lo66"))).as("b66"))
    scored.join(broadcast(bounds), Seq("lang"), "left")
      .select(col("doc_id"), col("lang"), col("avg_bits"),
        when(col("avg_bits").isNull, "na")
          .when(col("avg_bits") <= col("b33"), "head")
          .when(col("avg_bits") <= col("b66"), "middle")
          .otherwise("tail").as("bucket"))
      .orderBy(col("doc_id"))
  }

  private val q64Sql =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    list_filter(regexp_split_to_array(trim(text), '\s+'),
      |      x -> length(x) > 0) AS toks
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, unnest(toks) AS w,
      |    generate_subscripts(toks, 1) AS p
      |  FROM t),
      |bg AS (
      |  SELECT doc_id, w AS w1,
      |    lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS w2
      |  FROM pos QUALIFY w2 IS NOT NULL),
      |tbg AS (SELECT w1, w2, count(*) AS c FROM bg
      |  WHERE doc_id % 7 = 0 GROUP BY 1, 2),
      |thead AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c1 FROM tbg GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS V FROM pos WHERE doc_id % 7 = 0),
      |terms AS (
      |  SELECT b.doc_id,
      |    -round(log2(CAST(coalesce(g.c, 0) + 1 AS DOUBLE)
      |      / CAST(coalesce(u.c1, 0) + v.V AS DOUBLE)), 6) AS bits
      |  FROM bg b
      |  LEFT JOIN tbg g ON b.w1 = g.w1 AND b.w2 = g.w2
      |  LEFT JOIN thead u ON b.w1 = u.w1
      |  CROSS JOIN v),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_bigrams,
      |    CAST(sum(CAST(bits AS DECIMAL(28,6))) AS DOUBLE) AS sum_bits
      |  FROM terms GROUP BY doc_id),
      |scored AS (
      |  SELECT t.doc_id, t.lang, a.sum_bits / a.n_bigrams AS avg_bits
      |  FROM t LEFT JOIN agg a USING (doc_id)),
      |bounds AS (
      |  SELECT lang, quantile_cont(avg_bits, 1.0/3) AS b33,
      |    quantile_cont(avg_bits, 2.0/3) AS b66
      |  FROM scored WHERE avg_bits IS NOT NULL GROUP BY lang)
      |SELECT s.doc_id, s.lang, s.avg_bits, CASE
      |    WHEN s.avg_bits IS NULL THEN 'na'
      |    WHEN s.avg_bits <= b.b33 THEN 'head'
      |    WHEN s.avg_bits <= b.b66 THEN 'middle'
      |    ELSE 'tail' END AS bucket
      |FROM scored s LEFT JOIN bounds b USING (lang)
      |ORDER BY s.doc_id""".stripMargin

  /** Distributed BPE merge learning (q63) — FULL oracle since round
    * 9: the iterative argmax + greedy-merge loop unrolls as a
    * generated 30-iteration CTE chain ([[graft.operators.BpeTrain
    * .oracleSql]] — the q78 Lloyd precedent), so every pair count,
    * every argmax tie-break and every leftmost merge re-derives in
    * DuckDB. BpeTrainSpec additionally pins the merge table against
    * an independent Python BPE reference.
    */
  private def q63(s: SparkSession, dir: String): DataFrame =
    graft.operators.BpeTrain.learnMerges(Tables(s, dir).documents,
      "text", numMerges = 30)

  val all: Seq[Q] = Seq(
    Q("q12_token_stats", q12, Some(q12Sql)),
    Q("q13_text_quality", q13, Some(q13Sql), headline = true),
    Q("q14_lang_id", q14, Some(q14Sql)),
    Q("q15_fingerprint", q15, Some(q15Sql)),
    Q("q37_bpe_tokens", q37,
      Some(graft.functions.Bpe.encodeCountsOracleSql(
        "documents", "doc_id", "text", graft.functions.Bpe.mergesFixture))),
    Q("q40_bm25", q40, Some(q40Sql)),
    Q("q53_pii_redact", q53, Some(q53Sql)),
    Q("q60_ngram_lm_score", q60, Some(q60Sql), headline = true),
    Q("q63_bpe_train", q63,
      Some(graft.operators.BpeTrain.oracleSql("documents", "text", 30)),
      headline = true),
    Q("q64_perplexity_buckets", q64, Some(q64Sql), headline = true))
}
