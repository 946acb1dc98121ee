package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus pipelines.
  *
  * All pure `org.apache.spark.sql.functions` compositions — codegen'd,
  * no UDFs in the hot path, so they stay inside whole-stage codegen at
  * any scale. Heuristics mirror the shapes a training-data pipeline
  * needs (lang-id, quality scoring, token counting, fingerprinting);
  * the reference's analogous string surface is SURVEY §2.8 (X1-X10).
  */
object TextFunctions {

  /** Let-binding for HOF lambdas: evaluate `arr` ONCE and expose it to
    * `body` as a bound lambda variable (the single-element-array
    * transform trick). Spark's higher-order functions re-evaluate
    * their entire lambda body per element, so an expression like
    * `transform(sequence(...), i -> slice(tokens(text), ...))`
    * re-tokenizes the whole document once PER ELEMENT — O(n²) per row
    * (measured 4-8× on the n-gram family at sf0.1). Binding the token
    * array makes it O(n).
    */
  private[graft] def bindArray(arr: Column)(body: Column => Column): Column =
    get(transform(array(arr), a => body(a)), lit(0))

  /** Whitespace tokenizer (BPE-ish splitting is `tokensRegex`). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Distinct token set. */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Token count (whitespace). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word segmentation: splits on whitespace AND at
    * letter/digit/punct boundaries (a cheap stand-in for a real BPE
    * vocab, deterministic and engine-portable).
    */
  def tokensRegex(text: Column): Column =
    filter(
      split(trim(text), "(?:\\s+|(?<=[0-9])(?=[^0-9\\s])|(?<=[^0-9\\s])(?=[0-9])|(?<=[\\p{Punct}])|(?=[\\p{Punct}]))"),
      t => length(t) > 0)

  /** Canonical whitespace-collapsed lowercase form. */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** The portable md5 bucket: low-60-bit value of an md5 HEX column
    * mod `n` — the q68 recipe, re-derivable in any engine with md5
    * (`CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT) % n`).
    * Single-sited (review r9): the feature maps (QualityClassifier,
    * DataSelection) pass `md5(feature)`, the shard hash
    * (Sampling.shuffleShards) a seeded digest — a drift in this
    * cross-engine-sensitive expression breaks oracle parity at every
    * consumer at once, which is exactly why there is one of it.
    */
  def md5Bucket(md5Hex: Column, n: Long): Column =
    pmod(conv(substring(md5Hex, 1, 15), 16, 10).cast("long"),
      lit(n)).cast("int")

  /** Deterministic 128-bit document fingerprint over the normalized
    * text — the exact-dedup key. (md5 is stable across engines, unlike
    * xxhash64 seeds in other systems.)
    */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Word n-grams (space-joined token windows, WITH repeats — the
    * repetition signals need multiplicity). Empty for docs with fewer
    * than n tokens: guarded, because Spark's `sequence(1, stop)`
    * counts BACKWARD when stop < 1 instead of returning empty.
    */
  def ngrams(text: Column, n: Int): Column = bindArray(tokens(text)) { toks =>
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Gopher-style repetition signal: the fraction of n-gram windows
    * that repeat an earlier window (0 = no repetition). Null for docs
    * with fewer than n tokens. Pure projection — no shuffle, no UDF.
    */
  def dupNgramFraction(text: Column, n: Int): Column =
    bindArray(ngrams(text, n)) { g =>
      round((size(g) - size(array_distinct(g))).cast("double") /
        nullif(size(g), lit(0)).cast("double"), 6)
    }

  /** Count of characters matching a single-char regex class —
    * implemented as length-difference so it ports to any engine.
    */
  def charClassCount(text: Column, clazz: String): Column =
    length(text) - length(regexp_replace(text, clazz, ""))

  def cjkCount(text: Column): Column = charClassCount(text, "[\\x{4E00}-\\x{9FFF}]")
  def kanaCount(text: Column): Column = charClassCount(text, "[\\x{3040}-\\x{30FF}]")
  def hangulCount(text: Column): Column = charClassCount(text, "[\\x{AC00}-\\x{D7AF}]")
  def latinCount(text: Column): Column = charClassCount(text, "[A-Za-z]")
  def digitCount(text: Column): Column = charClassCount(text, "[0-9]")
  def punctCount(text: Column): Column = charClassCount(text, "[\\p{Punct}]")
  def wsCount(text: Column): Column = charClassCount(text, "\\s")

  /** Heuristic language ID from character-class densities.
    * Rule order: script dominance (CJK/kana/hangul) before latin.
    */
  def langId(text: Column): Column = {
    val n = greatest(length(text), lit(1)).cast("double")
    val cjk = cjkCount(text) / n
    val kana = kanaCount(text) / n
    val hangul = hangulCount(text) / n
    val latin = latinCount(text) / n
    when(kana > 0.05, "ja")
      .when(hangul > 0.2, "ko")
      .when(cjk > 0.2, "zh")
      .when(latin > 0.4, "en")
      .otherwise("other")
  }

  /** Quality score in [0,1]: penalizes extreme length, high
    * punct/digit density, low word diversity. Deterministic integer
    * ratios → double, so it hashes identically cross-engine.
    */
  def qualityScore(text: Column): Column = bindArray(tokens(text)) { toks =>
    val n = greatest(length(text), lit(1)).cast("double")
    val nTok = greatest(size(toks), lit(1)).cast("double")
    val lenOk = when(length(text).between(20, 10000), lit(1.0)).otherwise(lit(0.0))
    val punctRatio = punctCount(text).cast("double") / n
    val digitRatio = digitCount(text).cast("double") / n
    val diversity = size(array_distinct(toks)).cast("double") / nTok
    round(
      lit(0.25) * lenOk
        + lit(0.25) * when(punctRatio < 0.1, 1.0).otherwise(0.0)
        + lit(0.25) * when(digitRatio < 0.3, 1.0).otherwise(0.0)
        + lit(0.25) * least(diversity * 2.0, lit(1.0)),
      6)
  }

  /** Non-overlapping token chunks of length `n` (the last chunk may be
    * shorter) — a deterministic segmentation for segment-level dedup
    * when the source has no natural line structure. Unlike [[ngrams]]
    * the chunks PARTITION the token stream: concatenating them
    * reproduces the normalized document.
    */
  def tokenChunks(text: Column, n: Int): Column =
    bindArray(tokens(text)) { toks =>
      when(size(toks) === 0, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), floor((size(toks) - 1) / n).cast("int")),
          i => concat_ws(" ", slice(toks, i * n + 1, lit(n)))))
    }

  // PII patterns, shared verbatim by the Spark side and the DuckDB
  // oracle: the subset of regex syntax where java.util.regex and RE2
  // agree (ASCII classes, bounded quantifiers, \b on ASCII words).
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePattern = "\\b\\d{3}-\\d{4}\\b"

  /** Count of email / IPv4 / phone-shaped spans (non-overlapping,
    * leftmost-first — the semantics java.util.regex and RE2 share).
    */
  def emailCount(text: Column): Column = regexp_count(text, lit(emailPattern))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(ipv4Pattern))
  def phoneCount(text: Column): Column = regexp_count(text, lit(phonePattern))

  /** PII-redacted text: emails, then IPv4s, then phone-shaped spans
    * replaced with typed placeholder tokens (the Dolma/FineWeb-style
    * pre-training scrub). Order matters only in that emails are
    * removed before the narrower numeric patterns run; the three
    * patterns themselves cannot overlap (an email span contains '@',
    * an IPv4 span is digits-and-dots, a phone span digits-and-dash).
    */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  /** Word k-shingles of the token stream (for MinHash / Jaccard). */
  def shingles(text: Column, k: Int): Column =
    bindArray(tokens(text)) { toks =>
      val idx = sequence(lit(0), greatest(size(toks) - k, lit(0)))
      when(size(toks) < k, array(array_join(toks, " ")))
        .otherwise(array_distinct(
          transform(idx, i => array_join(slice(toks, i + 1, lit(k)), " "))))
    }
}
