package graft.operators

import graft.functions.TextFunctions.{bindArray, tokens}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — the storage-dedup boundary
  * discipline (Muthitacharoen et al., "A Low-Bandwidth Network File
  * System", SOSP 2001; the rolling-hash cut rule behind LBFS, Venti,
  * restic, and data-lake chunk stores): a chunk boundary falls AFTER
  * token i whenever the hash of the k-token window ending at i is
  * ≡ 0 mod `divisor`, so boundaries are a function of CONTENT, not
  * position — insert one sentence into a document and only the
  * chunk containing it changes, while every downstream chunk
  * re-aligns (fixed-size blocks would all shift and nothing would
  * dedup). Expected chunk length ≈ `divisor` tokens.
  *
  * Token-level rather than byte-level: the unit the rest of the text
  * pipeline speaks ([[Dedup.dedupSegments]] dedups caller-chosen
  * segments; CDC derives the segmentation from content so repeats
  * dedup even when they are NOT aligned on segment boundaries — the
  * same blind spot [[Dedup.dedupSubstrings]] attacks, but with
  * chunk-store semantics: stable addressable units, not span cuts).
  *
  * Scale shape: chunking is ONE fused array projection per document —
  * window hashes, boundary positions, and chunk slices all evaluate
  * in a single codegen stage, zero shuffles; the only wide operation
  * downstream of [[cdcChunks]] is whatever the caller does with the
  * (doc_id, chunk) relation. [[cdcDedupStats]] adds the one
  * aggregation of the 16-byte chunk hashes (map-side combine
  * collapses hot chunks per partition — the dedupSegments skew
  * discipline) and a keyed join back; chunk TEXT never shuffles.
  */
object Chunking {

  /** Chunk every document. Returns (doc_id, chunk_idx, chunk,
    * n_tokens) — one row per chunk, `chunk_idx` 0-based in document
    * order, `n_tokens` the chunk's token count. Empty documents yield
    * no rows.
    *
    * `hashFn` maps the window string to a LONG; default xxhash64 (the
    * scale path), [[Dedup.md5Hash60]] for engine-portable gates.
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, divisor: Int = 16,
      hashFn: Column => Column = xxhash64(_)): DataFrame = {
    require(k >= 1 && divisor >= 1, "k and divisor must be positive")
    val chunksCol = bindArray(tokens(col(textCol))) { ts =>
      val n = size(ts)
      // boundary after 0-based token i (i ∈ [k−1, n−2]: a window must
      // fit, and a boundary after the last token is vacuous) when the
      // window hash ≡ 0 mod divisor. sequence() counts BACKWARD for
      // stop < start — guard the short-doc case to empty explicitly.
      val bposRaw = when(n >= k + 1,
        filter(sequence(lit(k - 1), n - 2), i =>
          pmod(hashFn(concat_ws(" ", slice(ts, i - (k - 2), lit(k)))),
            lit(divisor)) === 0))
        .otherwise(array().cast("array<int>"))
      bindArray(bposRaw) { bpos =>
        val starts = concat(array(lit(0)), transform(bpos, b => b + 1))
        val ends = concat(bpos, array(n - 1))
        when(n > 0,
          zip_with(starts, ends, (s, e) =>
            struct(array_join(slice(ts, s + 1, e - s + 1), " ").as("chunk"),
              (e - s + 1).as("n_tokens"))))
          .otherwise(array().cast(
            "array<struct<chunk:string,n_tokens:int>>"))
      }
    }
    docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(chunksCol).as(Seq("chunk_idx", "c")))
      .select(col("doc_id"), col("chunk_idx"),
        col("c.chunk").as("chunk"),
        col("c.n_tokens").cast("long").as("n_tokens"))
  }

  /** Corpus-wide chunk-store dedup accounting: chunk every document,
    * elect the globally-first occurrence of each distinct chunk (min
    * (doc_id, chunk_idx) — the store's canonical copy), and report
    * per document how much of it is already stored elsewhere.
    *
    * Returns one row per document:
    * (doc_id, n_chunks, n_dup_chunks, n_tokens, dup_tokens) — `dup`
    * counts chunk occurrences whose canonical copy is NOT this
    * occurrence; `dup_tokens / n_tokens` is the storage saved by
    * content addressing.
    */
  def cdcDedupStats(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, divisor: Int = 16,
      hashFn: Column => Column = xxhash64(_)): DataFrame = {
    val ch = cdcChunks(docs, idCol, textCol, k, divisor, hashFn)
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
        unhex(md5(col("chunk"))).as("h"))
    val firsts = ch.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("f"))
    val stats = ch.join(firsts, "h")
      .withColumn("__dup",
        struct(col("doc_id"), col("chunk_idx")) =!= col("f"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("__dup").cast("long")).as("n_dup_chunks"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("__dup"), col("n_tokens")).otherwise(0L))
          .as("dup_tokens"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
  }
}
