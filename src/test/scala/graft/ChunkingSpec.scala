package graft

import graft.operators.{Chunking, Dedup}
import org.apache.spark.sql.functions._

/** Content-defined chunking (q62) and frequency-threshold boilerplate
  * removal (q61): hand-derived boundaries and counts on crafted
  * corpora pin the cut rule, the edge cases (short/empty docs), the
  * content-defined re-alignment property that motivates CDC, and the
  * remove-ALL-copies semantics that distinguishes the C4 filter from
  * keep-first segment dedup.
  */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private val hash = Dedup.md5Hash60 _

  /** The same boundary rule, computed independently of the operator:
    * boundary after 0-based token i (k−1 ≤ i ≤ n−2) iff
    * md5-60(window) % divisor == 0. */
  private def boundaries(toks: Seq[String], k: Int, d: Int): Seq[Int] = {
    val rows = toks.indices.drop(k - 1).dropRight(1).map { i =>
      (i, toks.slice(i - k + 1, i + 1).mkString(" "))
    }
    if (rows.isEmpty) return Seq.empty
    val hashed = rows.toDF("i", "w")
      .select(col("i"), pmod(hash(col("w")), lit(d)).as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.map(_._1).filter(i => hashed(i) == 0L)
  }

  test("chunks cover the document exactly, in order, cut at the rule's boundaries") {
    val text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    val toks = text.split(" ").toSeq
    val got = Chunking.cdcChunks(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", k = 3, divisor = 4, hashFn = hash)
      .orderBy("chunk_idx").collect()
    // reassembly: chunks concatenated in order == original tokens
    assert(got.map(_.getString(2)).mkString(" ") === text)
    assert(got.map(_.getLong(3)).sum === toks.size.toLong)
    // each chunk ends exactly at an independent-derivation boundary
    val bs = boundaries(toks, 3, 4)
    val ends = got.map(_.getLong(3)).scanLeft(0L)(_ + _).drop(1).dropRight(1)
    assert(ends.map(_ - 1).toSeq === bs.map(_.toLong))
  }

  test("short and empty documents: one chunk / no chunks") {
    val got = Chunking.cdcChunks(
      Seq((1L, "a b"), (2L, ""), (3L, "solo")).toDF("doc_id", "text"),
      "doc_id", "text", k = 3, divisor = 4, hashFn = hash)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    // doc 2 is empty → absent; docs 1 and 3 are sub-window → one chunk
    assert(got === Set((1L, "a b"), (3L, "solo")))
  }

  test("content-defined re-alignment: an insertion changes O(1) chunks") {
    // 200 tokens; insert one token near the front. Fixed-size blocks
    // would shift every downstream block; CDC re-aligns at the next
    // content boundary, so the chunk multisets differ only locally.
    val toks = (1 to 200).map(i => s"t${i % 37}x$i")
    val orig = toks.mkString(" ")
    val edited = (toks.take(5) ++ Seq("INSERTED") ++ toks.drop(5)).mkString(" ")
    val df = Seq((1L, orig), (2L, edited)).toDF("doc_id", "text")
    val ch = Chunking.cdcChunks(df, "doc_id", "text", k = 3, divisor = 8,
        hashFn = hash)
      .groupBy(col("chunk")).agg(countDistinct(col("doc_id")).as("docs"))
    val shared = ch.filter(col("docs") === 2).count()
    val total1 = Chunking.cdcChunks(df.filter(col("doc_id") === 1),
      "doc_id", "text", k = 3, divisor = 8, hashFn = hash).count()
    // all but the few chunks around the edit are shared verbatim
    assert(shared >= total1 - 3,
      s"expected near-total chunk reuse, got $shared of $total1")
  }

  test("dedup stats: duplicated tail dedups against its first occurrence") {
    val tail = "c1 c2 c3 c4 c5 c6 c7 c8"
    val df = Seq(
      (1L, s"unique a b $tail"),
      (2L, s"other d e f $tail")).toDF("doc_id", "text")
    val stats = Chunking.cdcDedupStats(df, "doc_id", "text",
        k = 2, divisor = 2, hashFn = hash)
      .orderBy("doc_id").collect()
    // doc 1 owns every first occurrence: zero dup
    assert(stats(0).getLong(2) === 0L)
    // doc 2's shared-tail chunks (those fully inside the common
    // suffix, after re-alignment) are dups; token accounting is
    // consistent
    assert(stats(1).getLong(1) > 0L)
    assert(stats(1).getLong(4) <= stats(1).getLong(3))
    // totals equal the documents' token counts (3 + 8 and 4 + 8)
    assert(stats(0).getLong(3) === 11L && stats(1).getLong(3) === 12L)
  }

  test("boilerplate removal drops EVERY copy at df >= threshold, keeps rare segments") {
    import graft.functions.TextFunctions.tokenChunks
    // segment = 2 tokens; "B B" appears in 3 docs (boilerplate at
    // minDf=3), "R R" in 2 (kept)
    val df = Seq(
      (1L, "B B R R u1 u2"),
      (2L, "B B R R u3 u4"),
      (3L, "B B u5 u6")).toDF("doc_id", "text")
    val got = Dedup.removeFrequentSegments(df, "doc_id",
        tokenChunks(col("text"), 2), minDf = 3)
      .orderBy("doc_id").collect()
    assert(got.map(_.getString(3)).toSeq ===
      Seq("R R u1 u2", "R R u3 u4", "u5 u6"))
    assert(got.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((3L, 2L), (3L, 2L), (2L, 1L)))
  }

  test("boilerplate removal can empty a document; empty docs survive as rows") {
    import graft.functions.TextFunctions.tokenChunks
    val df = Seq(
      (1L, "X Y"), (2L, "X Y"), (3L, "X Y"), (4L, "")).toDF("doc_id", "text")
    val got = Dedup.removeFrequentSegments(df, "doc_id",
        tokenChunks(col("text"), 2), minDf = 3)
      .orderBy("doc_id").collect()
    assert(got.length === 4)
    assert(got.take(3).forall(r => r.getLong(2) === 0L && r.getString(3) == ""))
    assert(got(3).getLong(1) === 0L && got(3).getString(3) === "")
  }
}
