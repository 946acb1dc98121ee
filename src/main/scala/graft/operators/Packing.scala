package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: assign variable-length
  * documents to fixed-capacity training sequences ("bins" of
  * `maxTokens`), minimizing padding waste. The classic bin-packing
  * step every large-scale pretraining pipeline runs between curation
  * and shard writing.
  *
  * Distribution shape — TWO-LEVEL, because packing is an inherently
  * sequential decision but never needs global state:
  *   1. docs are hashed into `numShards` deterministic shards
  *      (xxhash64 of the id — reproducible across runs and retries;
  *      shard count bounds the per-task working set, so executors pack
  *      a few hundred MB each regardless of corpus size);
  *   2. within a shard, first-fit-decreasing over the doc weights —
  *      the textbook FFD guarantee (≤ 11/9·OPT + 6/9 bins; Dósa 2007)
  *      applies per shard, and packing quality is insensitive to the
  *      shard split because weights ≪ capacity mix freely.
  * A doc longer than `maxTokens` gets its own bin (flagged
  * `oversize`) — the caller decides whether to truncate or split;
  * silently dropping it would bias the corpus.
  *
  * Output: (doc_id, shard, bin, weight, bin_fill, oversize) — one row
  * per input doc; (shard, bin) is the training-sequence key and
  * bin_fill its total payload for packing-efficiency accounting.
  *
  * Determinism: shard assignment is a pure hash; FFD scans docs in
  * (weight desc, id) order and bins are numbered in creation order —
  * the output is a pure function of the input set.
  */
object Packing {

  final case class Packed(doc_id: Long, shard: Int, bin: Int,
    weight: Int, bin_fill: Int, oversize: Boolean)

  def packSequences(docs: DataFrame, idCol: String,
      weight: org.apache.spark.sql.Column, maxTokens: Int,
      numShards: Int = 256): Dataset[Packed] = {
    require(numShards > 0)
    pack(docs, idCol, weight, maxTokens,
      pmod(xxhash64(col(idCol).cast("long")), lit(numShards)))
  }

  /** [[packSequences]] with an ENGINE-PORTABLE shard hash — the q79
    * oracle twin. xxhash64 is Spark-specific, so the only assumed
    * ingredient in q47 was the shard assignment; md5-prefix sharding
    * (`('0x' || substring(md5(id), 1, 8))::BIGINT % numShards`, the
    * q45/q69 idiom) lets a SQL engine re-derive shard, FFD bin walk,
    * fills and oversize flags value-for-value (first-fit-decreasing
    * is sequential but bounded per shard, so a recursive CTE replays
    * it doc-by-doc — see q79's oracle). Same FFD kernel, same
    * guarantees; the hash costs one md5 per doc instead of one
    * xxhash64 — noise next to the text scan either side.
    */
  def packSequencesPortable(docs: DataFrame, idCol: String,
      weight: org.apache.spark.sql.Column, maxTokens: Int,
      numShards: Int = 256): Dataset[Packed] = {
    require(numShards > 0)
    pack(docs, idCol, weight, maxTokens, portableShard(col(idCol), numShards))
  }

  /** The portable shard hash, single-sited (round 12): this operator,
    * the streaming twin ([[graft.streaming.EventStreams
    * .packedStream]]) and the utilization probe must shard
    * identically or their comparisons stop meaning anything. */
  private[graft] def portableShard(id: org.apache.spark.sql.Column,
      numShards: Int): org.apache.spark.sql.Column =
    conv(substring(md5(id.cast("long").cast("string")), 1, 8), 16, 10)
      .cast("long") % numShards

  private def pack(docs: DataFrame, idCol: String,
      weight: org.apache.spark.sql.Column, maxTokens: Int,
      shardExpr: org.apache.spark.sql.Column): Dataset[Packed] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(maxTokens > 0)
    val keyed = docs.select(
      col(idCol).cast("long").as("doc_id"),
      shardExpr.cast("int").as("shard"),
      weight.cast("int").as("weight"))
      .as[(Long, Int, Int)]
    keyed.groupByKey(_._2).flatMapGroups { (shard, it) =>
      // FFD: heaviest first, id tiebreak for determinism
      val ds = it.map { case (id, _, w) => (id, w) }.toArray
      java.util.Arrays.sort(ds, Ordering.by[(Long, Int), (Int, Long)] {
        case (id, w) => (-w, id)
      })
      val fills = scala.collection.mutable.ArrayBuffer.empty[Int]
      val assign = new Array[Int](ds.length)
      var i = 0
      while (i < ds.length) {
        val w = ds(i)._2
        // first bin with room; oversize docs always open their own
        var b = 0
        while (b < fills.length && (w > maxTokens || fills(b) + w > maxTokens)) b += 1
        if (b == fills.length) fills += 0
        fills(b) += w
        assign(i) = b
        i += 1
      }
      ds.indices.iterator.map { j =>
        val (id, w) = ds(j)
        Packed(id, shard, assign(j), w, fills(assign(j)), w > maxTokens)
      }
    }
  }
}
