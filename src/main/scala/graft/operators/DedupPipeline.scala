package graft.operators

import graft.functions.TextFunctions.{normalized, tokenSet}
import org.apache.spark.sql.graft.ArrayExpressions.sortedIntersectCount
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The COMPOSED near-dup pipeline — the LLM-curation sibling of the
  * q36 catalog chain: exact dedup → candidate generation → exact
  * verification → transitive closure → survivor election, one
  * DataFrame in, one DataFrame out, so column drift BETWEEN dedup
  * stages fails the oracle gate, not just per-operator specs.
  *
  * Stages (all shuffle on compact keys):
  *   1. exact dedup — one shuffle on the md5 fingerprint, min-id
  *      survivor ([[Dedup.dropExactDups]]);
  *   2. candidates — docs sharing a deterministic bucket key (first
  *      two normalized tokens: the prefix-bucketing family; any
  *      equi-joinable key slots in). A bucket-size cull drops
  *      boilerplate mega-buckets (the skew guard every banded join
  *      here carries) — declared, and mirrored by the oracle;
  *   3. verify — exact token-set Jaccard >= threshold inside buckets,
  *      via the zero-allocation sorted-merge intersect expression;
  *   4. closure — [[ConnectedComponents]] (min-label + pointer
  *      doubling, O(log diameter) rounds);
  *   5. election — component id (min doc id) is the canonical
  *      survivor; singletons are their own group.
  *
  * Returns one row per exact-dedup survivor:
  * (doc_id, dup_group, group_size, survivor).
  *
  * Scale: stages 1-3 are the q16/q17/q18 shapes (fingerprint shuffle,
  * bucketed self-equi-join with skew cull); stage 4 is O(log d)
  * keyed-shuffle rounds; stage 5 is one count per group. Nothing
  * driver-side, nothing O(N^2) outside a culled bucket.
  */
object DedupPipeline {

  /** Bucket key: first two tokens of the normalized text. */
  /** The near-dup candidate key (first two normalized tokens — the
    * reference's prefix-pairing scheme). private[graft]: the
    * streaming admission twin ([[graft.streaming.EventStreams
    * .textAdmittedStream]]) must bucket with the SAME key or the
    * batch/stream recall contracts drift. */
  private[graft] def bucketKey(text: org.apache.spark.sql.Column) =
    concat_ws("|", split_part(normalized(text), lit(" "), lit(1)),
      split_part(normalized(text), lit(" "), lit(2)))

  def nearDupGroups(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxBucketSize: Int = 1000,
      ccCollectThreshold: Long =
        ConnectedComponents.DefaultLocalClosureThreshold): DataFrame = {
    // 1. exact dedup (keeps all columns; min id per fingerprint)
    val surv = Dedup.dropExactDups(docs, idCol, textCol)
    // one scan feeds the bucket-size agg and both self-join sides
    val keyed = graft.CacheScope.track(
      surv.select(col(idCol).cast("long").as("id"),
        bucketKey(col(textCol)).as("bkey"),
        array_sort(tokenSet(normalized(col(textCol)))).as("toks")))
    // 2. boilerplate cull: mega-buckets out (declared skew guard)
    val okBuckets = keyed.groupBy(col("bkey"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucketSize && col("bsz") > 1)
      .select(col("bkey"))
    val side = keyed.join(okBuckets, "bkey")
    // 3. exact Jaccard verification inside buckets
    val pairs = side.select(col("bkey"), col("id").as("a_id"), col("toks").as("a_toks"))
      .join(side.select(col("bkey"), col("id").as("b_id"), col("toks").as("b_toks")),
        "bkey")
      .filter(col("a_id") < col("b_id"))
      .withColumn("inter", sortedIntersectCount(col("a_toks"), col("b_toks")))
      // division form, NOT inter >= thr*union: must round exactly like
      // the oracle's jaccard >= thr at boundary pairs (e.g. 16/20 vs 0.8)
      .filter(col("inter").cast("double") /
        (size(col("a_toks")) + size(col("b_toks")) - col("inter")).cast("double")
        >= lit(threshold))
      .select(col("a_id"), col("b_id"))
    // 4. transitive closure
    val comp = ConnectedComponents.components(pairs, "a_id", "b_id",
      collectThreshold = ccCollectThreshold)
    // 5. survivor election; singletons = own group of 1
    val assigned = keyed.select(col("id").as("doc_id"))
      .join(comp, col("doc_id") === col("node"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("dup_group"))
    val sizes = assigned.groupBy(col("dup_group"))
      .agg(count(lit(1)).as("group_size"))
    assigned.join(sizes, "dup_group")
      .select(col("doc_id"), col("dup_group"), col("group_size"),
        (col("doc_id") === col("dup_group")).as("survivor"))
  }

  /** INCREMENTAL near-dup admission — the daily-ingest shape: decide
    * which NEW docs to admit against an already-deduplicated corpus
    * without ever comparing corpus docs to each other (the full
    * pipeline's old×old work is exactly what a 100 TB daily batch
    * cannot re-pay).
    *
    * Work done: new×new and new×corpus candidate pairs only — both
    * equi-joins on the bucket key where ONE side is the (small) new
    * batch, so the corpus side streams through the join without
    * self-pairing. A new doc is rejected if it exactly matches a
    * corpus fingerprint (anti-join), exactly matches an
    * earlier-admitted new doc, or near-matches (Jaccard >= threshold)
    * a corpus doc or an earlier new doc (transitively, via components
    * over the new×new ∪ new×corpus edge set — corpus nodes are
    * already-canonical sinks).
    *
    * Returns the admitted subset of `newDocs` (original columns).
    * Equivalence contract (spec-pinned): admitted = the new docs that
    * [[nearDupGroups]] over (corpus ∪ new) elects as survivors of
    * groups containing no corpus member. Ids must be NON-NEGATIVE on
    * both sides (corpus ids are negated into a disjoint key space);
    * a negative id raises at runtime rather than corrupting the
    * component labels silently.
    */
  def admitIncremental(newDocs: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      maxBucketSize: Int = 1000,
      ccCollectThreshold: Long =
        ConnectedComponents.DefaultLocalClosureThreshold): DataFrame = {
    // PRECONDITION, enforced per-row at zero happy-path cost: ids
    // must be non-negative, because corpus ids are negated (-id-1)
    // into a disjoint key space below. A negative input id would
    // either collide a corpus doc with a fresh one (poisoning its
    // component) or make a legitimate new survivor fail the
    // `component >= 0` admit test and vanish silently.
    val keyedOf = (df: DataFrame) => df.select(
      when(col(idCol).cast("long") >= 0, col(idCol).cast("long"))
        .otherwise(raise_error(concat(
          lit("admitIncremental requires non-negative ids "),
          lit("(corpus ids are negated into a disjoint key space); got "),
          col(idCol).cast("string"))).cast("long")).as("id"),
      bucketKey(col(textCol)).as("bkey"),
      graft.functions.TextFunctions.fingerprint(col(textCol)).as("fp"),
      array_sort(tokenSet(normalized(col(textCol)))).as("toks"))
    val newKeyed = graft.CacheScope.track(keyedOf(newDocs))
    val corpusKeyed = keyedOf(corpus)
    // exact stage: drop new docs whose fingerprint exists in the
    // corpus (anti-join: corpus side never self-compares), keep the
    // min-id new doc per new fingerprint
    val wFp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("id"))
    val fresh = graft.CacheScope.track(newKeyed
      .join(corpusKeyed.select(col("fp")), Seq("fp"), "left_anti")
      .withColumn("__rn", row_number().over(wFp))
      .filter(col("__rn") === 1).drop("__rn"))
    // candidates: fresh×fresh and fresh×corpus, never corpus×corpus.
    // Corpus ids are negated to a disjoint key space so components'
    // min-label makes any corpus-touching group canonical-corpus
    // (and thus rejected) without a flag column.
    def jaccardPairs(a: DataFrame, b: DataFrame) = a
      .join(b, "bkey")
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("inter", sortedIntersectCount(col("a_toks"), col("b_toks")))
      .filter(col("inter").cast("double") /
        (size(col("a_toks")) + size(col("b_toks")) - col("inter")).cast("double")
        >= lit(threshold))
      .select(col("a_id"), col("b_id"))
    val aSide = fresh.select(col("bkey"), col("id").as("a_id"),
      col("toks").as("a_toks"))
    // bucket cull on the UNION side the pairs probe into
    val probe = fresh.select(col("bkey"), col("id"), col("toks"))
      .unionByName(corpusKeyed.select(col("bkey"), (-col("id") - 1).as("id"),
        col("toks")))
    val okBuckets = probe.groupBy(col("bkey"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucketSize)
      .select(col("bkey"))
    val bSide = probe.join(okBuckets, "bkey")
      .select(col("bkey"), col("id").as("b_id"), col("toks").as("b_toks"))
    val pairs = jaccardPairs(aSide, bSide)
      .filter(col("a_id") < col("b_id") || col("b_id") < 0)
    val comp = ConnectedComponents.components(pairs, "a_id", "b_id",
      collectThreshold = ccCollectThreshold)
    // admitted: fresh docs whose component has no corpus member
    // (label >= 0 — corpus ids are negative) and that ARE the
    // canonical min (or are in no pair at all)
    val admittedIds = fresh.select(col("id"))
      .join(comp, col("id") === col("node"), "left")
      .filter(col("component").isNull ||
        (col("component") >= 0 && col("component") === col("id")))
      .select(col("id").as("__admitted_id"))
    newDocs.join(admittedIds,
      col(idCol).cast("long") === col("__admitted_id"), "left_semi")
  }
}
