package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared LSH candidate-generation skeleton every banded
  * near-dup family in this package runs (MinHash, SimHash, RHP —
  * native and portable twins alike): cull oversized buckets, self-join
  * the survivors on the band key, emit distinct id pairs.
  *
  * Single-sited here so the two scale disciplines can never drift
  * apart between families:
  *
  *   - BUCKET-SIZE SKEW GUARD: oversized buckets (degenerate content —
  *     empty docs, zero vectors, collapsed models) are the rare
  *     pathology, so aggregate bucket sizes once and broadcast only
  *     the oversized keys into an anti-join — O(#mega-buckets) driver
  *     memory, vs the full sort the naive count().over() window costs.
  *     Without the cull one mega-bucket makes the self-join quadratic.
  *   - ID-ONLY EXCHANGES: the self-join and the candidate dedup carry
  *     (id, band, key) scalars only; payloads (signatures, vectors,
  *     shingle sets) join back from the caller's cached base by id
  *     AFTER deduplication, so nothing payload-sized shuffles and no
  *     payload is scored twice.
  */
object Lsh {

  /** Distinct candidate pairs (a_id, b_id), a_id < b_id, from a
    * banded relation with columns (`id`, bandCols...). Rows sharing
    * every `bandCols` value in a bucket of size ≤ `maxBucketSize`
    * pair up; larger buckets are culled entirely.
    */
  private[graft] def bandedCandidatePairs(banded: DataFrame,
      bandCols: Seq[String], maxBucketSize: Int): DataFrame = {
    val oversized = banded.groupBy(bandCols.map(col): _*)
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > maxBucketSize)
      .select(bandCols.map(col): _*)
    val sized = banded.join(broadcast(oversized), bandCols, "left_anti")
    sized.as("x").join(sized.as("y"),
        bandCols.map(c => col(s"x.$c") === col(s"y.$c")).reduce(_ && _) &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"))
      .distinct()
  }
}
