package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The loud half of the banded-hamming scale contract (round 11 —
    * the analog of [[KMeansPortable.requireBoundedCells]]): a
    * signature family banded into `bandBits`-bit words has a FIXED
    * band space — 2^bandBits values per band — so once the per-band
    * bucket occupancy n/2^bandBits is ≫ 1, RANDOM collisions
    * dominate and candidates grow ~n²/2^bandBits per band whether or
    * not anything is similar. Measured at the 100× frame corpus
    * (SCALE.md round 11, 60-bit family = 15-bit bands): occupancy
    * 103 → an OUTAGE, not a slowdown (heap-OOM at the default 8 g;
    * shuffle spill past the free disk at 48 g). Unlike RHP-LSH there
    * is no plane knob — the fix is signature RESOLUTION ∝ corpus,
    * and the occupancy knob is specifically the band WIDTH (band
    * COUNT buys pigeonhole recall, not sparser buckets — each extra
    * band adds its own ~n²/2^bandBits candidate stream; see
    * [[MediaDedup.SigSpec]], round 12). Fail fast at the bound;
    * callers that intend the cost (a sized-up cluster re-measuring
    * the curve) raise it explicitly.
    */
  private[graft] def requireBoundedBuckets(site: String, n: Long,
      bound: Long, bandBits: Int = 15): Unit = {
    val occupancy = n >> bandBits
    require(occupancy <= bound,
      s"$site: expected per-band bucket occupancy n/2^$bandBits = " +
        s"$n/${1L << bandBits} = $occupancy exceeds the bound $bound " +
        "— the fixed-signature saturation regime (SCALE.md round 11: " +
        s"candidates grow ~n^2/2^$bandBits; measured outage at " +
        "occupancy 103). This signature family is exhausted at this " +
        "corpus size: raise the signature resolution (wider bands — " +
        "MediaDedup.SigSpec frees the grid and the band width), or " +
        "raise the bound explicitly if the candidate cost is " +
        "intended and provisioned for.")
  }

  /** Banded near-dup pairing over WIDE signatures — the
    * [[hamming60Pairs]] kernel with the signature width freed (round
    * 12, the q89 fix): `base` carries (`id`, `sig` = array of
    * `bands` band WORDS of `bandBits` bits each — the
    * [[MediaDedup.dHashWide]] layout), banding is a plain
    * `posexplode` of the word array, the pigeonhole guarantees
    * recall to hamming ≤ bands − 1, and the occupancy guard derives
    * its band space from the ACTUAL band width (n/2^bandBits ≤
    * `maxExpectedOccupancy`) — which is what makes the family
    * scale-followable: band width ∝ log₂(corpus) keeps buckets
    * sparse by construction, exactly as nlist ∝ N keeps quantizer
    * cells bounded. Every step is integer arithmetic a SQL engine
    * reproduces (`bit_count(xor())` per word, summed), so wide
    * callers keep the full-oracle discipline. `base` should be
    * cached by the caller. Returns (a_id, b_id, hamming ≤
    * `maxHamming`), a_id < b_id.
    */
  /** Per-row width guard for wide band-word arrays — a sig whose
    * array length does not match the family's `bands` must FAIL
    * LOUDLY, not degrade: a mismatched width (a 60-bit relation
    * reaching a Sig120 entry, a truncated array) makes the per-word
    * `zip_with` hamming NULL, which silently turns verify filters
    * into row drops and stream-side anti-join conditions into
    * admit-everything. Zero happy-path cost (the `admitIncremental`
    * non-negative-id precedent). */
  private[graft] def sigWidthChecked(sig: Column, bands: Int,
      site: String): Column =
    when(size(sig) === bands, sig).otherwise(raise_error(concat(
      lit(s"$site: sig must carry exactly $bands band words "),
      lit("(SigSpec width mismatch — a different-width signature "),
      lit("relation reached this wide entry); got length "),
      size(sig).cast("string"))).cast("array<bigint>"))

  private[graft] def hammingWidePairs(base: DataFrame, bands: Int,
      bandBits: Int, maxHamming: Int, maxBucketSize: Int,
      maxExpectedOccupancy: Long): DataFrame = {
    require(bands >= 2 && bandBits >= 1 && bandBits <= 62,
      s"need 2+ bands of 1..62 bits (got $bands x $bandBits)")
    require(maxHamming >= 0 && maxHamming <= bands - 1,
      s"$bands bands pigeonhole ${bands * bandBits} bits at hamming <= " +
        s"${bands - 1} (got $maxHamming)")
    requireBoundedBuckets("hammingWidePairs", base.count(),
      maxExpectedOccupancy, bandBits)
    val checked = base.select(col("id"),
      sigWidthChecked(col("sig"), bands, "hammingWidePairs").as("sig"))
    val banded = checked.select(col("id"),
      posexplode(col("sig")).as(Seq("band", "bv")))
    def ham(a: Column, b: Column): Column = aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("int")),
      lit(0), (acc, x) => acc + x)
    bandedCandidatePairs(banded, Seq("band", "bv"), maxBucketSize)
      .join(checked.select(col("id").as("a_id"), col("sig").as("a_sig")), "a_id")
      .join(checked.select(col("id").as("b_id"), col("sig").as("b_sig")), "b_id")
      .withColumn("hamming", ham(col("a_sig"), col("b_sig")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"),
        col("hamming").cast("int").as("hamming"))
  }

  /** Banded near-dup pairing over 60-bit signatures — the shared
    * back half of every 60-bit hamming family (portable SimHash q70,
    * perceptual image dHash q83, audio envelope signatures): 4 ×
    * 15-bit pigeonhole bands (any pair within hamming 3 shares at
    * least one band exactly — guaranteed recall to 3), oversized-
    * bucket cull, id-only candidate exchange, popcount verify. Every
    * step is integer arithmetic a SQL engine reproduces, so callers
    * whose signatures are themselves engine-portable sit under full
    * value oracles. `base` must carry (`id`, `sig`) and should be
    * cached by the caller — the banding and both verify joins read
    * it (the occupancy guard's count materializes that cache).
    * Returns (a_id, b_id, hamming ≤ maxHamming), a_id < b_id.
    */
  private[graft] def hamming60Pairs(base: DataFrame, maxHamming: Int,
      maxBucketSize: Int, maxExpectedOccupancy: Long = 64): DataFrame = {
    // the 4 x 15 pigeonhole guarantees recall UP TO hamming 3, so any
    // stricter cut is sound too (the Dedup.simhashPairs convention —
    // review r9 relaxed the former == 3)
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4 x 15-bit bands pigeonhole 60 bits at hamming <= 3 (got $maxHamming)")
    requireBoundedBuckets("hamming60Pairs", base.count(),
      maxExpectedOccupancy)
    val banded = base.select(col("id"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sig"), b * 15).bitwiseAND(32767)): _*))
        .as(Seq("band", "bv")))
    bandedCandidatePairs(banded, Seq("band", "bv"), maxBucketSize)
      .join(base.select(col("id").as("a_id"), col("sig").as("a_sig")), "a_id")
      .join(base.select(col("id").as("b_id"), col("sig").as("b_sig")), "b_id")
      .withColumn("hamming", bit_count(col("a_sig").bitwiseXOR(col("b_sig"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"),
        col("hamming").cast("int").as("hamming"))
  }
}
