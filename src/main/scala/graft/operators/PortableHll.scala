package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable HyperLogLog (Flajolet et al., "HyperLogLog: the
  * analysis of a near-optimal cardinality estimation algorithm",
  * AofA 2007) — the VERIFICATION twin of the builtin
  * `hll_sketch_agg` rollup (gate q48, rows-only forever: Spark's
  * sketch bytes are engine-specific). Every stage here is re-derivable
  * by any engine with md5:
  *
  *   - register address = low `B` bits of the md5-60 token hash, rank
  *     ρ = leading-zero count of the remaining 50-bit word + 1 —
  *     computed as `51 − length(bin(w))` (both Spark and DuckDB
  *     render integers as minimal binary strings, so the arithmetic
  *     is string-length-exact, no float log2 at bit boundaries);
  *   - registers merge by MAX — associative/commutative, so
  *     PARTIAL registers per fine group merged up a level are
  *     bit-identical to direct coarse-group registers (the
  *     mergeability property the 100 TB rollup story rests on,
  *     provable under a SQL oracle precisely because of this);
  *   - the harmonic sum Σ 2^(−M_j) is scaled to the INTEGER
  *     Σ 2^(51−M_j) (max 2^61 over 2^B buckets — no overflow, no
  *     float accumulation order), so the raw estimate is ONE double
  *     division of a precomputed constant by an exact integer;
  *   - the small-range linear-counting branch uses m·ln(m/V) over
  *     integers; ln is the one libm call, and the final round(…, 3)
  *     absorbs its sub-ulp cross-engine variation.
  */
object PortableHll {

  /** Bucket-address bits: m = 2^B = 1024 registers (σ ≈ 1.04/√m ≈
    * 3.2% — the standard text choice; fixed so the SQL oracle and the
    * Spark side agree by construction). */
  val B = 10
  val M: Int = 1 << B

  /** The 2^(51−ρ) scale: ρ ranges over 1..51 (50-bit words). */
  val RhoBase = 51

  private def alpha(m: Int): Double = 0.7213 / (1.0 + 1.079 / m)

  /** The single combined constant of the raw estimate:
    * α_m · m² · 2^51. Embedded VERBATIM (full precision) in the
    * oracle SQL so the one double division matches bit-for-bit. */
  val EstimateConstant: Double =
    alpha(M) * M.toDouble * M.toDouble * (1L << RhoBase).toDouble

  /** Per-(groupCols, bucket) register partials from a token column:
    * (groupCols…, bucket INT, rho_max INT). Duplicate tokens hash to
    * the same (bucket, ρ), so no distinct pass is needed — the one
    * aggregation combines map-side. */
  def registers(df: DataFrame, groupCols: Seq[String],
      tokenCol: Column): DataFrame = {
    val h = conv(substring(md5(tokenCol), 1, 15), 16, 10).cast("long")
    val bucket = pmod(h, lit(M.toLong)).cast("int")
    val w = shiftrightunsigned(h, B)
    val rho = when(w === 0, lit(RhoBase))
      .otherwise(lit(RhoBase) - length(bin(w)))
    // a NULL token hashes to a (NULL, NULL) register row which
    // estimate() would count in `occupied` while contributing nothing
    // to the harmonic sum — drop it here, matching the oracle's
    // md5(NULL)-drops-out semantics (ADVICE r7)
    df.filter(tokenCol.isNotNull)
      .select((groupCols.map(col) :+ bucket.as("bucket") :+
        rho.cast("int").as("rho")): _*)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("rho")).as("rho_max"))
  }

  /** Merge register partials up to `groupCols` granularity (max per
    * bucket — associative, so any partial level gives identical
    * registers) and estimate: (groupCols…, occupied BIGINT,
    * est_distinct DOUBLE rounded to 3). */
  def estimate(partials: DataFrame, groupCols: Seq[String]): DataFrame = {
    val merged = partials
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("rho_max")).as("rho_max"))
    merged.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("occupied"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RhoBase - rho_max)"))
          .as("__s_occ"))
      // absent buckets are rank-0 registers: each contributes 2^51
      .withColumn("__v", lit(M.toLong) - col("occupied"))
      .withColumn("__s", col("__s_occ") + col("__v") * lit(1L << RhoBase))
      .withColumn("__e_raw",
        lit(EstimateConstant) / col("__s").cast("double"))
      .withColumn("est_distinct", round(
        when(col("__e_raw") <= lit(2.5 * M) && col("__v") > 0,
          lit(M.toDouble) * log(lit(M.toDouble) / col("__v").cast("double")))
          .otherwise(col("__e_raw")), 3))
      .drop("__s_occ", "__v", "__s", "__e_raw")
  }
}
