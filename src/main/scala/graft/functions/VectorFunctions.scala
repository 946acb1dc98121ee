package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT/DOUBLE>` columns using Spark's
  * higher-order functions (`zip_with` / `aggregate`) — codegen'd,
  * no UDF, no MLlib Vector boxing. Accumulation is an ordered left
  * fold in DOUBLE, which keeps results deterministic for a given
  * element order (cross-engine parity then only needs rounding).
  *
  * Reference analog: pooled-embedding math,
  * precompute_similar_tracks.py:105-126 (SURVEY A10/W2/P6).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ as an ordered double fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 for zero-norm inputs. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(d / (na * nb))
  }

  /** Squared euclidean distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, x) => acc + x)

  /** a / ‖a‖₂ (unchanged if zero vector). */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0.0, a).otherwise(transform(a, x => x.cast("double") / n))
  }

  /** Element-wise sum of two equal-length vectors. */
  def add(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x.cast("double") + y.cast("double"))

  /** Element-wise max. */
  def emax(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => greatest(x.cast("double"), y.cast("double")))

  /** Scale by a scalar column. */
  def scale(a: Column, s: Column): Column =
    transform(a, x => x.cast("double") * s)
}
