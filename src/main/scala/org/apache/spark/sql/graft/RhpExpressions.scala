// Hosted under org.apache.spark.sql for the same private[sql] access
// reasons as VectorExpressions.
package org.apache.spark.sql.graft

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused kernels for the PORTABLE random-hyperplane LSH path
  * (q71's `cosineNearDupPairsPortable`).
  *
  * The round-5 relational formulation derived its determinism from
  * DECIMAL aggregation: per-dimension products rounded to 12 dp, cast
  * to DECIMAL(18,12) and summed — integer arithmetic whose value no
  * partitioning can perturb, so a SQL oracle re-derives every sign
  * bit and score. That guarantee lives in the VALUES, not in the
  * relational plan shape: these kernels compute the identical scaled
  * integers with the identical roundings (`BigDecimal.valueOf(x*c)
  * .setScale(12, HALF_UP)` is Spark's own `round(double, 12)`;
  * shortest-repr double→decimal is Spark's own double→DECIMAL cast;
  * `Math.addExact` over unscaled longs is the decimal sum, loud on
  * overflow) inside ONE whole-stage-codegen projection per row —
  * replacing the 64×-row `posexplode` product stream, its broadcast
  * plane join, the (id, table) aggregation, and the two (id, dim)
  * sort-merge verify joins with zero-shuffle per-row folds. Measured
  * at sf0.1: q71 9.5 s → see SCALE.md round-7 entry. At 100 TB the
  * win compounds: the corpus never inflates 64× and never shuffles
  * by (id, dim); candidate verification touches two array columns.
  */
object RhpKernels {

  /** round(x*c, 12) then double→DECIMAL(18,12), as the unscaled long
    * — exactly Spark's `round(col, 12).cast(DecimalType(18, 12))`.
    *
    * The relational path round-trips the rounded value through a
    * DOUBLE (`round` returns double, the cast re-parses its shortest
    * repr). For |x·c| < 1000 the rounded decimal has ≤ 15 significant
    * digits, which round-trip binary64 exactly (the classic 15-digit
    * guarantee), so the trip is the identity and ONE BigDecimal chain
    * suffices — measured 2× on this operator's hot fold, and the
    * overwhelmingly common case for embedding components. Larger
    * magnitudes (legal in DECIMAL(18,12) up to 10⁶) take the slow
    * path that replays the relational double round-trip literally;
    * longValueExact throws loudly at genuine DECIMAL(18) overflow
    * instead of silently diverging. */
  def scaledTerm(x: Double, c: Double): Long = {
    val v = x * c
    if (Math.abs(v) < 999.0)
      JBigDecimal.valueOf(v)
        .setScale(12, RoundingMode.HALF_UP).unscaledValue().longValueExact()
    else {
      val rounded = JBigDecimal.valueOf(v)
        .setScale(12, RoundingMode.HALF_UP).doubleValue()
      JBigDecimal.valueOf(rounded)
        .setScale(12, RoundingMode.HALF_UP).unscaledValue().longValueExact()
    }
  }

  /** DECIMAL(_,12) → double, exactly Spark's `Decimal.toDouble`. */
  def unscaledToDouble(sum: Long): Double =
    new JBigDecimal(BigInteger.valueOf(sum), 12).doubleValue()

  /** Per-table sign-bit buckets: for table t, bit k is set iff
    * Σ_d scaledTerm(vec(d), planes(t*numPlanes + k)(d)) ≥ 0 — the
    * fused equivalent of the conditional decimal plane sums. */
  def buckets(vec: ArrayData, planes: Array[Array[Double]],
      numPlanes: Int): ArrayData = {
    val numTables = planes.length / numPlanes
    val out = new Array[Long](numTables)
    val n = vec.numElements()
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var k = 0
      while (k < numPlanes) {
        val cs = planes(t * numPlanes + k)
        // bound by the plane length too: the plane matrix is sized
        // from a sampled row, and a ragged corpus (longer vectors
        // later) must degrade like the round-5 dims equi-join did —
        // extra dimensions ignored — not index out of bounds
        val dims = Math.min(n, cs.length)
        var sum = 0L
        var d = 0
        while (d < dims) {
          sum = Math.addExact(sum, scaledTerm(vec.getDouble(d), cs(d)))
          d += 1
        }
        if (sum >= 0) bucket |= (1L << k)
        k += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Σ_i round(a_i*b_i, 12) in DECIMAL(18,12), returned as double —
    * exactly `sum(round(xa*xb, 12)::DECIMAL(18,12))::DOUBLE`. */
  def decimalDot(a: ArrayData, b: ArrayData): Double = {
    val n = Math.min(a.numElements(), b.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      sum = Math.addExact(sum, scaledTerm(a.getDouble(i), b.getDouble(i)))
      i += 1
    }
    unscaledToDouble(sum)
  }

  /** The centered md5-60 plane component for (t, p, d) — exactly the
    * relational `(conv(substring(md5('t:p:d'), 1, 15), 16, 10)::LONG
    * − 2⁵⁹)::DOUBLE / 2⁵⁹` (long→double is the one IEEE rounding both
    * engines share; the division is an exponent shift, bit-exact).
    * The first 15 hex chars are read straight off the digest bytes
    * (bytes 0..6, then byte 7's high nibble — the Md5SimHashKernel
    * derivation, value-identical to hex-format + parseLong): the
    * matrix is numTables·numPlanes·vecDim components, so at 768-dim
    * the old per-component getInstance + "%02x" string build was
    * millions of allocations of driver stall before the job started. */
  def planeComponent(t: Int, p: Int, d: Int): Double = {
    val md = Md5Digest.get()
    val dig = md.digest(s"$t:$p:$d".getBytes("UTF-8"))
    var h = 0L
    var b = 0
    while (b < 7) { h = (h << 8) | (dig(b) & 0xFFL); b += 1 }
    h = (h << 4) | ((dig(7) >> 4) & 0xFL)
    (h - (1L << 59)).toDouble / 576460752303423488.0
  }

  /** All (numTables·numPlanes) plane vectors for `vecDim` dims —
    * driver-computed once (tables·planes·dim md5s) and shipped as a
    * reference object; the round-5 formulation materialized the same
    * relation with a range + md5 projection and broadcast it. */
  def planeMatrix(numTables: Int, numPlanes: Int,
      vecDim: Int): Array[Array[Double]] =
    Array.tabulate(numTables * numPlanes) { tp =>
      val t = tp / numPlanes
      val p = tp % numPlanes
      Array.tabulate(vecDim)(d => planeComponent(t, p, d))
    }
}

/** `array<double>` vector → `array<long>` of per-table sign-bit
  * buckets under the fixed centered-md5 plane matrix. */
case class RhpDecimalBuckets(child: Expression,
    planes: Array[Array[Double]], numPlanes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // Case-class equality on an Array field is REFERENCE equality, which
  // breaks semanticEquals/canonicalization: two expressions built from
  // separately computed (identical) plane matrices would never compare
  // equal, defeating common-subexpression reuse. Compare deep contents.
  override def equals(other: Any): Boolean = other match {
    case RhpDecimalBuckets(c, p, np) =>
      c == child && np == numPlanes &&
        java.util.Arrays.deepEquals(
          p.asInstanceOf[Array[AnyRef]], planes.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child,
      Integer.valueOf(java.util.Arrays.deepHashCode(
        planes.asInstanceOf[Array[AnyRef]])),
      Integer.valueOf(numPlanes))

  override def nullSafeEval(v: Any): Any =
    RhpKernels.buckets(v.asInstanceOf[ArrayData], planes, numPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("rhpPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.graft.RhpKernels.buckets(" +
        s"$v, $planesRef, $numPlanes);")
  }

  override protected def withNewChildInternal(newChild: Expression): RhpDecimalBuckets =
    copy(child = newChild)
}

/** Exact rounded-product decimal dot of two `array<double>` columns,
  * as double. */
case class DecimalScaledDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    RhpKernels.decimalDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.RhpKernels.decimalDot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecimalScaledDot =
    copy(left = newLeft, right = newRight)
}

object RhpExpressions {
  import org.apache.spark.sql.classic.ExpressionUtils

  def rhpDecimalBuckets(vec: Column, planes: Array[Array[Double]],
      numPlanes: Int): Column =
    ExpressionUtils.column(RhpDecimalBuckets(
      ExpressionUtils.expression(vec), planes, numPlanes))

  def decimalScaledDot(a: Column, b: Column): Column =
    ExpressionUtils.column(DecimalScaledDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
