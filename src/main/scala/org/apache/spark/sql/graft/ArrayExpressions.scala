// Hosted under org.apache.spark.sql for the same private[sql] access
// reasons as VectorExpressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native set-similarity kernel (SURVEY §4 upgrade list).
  *
  * `size(array_intersect(a, b))` builds a hash set per evaluated row —
  * for a near-dup pair scan that is millions of transient sets. When
  * both inputs are SORTED distinct string arrays (one `array_sort`
  * per side, amortized across all pairs it joins against), the
  * intersection count is a linear merge with zero allocation. The
  * merge is emitted into whole-stage codegen.
  */
case class SortedArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // string arrays (raw shingles) or long arrays (64-bit-hashed
  // shingles — the persist-friendly representation)
  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(StringType), ArrayType(LongType)),
    TypeCollection(ArrayType(StringType), ArrayType(LongType)))
  override def dataType: DataType = IntegerType

  // The TypeCollection admits each side independently; the merge
  // comparator is chosen from the LEFT element type, so a mixed
  // array<string> vs array<long> call must be rejected here, not read
  // with the wrong accessor at runtime. Compare ELEMENT types only:
  // full-dataType equality also compared containsNull, spuriously
  // rejecting e.g. a natively computed containsNull=false signature
  // against the same signatures read back from parquet (which always
  // come back containsNull=true) — the persist-and-compare workflow
  // this expression exists for.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    def elem(e: Expression) = e.dataType.asInstanceOf[ArrayType].elementType
    if (base.isFailure) base
    else if (elem(left) != elem(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"both inputs must share one element type, got " +
          s"${left.dataType.simpleString} vs ${right.dataType.simpleString}")
    else base
  }

  private def isStringElem: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == StringType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val strings = isStringElem
    var i = 0; var j = 0; var n = 0
    while (i < a.numElements() && j < b.numElements()) {
      val cmp =
        if (strings) a.getUTF8String(i).compareTo(b.getUTF8String(j))
        else java.lang.Long.compare(a.getLong(i), b.getLong(j))
      if (cmp == 0) { n += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val cmp = ctx.freshName("cmp")
      val cmpExpr =
        if (isStringElem) s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
        else s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
      s"""
        int $i = 0; int $j = 0; int $n = 0;
        while ($i < $a.numElements() && $j < $b.numElements()) {
          int $cmp = $cmpExpr;
          if ($cmp == 0) { $n++; $i++; $j++; }
          else if ($cmp < 0) { $i++; } else { $j++; }
        }
        ${ev.value} = $n;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedArrayIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Winnowing fingerprint kernel (Schleimer et al., SIGMOD 2003): the
  * distinct sliding-window minimums of a LONG hash array, first
  * occurrence order — exactly `array_distinct(transform(sequence(0,
  * greatest(size(hs)-w, 0)), i -> array_min(slice(hs, i+1, w))))`,
  * which DedupSpec pins.
  *
  * The HOF formulation copies a w-element array per token position
  * (O(n·w) time and allocation — 18% of the round-2 bench for 27
  * rows); this is a monotonic-deque pass, O(n) with two scratch
  * arrays, emitted inside whole-stage codegen via a static helper
  * call.
  */
case class WinnowedMinHashes(child: Expression, window: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(window > 0, "window must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  // containsNull: an empty input yields [null], mirroring
  // array_min(slice([], ...)) in the reference formulation
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullSafeEval(input: Any): Any =
    WinnowUtil.winnowedMins(input.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.WinnowUtil.winnowedMins($c, $window);")

  override protected def withNewChildInternal(newChild: Expression): WinnowedMinHashes =
    copy(child = newChild)
}

/** Static helpers callable from generated code (no companion class →
  * static forwarders exist). */
object WinnowUtil {
  def winnowedMins(hs: ArrayData, w: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) // matches array_min over an empty slice → single null
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](null))
    val values = hs.toLongArray()
    val nWin = math.max(n - w, 0) + 1
    val mins = new Array[Long](nWin)
    // monotonic deque of indices with increasing values
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    var i = 0
    while (i < n) {
      while (tail > head && values(dq(tail - 1)) >= values(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) < i - w + 1) head += 1
      if (i >= w - 1) mins(i - w + 1) = values(dq(head))
      i += 1
    }
    if (n < w) mins(0) = values(dq(head)) // single whole-array window
    // distinct, first-occurrence order (array_distinct semantics) —
    // open-addressed long set, no boxing
    var cap = 4
    while (cap < nWin * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](nWin)
    var outN = 0
    var j = 0
    while (j < nWin) {
      val v = mins(j)
      var idx = java.lang.Long.hashCode(v) & (cap - 1)
      var dup = false
      while (used(idx) && !dup) {
        if (keys(idx) == v) dup = true else idx = (idx + 1) & (cap - 1)
      }
      if (!dup) {
        used(idx) = true; keys(idx) = v
        out(outN) = v; outN += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, outN))
  }
}

object ArrayExpressions {
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Intersection size of two SORTED distinct string arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedArrayIntersectCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Distinct sliding-window minimums of a LONG array (winnowing). */
  def winnowedMinHashes(hs: Column, window: Int): Column =
    ExpressionUtils.column(WinnowedMinHashes(
      ExpressionUtils.expression(hs), window))

  // SQL registration: GraftFunctions.all (the single inventory)
}
