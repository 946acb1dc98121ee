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
  // with the wrong accessor at runtime.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (left.dataType != right.dataType)
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

object ArrayExpressions {
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Intersection size of two SORTED distinct string arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedArrayIntersectCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_intersect_count",
      exprs => SortedArrayIntersectCount(exprs(0), exprs(1)), "built-in")
}
