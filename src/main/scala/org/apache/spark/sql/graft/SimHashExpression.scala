// Hosted under org.apache.spark.sql (private[sql] access — see
// VectorExpressions).
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash of a token array in ONE pass (SCALE.md upgrade
  * list): for each token, xxhash64 (seed 42 — identical to Spark's
  * `xxhash64` builtin so signatures match the aggregate formulation),
  * then ±1 per bit accumulated in a local array; sign → signature
  * bit. Replaces explode + 64 conditional sums + a shuffle with a
  * zero-shuffle projection.
  */
case class SimHash64(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  private def hashToken(s: Any): Long =
    XxHash64Function.hash(s, StringType, 42L)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val acc = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val h = hashToken(arr.getUTF8String(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) sig |= (1L << j); j += 1 }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val stringType = ctx.addReferenceObj("stringTypeRef",
        StringType, classOf[DataType].getName)
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
        int[] $acc = new int[64];
        for (int $i = 0; $i < $arr.numElements(); $i++) {
          long $h = org.apache.spark.sql.catalyst.expressions.XxHash64Function$$.MODULE$$
            .hash($arr.getUTF8String($i), $stringType, 42L);
          for (int $j = 0; $j < 64; $j++) {
            if ((($h >>> $j) & 1L) == 1L) $acc[$j]++; else $acc[$j]--;
          }
        }
        long $sig = 0L;
        for (int $j = 0; $j < 64; $j++) {
          if ($acc[$j] > 0) $sig |= (1L << $j);
        }
        ${ev.value} = $sig;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHashExpression {
  import org.apache.spark.sql.classic.ExpressionUtils

  def simhash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", exprs => SimHash64(exprs.head), "built-in")
}
