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
  // empty token set → null, so callers drop the row exactly like the
  // explode+groupBy aggregate formulation dropped it: every acc is 0
  // on empty input, and emitting signature 0L instead would band all
  // empty documents together as hamming-0 "near-dups" of each other
  // (the [[Md5SimHash60]] / [[MinHashSignature]] siblings already
  // return null here)
  override def nullable: Boolean = true

  private def hashToken(s: Any): Long =
    XxHash64Function.hash(s, StringType, 42L)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) return null
    val acc = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      // a null token hashes as the seed — Spark's builtin hash
      // semantics, identical to the xxhash64 aggregate formulation
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
        if ($arr.numElements() == 0) {
          ${ev.isNull} = true;
        } else {
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
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** 60-bit md5-PORTABLE SimHash — the fused twin of the q70 relational
  * formulation (explode → md5-60 per token → 60 conditional ±1 sums →
  * sign), whose per-bit rules it replicates EXACTLY: token hash =
  * first 60 bits of md5 (hex chars 1-15, read straight off the digest
  * bytes), bit j set iff its ±1 count is ≥ 0 (the relational
  * `sum >= 0` — note the native [[SimHash64]] uses `> 0`; the tie
  * case is real for even token counts), and an EMPTY token set yields
  * null so callers can drop the row exactly like the groupBy the
  * aggregate formulation dropped it from. Counts are order-free
  * integers, so the fold is partitioning-independent and any SQL
  * engine re-derives the signature — q70's oracle hash-matches it.
  * Replaces one keyed (id, long) shuffle + a 60-column aggregate with
  * a zero-shuffle projection.
  */
case class Md5SimHash60(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    Md5SimHashKernel.sign(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val r = ctx.freshName("md5simhash")
      // NOTE the kernel lives in a STANDALONE object, not this case
      // class's companion: a companion method named like an inherited
      // Expression member loses its static forwarder, and the
      // generated Java's static call then fails Janino compilation —
      // silently demoting the whole stage to interpreted execution
      s"""
        java.lang.Long $r = org.apache.spark.sql.graft.Md5SimHashKernel.sign($arr);
        ${ev.isNull} = ($r == null);
        ${ev.value} = ${ev.isNull} ? 0L : $r.longValue();
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Md5SimHash60 =
    copy(child = newChild)
}

object Md5SimHashKernel {
  /** null on empty (the aggregate formulation emitted no row). Null
    * tokens are SKIPPED — md5(NULL) is NULL in the relational twin and
    * its per-bit ±1 sums ignore nulls; all-null therefore ≡ empty. */
  def sign(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    if (n == 0) return null
    val md = Md5Digest.get()
    val acc = new Array[Int](60)
    var m = 0
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val d = md.digest(s.getBytes)
        // first 60 bits = hex chars 1-15: bytes 0..6 then byte 7's high
        // nibble (same derivation as Md5MinHashKernel.hsh)
        var h = 0L
        var b = 0
        while (b < 7) { h = (h << 8) | (d(b) & 0xFFL); b += 1 }
        h = (h << 4) | ((d(7) >> 4) & 0xFL)
        m += 1
        var j = 0
        while (j < 60) {
          if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    if (m == 0) return null
    var sig = 0L
    var j = 0
    while (j < 60) { if (acc(j) >= 0) sig |= (1L << j); j += 1 }
    java.lang.Long.valueOf(sig)
  }
}

object SimHashExpression {
  import org.apache.spark.sql.classic.ExpressionUtils

  def simhash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))

  def md5SimHash60(tokens: Column): Column =
    ExpressionUtils.column(Md5SimHash60(ExpressionUtils.expression(tokens)))

  // SQL registration: GraftFunctions.all (the single inventory; the
  // per-file register here had already drifted — it omitted
  // graft_md5_simhash entirely)
}
