// Hosted under org.apache.spark.sql (private[sql] access — see
// VectorExpressions).
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused signature expressions for the LSH hot paths.
  *
  * Both replace multi-operator formulations with ONE codegen'd loop:
  *
  *  - [[MinHashSignature]] supersedes explode → 32 × min() aggregate
  *    (a shuffle per corpus scan, and a generated aggregate class big
  *    enough that its one-time Janino+JIT compile dominated q18's
  *    bench time). Signatures are bit-identical to
  *    `min(xxhash64(lit(i), shingle))` — same seed-42 hash family.
  *  - [[RandomHyperplaneSignature]] supersedes the interpreted
  *    `aggregate(zip_with(vec, sequence(...), ...))` nested-HOF key
  *    (numPlanes × dim lambda invocations per row) with the same
  *    xxhash64-derived pseudo-random planes — results byte-identical.
  *
  * Zero-shuffle projections: at 100 TB signatures are computed
  * map-side in the scan stage, and only the banded (band, bucket)
  * keys shuffle.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numHashes > 0, "numHashes must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // empty token set → null signature (the explode+groupBy formulation
  // this replaces produced no row for such docs)
  override def nullable: Boolean = true

  // seed of hash slot k = xxhash64's running hash after the leading
  // int literal: hash(k, Int, 42) — matches xxhash64(lit(k), shingle)
  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(k => XxHash64Function.hash(k, IntegerType, 42L))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      var k = 0
      while (k < numHashes) {
        val h = XxHash64Function.hash(s, StringType, seeds(k))
        if (h < sig(k)) sig(k) = h
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val stringType = ctx.addReferenceObj("stringTypeRef",
        StringType, classOf[DataType].getName)
      val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      s"""
        if ($arr.numElements() == 0) {
          ${ev.isNull} = true;
        } else {
          long[] $sig = new long[$numHashes];
          java.util.Arrays.fill($sig, Long.MAX_VALUE);
          for (int $i = 0; $i < $arr.numElements(); $i++) {
            org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
            for (int $k = 0; $k < $numHashes; $k++) {
              long $h = org.apache.spark.sql.catalyst.expressions.XxHash64Function$$.MODULE$$
                .hash($s, $stringType, $seedsRef[$k]);
              if ($h < $sig[$k]) $sig[$k] = $h;
            }
          }
          ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
            .fromPrimitiveArray($sig);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Sign-bit signature of a vector against `numPlanes` pseudo-random
  * hyperplanes for LSH table `table`: bit m = [Σ_i vec_i · p_i ≥ 0],
  * plane component p_i = (pmod(xxhash64(table, m, i), 2001) − 1000) /
  * 1000 — deterministic, seedless, reproducible across engines.
  * Accumulation is in array-index order, so results are bit-identical
  * to the `aggregate(zip_with(...))` fold it replaces.
  */
case class RandomHyperplaneSignature(child: Expression, numPlanes: Int,
    table: Int) extends UnaryExpression with ExpectsInputTypes {
  require(numPlanes > 0 && numPlanes <= 31, "numPlanes must be in [1, 31]")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(DoubleType), ArrayType(FloatType)))
  override def dataType: DataType = IntegerType

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // running xxhash64 state after the two leading int literals:
  // hash(m, Int, hash(table, Int, 42)) — matches xxhash64(lit(t), lit(m), i)
  private lazy val seeds: Array[Long] = Array.tabulate(numPlanes)(m =>
    XxHash64Function.hash(m, IntegerType,
      XxHash64Function.hash(table, IntegerType, 42L)))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var key = 0
    var m = 0
    while (m < numPlanes) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val h = XxHash64Function.hash(i, IntegerType, seeds(m))
        val comp = (java.lang.Math.floorMod(h, 2001L) - 1000L).toDouble / 1000.0
        proj += x * comp
        i += 1
      }
      if (proj >= 0) key |= (1 << m)
      m += 1
    }
    java.lang.Integer.valueOf(key)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val intType = ctx.addReferenceObj("intTypeRef",
        IntegerType, classOf[DataType].getName)
      val seedsRef = ctx.addReferenceObj("rhpSeeds", seeds, "long[]")
      val key = ctx.freshName("key")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val proj = ctx.freshName("proj")
      val h = ctx.freshName("h")
      val comp = ctx.freshName("comp")
      val getX = if (elemIsFloat) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
        int $key = 0;
        for (int $m = 0; $m < $numPlanes; $m++) {
          double $proj = 0.0;
          for (int $i = 0; $i < $arr.numElements(); $i++) {
            long $h = org.apache.spark.sql.catalyst.expressions.XxHash64Function$$.MODULE$$
              .hash($i, $intType, $seedsRef[$m]);
            double $comp = (java.lang.Math.floorMod($h, 2001L) - 1000L) / 1000.0;
            $proj += ($getX) * $comp;
          }
          if ($proj >= 0) $key |= (1 << $m);
        }
        ${ev.value} = $key;
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): RandomHyperplaneSignature =
    copy(child = newChild)
}

/** Column-level API + SQL registration. */
/** Kernel for [[Md5MinHashes]] — the md5-PORTABLE signature family.
  *
  * Per shingle: ONE md5 digest; `h1`/`h2` are its first two 7-byte
  * (56-bit) big-endian halves — exactly what parsing hex chars 1-14 /
  * 15-28 yields (hex char i is nibble i of the digest) — and
  * signature slot k minimizes `h1 + k·h2`, the double-hashing
  * simulation of a hash family (Kirsch & Mitzenmacher, "Less Hashing,
  * Same Performance", ESA 2006). Values stay < 2⁵⁶ + 31·2⁵⁶ < 2⁶²:
  * signed-64 arithmetic never overflows, so any SQL engine computes
  * the identical longs from its own md5/substring/CAST (the q69/q72
  * oracles re-derive and hash-match them). The verify key `hsh` reads
  * the SAME digest's first 60 bits (hex chars 1-15), sorted for the
  * linear-merge intersect.
  *
  * The round-5 formulation salted a full md5 per hash index (33
  * digests per shingle); the round-7 Column rewrite got to one digest
  * but still paid interpreted-HOF `conv`/`substring` per (k, shingle)
  * — this kernel replaces all of it with primitive loops on the raw
  * digest bytes (no hex string ever materializes).
  */
/** Per-thread reusable MD5 instance for the portable-hash kernels:
  * `MessageDigest.getInstance` performs a JCA provider lookup plus an
  * allocation, which the per-row eval loops were paying once per
  * document/shingle-set. `digest()` resets the instance after each
  * use, so reuse is safe. */
private[graft] object Md5Digest {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def get(): java.security.MessageDigest = tl.get()
}

object Md5MinHashKernel {
  private def be56(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(off + i) & 0xFFL); i += 1 }
    v
  }

  /** null on empty input (mirrors [[MinHashSignature]]; unreachable
    * through TextFunctions.shingles, which never emits an empty
    * array). NULL ELEMENTS are skipped — the faithful reading of the
    * relational twin, where md5(NULL) is NULL and drops out of every
    * min()/sum() (the xxhash native family instead hashes null as the
    * seed, Spark's builtin hash semantics; neither crashes). A
    * shingle array of only nulls is therefore empty → null. */
  def eval(arr: ArrayData, numHashes: Int): InternalRow = {
    val n = arr.numElements()
    if (n == 0) return null
    val md = Md5Digest.get()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val hsh = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val d = md.digest(s.getBytes)
        val h1 = be56(d, 0)
        val h2 = be56(d, 7)
        hsh(m) = (h1 << 4) | ((d(7) >> 4) & 0xFL)
        m += 1
        var k = 0
        while (k < numHashes) {
          val v = h1 + k * h2
          if (v < sig(k)) sig(k) = v
          k += 1
        }
      }
      i += 1
    }
    if (m == 0) return null
    val hs = if (m == n) hsh else java.util.Arrays.copyOf(hsh, m)
    java.util.Arrays.sort(hs)
    new GenericInternalRow(Array[Any](
      UnsafeArrayData.fromPrimitiveArray(sig),
      UnsafeArrayData.fromPrimitiveArray(hs)))
  }
}

/** `array<string>` shingles → struct(sig: array<long>, hsh:
  * array<long>) — the portable twin's whole per-document hash state
  * in one codegen'd pass (see [[Md5MinHashKernel]]). */
case class Md5MinHashes(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numHashes > 0, "numHashes must be positive")
  // h1 + k·h2 with h1, h2 < 2⁵⁶ stays inside signed-64 only while
  // k ≤ 127; beyond that Spark would wrap silently where a SQL
  // engine's BIGINT errors — the exact divergence this portable
  // family exists to rule out, so refuse loudly at construction
  require(numHashes <= 128,
    s"numHashes=$numHashes would overflow the 56-bit double-hashing " +
      "family (k*h2 exceeds signed 64-bit at k >= 128)")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("sig", ArrayType(LongType, containsNull = false)),
    StructField("hsh", ArrayType(LongType, containsNull = false))))
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    Md5MinHashKernel.eval(v.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
        org.apache.spark.sql.graft.Md5MinHashKernel.eval($arr, $numHashes);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): Md5MinHashes =
    copy(child = newChild)
}

object SignatureExpressions {
  import org.apache.spark.sql.classic.ExpressionUtils

  def minhashSignature(tokens: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashSignature(
      ExpressionUtils.expression(tokens), numHashes))

  def md5MinHashes(shingles: Column, numHashes: Int): Column =
    ExpressionUtils.column(Md5MinHashes(
      ExpressionUtils.expression(shingles), numHashes))

  def randomHyperplaneSignature(vec: Column, numPlanes: Int, table: Int): Column =
    ExpressionUtils.column(RandomHyperplaneSignature(
      ExpressionUtils.expression(vec), numPlanes, table))

  // SQL registration lives in GraftFunctions.all — the ONE inventory
  // both registration paths (GraftSql.registerAll, GraftExtensions)
  // read. Per-file register() methods re-declared the builders and
  // had already drifted (this one lacked graft_decimal_dot's family);
  // they are gone.
}
