// Hosted under org.apache.spark.sql (private[sql] access — see
// VectorExpressions).
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared runtime for the Bloom filter expression pair — static
  * methods so the generated code and the interpreted path execute the
  * EXACT same bit arithmetic (the equivalence the spec pins).
  *
  * Artifact format (self-describing, so `might_contain` needs no
  * parameters beyond the bytes): big-endian
  * `[int numHashes][int numWords][numWords × long]`.
  *
  * Hash family: Guava-style double hashing (Kirsch & Mitzenmatz,
  * "Less Hashing, Same Performance", ESA 2006) over two
  * independently-seeded xxhash64 draws — bit_i = (h1 + i·h2) mod m,
  * deterministic and seedless, so two engines (or two cluster runs)
  * building a bloom over the same key set produce IDENTICAL bytes:
  * the artifact is content-addressed, like every other key in this
  * codebase.
  */
object BloomRuntime {
  val Seed1 = 0x42L
  val Seed2 = 0x9E3779B97F4A7C15L // golden-ratio odd constant

  def numWordsOf(bloom: Array[Byte]): Int = readInt(bloom, 4)
  def numHashesOf(bloom: Array[Byte]): Int = readInt(bloom, 0)

  private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  private def readWord(b: Array[Byte], word: Int): Long = {
    val off = 8 + word * 8
    var v = 0L; var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xFFL); i += 1 }
    v
  }

  /** Core membership test against the serialized artifact. */
  def mightContain(bloom: Array[Byte], h1: Long, h2: Long): Boolean = {
    val k = numHashesOf(bloom)
    val numBits = numWordsOf(bloom).toLong * 64L
    var i = 0
    while (i < k) {
      var c = h1 + i * h2
      if (c < 0) c = ~c
      val bit = c % numBits
      if ((readWord(bloom, (bit >>> 6).toInt) & (1L << (bit & 63))) == 0L)
        return false
      i += 1
    }
    true
  }

  // typed entry points (also called from generated code)
  def mightContainUTF8(bloom: Array[Byte], s: UTF8String): Boolean =
    mightContain(bloom, XXH64.hashUTF8String(s, Seed1),
      XXH64.hashUTF8String(s, Seed2))
  def mightContainLong(bloom: Array[Byte], v: Long): Boolean =
    mightContain(bloom, XXH64.hashLong(v, Seed1), XXH64.hashLong(v, Seed2))
  def mightContainBinary(bloom: Array[Byte], v: Array[Byte]): Boolean =
    mightContain(bloom,
      XXH64.hashUnsafeBytes(v, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        v.length, Seed1),
      XXH64.hashUnsafeBytes(v, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        v.length, Seed2))

  /** Set the key's k bits in a mutable word array (aggregate update). */
  def setBits(words: Array[Long], k: Int, h1: Long, h2: Long): Unit = {
    val numBits = words.length.toLong * 64L
    var i = 0
    while (i < k) {
      var c = h1 + i * h2
      if (c < 0) c = ~c
      val bit = c % numBits
      words((bit >>> 6).toInt) |= (1L << (bit & 63))
      i += 1
    }
  }

  def serialize(words: Array[Long], k: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + words.length * 8)
    bb.putInt(k); bb.putInt(words.length)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    bb.getInt() // numHashes — carried by the aggregate itself
    val n = bb.getInt()
    val words = new Array[Long](n)
    var i = 0
    while (i < n) { words(i) = bb.getLong(); i += 1 }
    words
  }
}

/** `bloomAgg(key, numBits, numHashes)` — a MERGEABLE Bloom filter
  * aggregate: map tasks build partial filters over their split and
  * the shuffle ships `numBits/8` bytes per task, OR-merged upward —
  * the same partial-aggregation discipline as the HLL (q48) and GK
  * (q55) sketches. OR is commutative/associative and the hash family
  * is seedless, so the artifact is BIT-DETERMINISTIC under any
  * partitioning or merge order (spec-pinned) — it can be persisted,
  * diffed, and rebuilt reproducibly.
  *
  * The 100 TB role: a corpus-fingerprint bloom is the membership
  * artifact incremental admission ships to daily batches — a
  * ~1.2 GB filter summarizes 10⁹ keys at 1% FPR, so the batch decides
  * "definitely new" with a zero-shuffle scan and only FPR-rare
  * suspects pay a verify join ([[graft.operators.Dedup.admitNewExact]]).
  */
case class BloomFilterBuild(
    child: Expression, numBits: Long, numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {
  require(numBits >= 64 && numBits % 64 == 0,
    "numBits must be a positive multiple of 64")
  require(numHashes >= 1 && numHashes <= 32, "numHashes must be in [1, 32]")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(LongType, StringType, BinaryType))
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long]((numBits / 64).toInt)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val (h1, h2) = v match {
        case s: UTF8String =>
          (XXH64.hashUTF8String(s, BloomRuntime.Seed1),
            XXH64.hashUTF8String(s, BloomRuntime.Seed2))
        case b: Array[Byte] =>
          (XXH64.hashUnsafeBytes(b,
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length,
            BloomRuntime.Seed1),
            XXH64.hashUnsafeBytes(b,
              org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length,
              BloomRuntime.Seed2))
        case l: Long =>
          (XXH64.hashLong(l, BloomRuntime.Seed1),
            XXH64.hashLong(l, BloomRuntime.Seed2))
      }
      BloomRuntime.setBits(buf, numHashes, h1, h2)
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    BloomRuntime.serialize(buf, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomRuntime.serialize(buf, numHashes)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomRuntime.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterBuild =
    copy(child = newChildren(0))
}

/** `bloomMightContain(bloom, key)` — membership probe against a bloom
  * artifact. False ⇒ key definitely NOT in the built set (the
  * no-false-negatives guarantee); true ⇒ maybe (FPR-bounded). Fully
  * codegen'd: the generated code calls the same static
  * [[BloomRuntime]] arithmetic as the interpreted path, so the probe
  * participates in whole-stage codegen and a bloom-prefiltered scan
  * stays one fused stage.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, TypeCollection(LongType, StringType, BinaryType))
  override def dataType: DataType = BooleanType

  override def nullSafeEval(bloom: Any, key: Any): Any = {
    val b = bloom.asInstanceOf[Array[Byte]]
    key match {
      case s: UTF8String => BloomRuntime.mightContainUTF8(b, s)
      case bin: Array[Byte] => BloomRuntime.mightContainBinary(b, bin)
      case l: Long => BloomRuntime.mightContainLong(b, l)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the object's static forwarders on the companion-named class
    val rt = BloomRuntime.getClass.getName.stripSuffix("$")
    val call = right.dataType match {
      case StringType => "mightContainUTF8"
      case BinaryType => "mightContainBinary"
      case _ => "mightContainLong"
    }
    nullSafeCodeGen(ctx, ev, (bloom, key) =>
      s"${ev.value} = $rt.$call($bloom, $key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

/** Column-level API. */
object BloomExpressions {
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Aggregate: a self-describing bloom artifact (BINARY) over the
    * column's values. Bit-deterministic under any partitioning. */
  def bloomAgg(key: Column, numBits: Long, numHashes: Int): Column =
    ExpressionUtils.column(BloomFilterBuild(
      ExpressionUtils.expression(key), numBits, numHashes)
      .toAggregateExpression())

  /** Probe: false = definitely absent, true = maybe present. */
  def bloomMightContain(bloom: Column, key: Column): Column =
    ExpressionUtils.column(BloomMightContain(
      ExpressionUtils.expression(bloom), ExpressionUtils.expression(key)))
}
