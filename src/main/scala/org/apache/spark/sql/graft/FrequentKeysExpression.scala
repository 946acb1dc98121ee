// Hosted under org.apache.spark.sql (private[sql] access — see
// VectorExpressions).
package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy hitters in one pass (Misra & Gries 1982; the
  * mergeable-summaries form of Agarwal et al., PODS 2012).
  *
  * `frequentKeys(key, k)` keeps at most k counters and guarantees:
  * every key with true frequency > n/(k+1) IS in the summary, and
  * each reported count understates the true count by at most n/(k+1).
  * The summary is mergeable, so it runs as map-side PARTIAL
  * aggregation: finding the hot keys of a 100 TB relation costs one
  * scan and a k-row-per-task shuffle — this is the detector that
  * feeds [[graft.operators.Skew]]'s salted fallbacks (find the keys
  * that need splitting BEFORE the window that would die on them).
  */
case class FrequentKeys(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Any, Long]]
  with ExpectsInputTypes {
  require(k > 0, "k must be positive")

  type Buf = java.util.HashMap[Any, Long]

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(LongType, IntegerType, StringType))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", child.dataType),
    StructField("approx_count", LongType))), containsNull = false)

  private def isString = child.dataType == StringType
  private def isInt = child.dataType == IntegerType

  override def createAggregationBuffer(): Buf = new Buf()

  // Copy unsafe-backed strings out of the reused input row only when
  // the key is actually INSERTED into the buffer (UTF8String equality
  // is content-based, so the containsKey lookup and the decrement path
  // read the original backing safely) — the steady state for a skewed
  // stream is an increment of an already-tracked key, which now
  // allocates nothing.
  private def own(key: Any): Any = key match {
    case u: UTF8String => u.clone()
    case other => other
  }

  /** Classic MG step: increment if tracked, insert if room, else
    * decrement every counter (dropping zeros). */
  private def offer(buf: Buf, key: Any, by: Long): Unit = {
    if (buf.containsKey(key)) buf.put(key, buf.get(key) + by)
    else if (buf.size < k) buf.put(own(key), by)
    else {
      // decrement all by min(by, smallest counter) batches; simple
      // loop is fine because by is 1 in update and bounded in merge
      var remaining = by
      while (remaining > 0 && buf.size == k) {
        var minC = Long.MaxValue
        val it0 = buf.values().iterator()
        while (it0.hasNext) minC = math.min(minC, it0.next())
        val dec = math.min(remaining, minC)
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nv = e.getValue - dec
          if (nv <= 0L) it.remove() else e.setValue(nv)
        }
        remaining -= dec
      }
      if (remaining > 0) buf.put(own(key), remaining)
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) offer(buf, v, 1L)
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      offer(buf, e.getKey, e.getValue)
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    import scala.jdk.CollectionConverters._
    val entries = buf.entrySet().asScala.toSeq
      .sortBy(e => (-e.getValue, keySortable(e.getKey)))
    new GenericArrayData(entries.map(e =>
      InternalRow(e.getKey, e.getValue)).toArray[Any])
  }

  private def keySortable(key: Any): String = key match {
    case u: UTF8String => u.toString
    case other => other.toString
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (isString) {
        val b = e.getKey.asInstanceOf[UTF8String].getBytes
        out.writeInt(b.length); out.write(b)
      } else if (isInt) out.writeInt(e.getKey.asInstanceOf[Int])
      else out.writeLong(e.getKey.asInstanceOf[Long])
      out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf()
    var j = 0
    while (j < n) {
      val key: Any =
        if (isString) {
          val b = new Array[Byte](in.readInt()); in.readFully(b)
          UTF8String.fromBytes(b)
        } else if (isInt) in.readInt()
        else in.readLong()
      buf.put(key, in.readLong())
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentKeys =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentKeys =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FrequentKeys =
    copy(child = newChildren(0))
}

object FrequentKeysExpression {
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Aggregate column: ≤ k (key, approx_count) pairs, count-descending.
    * Guarantee: true frequency > n/(k+1) ⇒ key present; reported
    * count ∈ [true − n/(k+1), true]. */
  def frequentKeys(key: Column, k: Int): Column =
    ExpressionUtils.column(FrequentKeys(
      ExpressionUtils.expression(key), k).toAggregateExpression())

  // SQL registration: GraftFunctions.all (the single inventory)
}
