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

/** Bounded top-k aggregate (SCALE.md upgrade list; VERDICT r01 #9).
  *
  * `topKByScore(score, id, k)` keeps the k best (score DESC, id ASC)
  * pairs per group in a fixed-size buffer and emits them sorted as
  * `ARRAY<STRUCT<score, id>>`. The point at scale: it participates in
  * PARTIAL aggregation, so each map task ships at most k rows per
  * group to the shuffle — versus the window-rank formulation, which
  * shuffles and fully sorts every scored row (anchors × N) before
  * discarding all but k. Output is row-identical to
  * `row_number().over(Window.orderBy(score.desc, id.asc)) <= k`
  * (pinned by SimilaritySpec and the unchanged q20/q22 oracles).
  */
case class TopKByScore(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Buffer] with ExpectsInputTypes {
  require(k > 0, "k must be positive")

  import TopKByScore.Buffer

  override def children: Seq[Expression] = Seq(score, id)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, TypeCollection(LongType, IntegerType, StringType))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", id.dataType))), false)

  private def isString = id.dataType == StringType
  private def isInt = id.dataType == IntegerType

  // better = higher score, then smaller id. Double.compare (not >):
  // it totally orders NaN as the largest value — exactly Spark's SQL
  // ordering, so NaN scores rank first like the row_number window
  // formulation this claims row-identity with, and eval's sortWith
  // can't hit a contract violation.
  private def better(s1: Double, i1: Any, s2: Double, i2: Any): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && ((i1, i2) match {
      case (a: UTF8String, b: UTF8String) => a.compareTo(b) < 0
      case (a: Long, b: Long) => a < b
      case (a: Int, b: Int) => a < b
      case _ => false
    }))
  }

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  // Copy unsafe-backed strings out of the reused input row — called
  // only at the WRITE sites inside insert, so the steady-state row
  // (buffer full, candidate loses to the current worst — k of
  // millions per group) allocates nothing; comparisons read the
  // original backing, which is valid for the duration of the call.
  private def own(i: Any): Any = i match {
    case u: UTF8String => u.clone()
    case other => other
  }

  private def insert(buf: Buffer, s: Double, i: Any): Unit = {
    if (buf.n < k) {
      buf.scores(buf.n) = s; buf.ids(buf.n) = own(i); buf.n += 1
    } else {
      // find current worst; replace if the candidate beats it
      var worst = 0
      var j = 1
      while (j < buf.n) {
        if (better(buf.scores(worst), buf.ids(worst), buf.scores(j), buf.ids(j)))
          worst = j
        j += 1
      }
      if (better(s, i, buf.scores(worst), buf.ids(worst))) {
        buf.scores(worst) = s; buf.ids(worst) = own(i)
      }
    }
  }

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) insert(buf, s.asInstanceOf[Double], i)
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    var j = 0
    while (j < other.n) { insert(buf, other.scores(j), other.ids(j)); j += 1 }
    buf
  }

  override def eval(buf: Buffer): Any = {
    val idx = (0 until buf.n).sortWith((a, b) =>
      better(buf.scores(a), buf.ids(a), buf.scores(b), buf.ids(b)))
    new GenericArrayData(idx.map(j =>
      InternalRow(buf.scores(j), buf.ids(j))).toArray[Any])
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.n)
    var j = 0
    while (j < buf.n) {
      out.writeDouble(buf.scores(j))
      if (isString) {
        val b = buf.ids(j).asInstanceOf[UTF8String].getBytes
        out.writeInt(b.length); out.write(b)
      } else if (isInt) out.writeInt(buf.ids(j).asInstanceOf[Int])
      else out.writeLong(buf.ids(j).asInstanceOf[Long])
      j += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Buffer(k)
    buf.n = in.readInt()
    var j = 0
    while (j < buf.n) {
      buf.scores(j) = in.readDouble()
      buf.ids(j) =
        if (isString) {
          val b = new Array[Byte](in.readInt()); in.readFully(b)
          UTF8String.fromBytes(b)
        } else if (isInt) in.readInt()
        else in.readLong()
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  /** k slots, unsorted until eval; worst found by linear scan (k is
    * small — the reference keeps 10-100 neighbors). */
  class Buffer(k: Int) {
    var n: Int = 0
    val scores: Array[Double] = new Array[Double](k)
    val ids: Array[Any] = new Array[Any](k)
  }
}

/** Bounded sorted collect of ARRAY<DOUBLE> values: keeps the `max`
  * SMALLEST elements (Spark's array ordering — identical to
  * `slice(array_sort(collect_list(v)), 1, max)`, pinned by
  * VectorAggSpec) in a sorted fixed-capacity buffer. Replaces the
  * unbounded collect_list + post-hoc trim, whose per-group state is
  * O(all chunks · dim) — an OOM at the reference's 9.7M-chunk scale —
  * with O(max · dim). */
case class BoundedSortedCollect(
    child: Expression, max: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.catalyst.util.ArrayData]]
  with ExpectsInputTypes {
  require(max > 0, "max must be positive")

  import org.apache.spark.sql.catalyst.util.ArrayData
  import scala.collection.mutable.ArrayBuffer

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def nullable: Boolean = false
  // inner containsNull tracks the CHILD's arrays: ExpectsInputTypes
  // admits ARRAY<DOUBLE> with null elements, and claiming
  // containsNull=false for them would both corrupt the serialize path
  // (getDouble on a null slot) and lie to downstream codegen, which
  // then skips null checks — collected arrays pass through verbatim,
  // so the output nullability is exactly the input's
  private lazy val innerContainsNull: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, innerContainsNull), containsNull = false)

  // array_sort's exact comparator
  private lazy val ord =
    org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(ArrayType(DoubleType))

  override def createAggregationBuffer(): ArrayBuffer[ArrayData] =
    new ArrayBuffer[ArrayData](max)

  private def insert(buf: ArrayBuffer[ArrayData], v: ArrayData): Unit = {
    if (buf.length >= max && ord.compare(v, buf.last) >= 0) return
    // binary search for the insertion point in the ascending buffer
    var lo = 0; var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.compare(buf(mid), v) <= 0) lo = mid + 1 else hi = mid
    }
    buf.insert(lo, v)
    if (buf.length > max) buf.remove(buf.length - 1)
  }

  override def update(buf: ArrayBuffer[ArrayData], input: InternalRow): ArrayBuffer[ArrayData] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[ArrayData].copy())
    buf
  }

  override def merge(buf: ArrayBuffer[ArrayData], other: ArrayBuffer[ArrayData]): ArrayBuffer[ArrayData] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[ArrayData]): Any =
    new GenericArrayData(buf.toArray[Any])

  // Null elements ride the shuffle as a flag byte per slot (they must
  // round-trip: the pinned slice(array_sort(collect_list(v))) keeps
  // them, sorted first by the array ordering). The all-non-null array
  // — the overwhelmingly common case — skips the flags entirely and
  // keeps the compact primitive encoding.
  override def serialize(buf: ArrayBuffer[ArrayData]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { a =>
      val n = a.numElements()
      var hasNull = false
      var i = 0
      while (i < n && !hasNull) { hasNull = a.isNullAt(i); i += 1 }
      out.writeInt(if (hasNull) -n - 1 else n)
      i = 0
      while (i < n) {
        if (hasNull) {
          out.writeBoolean(a.isNullAt(i))
          if (!a.isNullAt(i)) out.writeDouble(a.getDouble(i))
        } else out.writeDouble(a.getDouble(i))
        i += 1
      }
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[ArrayData] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[ArrayData](math.max(n, 1))
    var j = 0
    while (j < n) {
      val tag = in.readInt()
      if (tag >= 0) {
        val arr = new Array[Double](tag)
        var i = 0
        while (i < tag) { arr(i) = in.readDouble(); i += 1 }
        buf += UnsafeArrayData.fromPrimitiveArray(arr)
      } else {
        val len = -tag - 1
        val arr = new Array[Any](len)
        var i = 0
        while (i < len) {
          arr(i) = if (in.readBoolean()) null
            else java.lang.Double.valueOf(in.readDouble())
          i += 1
        }
        buf += new GenericArrayData(arr)
      }
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedSortedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedSortedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedSortedCollect =
    copy(child = newChildren(0))
}

object TopKExpressions {
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Aggregate column: k best (score DESC, id ASC) as
    * array<struct<score, id>>, sorted best-first. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(TopKByScore(
      ExpressionUtils.expression(score), ExpressionUtils.expression(id), k)
      .toAggregateExpression())

  /** Aggregate column: the `max` smallest ARRAY<DOUBLE> values in
    * ascending order (≡ slice(array_sort(collect_list(v)), 1, max)). */
  def boundedSortedCollect(v: Column, max: Int): Column =
    ExpressionUtils.column(BoundedSortedCollect(
      ExpressionUtils.expression(v), max).toAggregateExpression())

  // SQL registration: GraftFunctions.all (the single inventory)
}
