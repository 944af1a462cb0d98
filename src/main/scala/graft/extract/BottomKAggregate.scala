package graft.extract

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `bottom_k(h, k)` — the k smallest DISTINCT long values as a native
  * Catalyst [[TypedImperativeAggregate]]: the KMV sketch's state, bounded
  * at k longs per partition no matter the input size.
  *
  * Why an aggregate and not `orderBy(h).limit(k)`: the sort formulation
  * shuffles every surviving row into one ordered take (the map-side
  * pre-filter in [[graft.data.Sketches.kmvBottomKOf]] bounds that, but
  * only given a cardinality estimate); this buffer needs no estimate —
  * each partition ships exactly ≤ k longs to the final merge, the same
  * O(partitions·k) posture as [[MisraGriesAggregate]]. It is also the
  * piece that makes a STREAMING KMV twin possible: bottom-k is min-like —
  * re-observing any value cannot change the state — so the streaming
  * aggregation absorbs at-least-once replays for free, like the HLL
  * register MAX and unlike the Count-Min SUM.
  *
  * Emitted value: array<bigint> of the ≤ k survivors in ascending order
  * (deterministic — the set of k smallest distinct values is unique).
  */
case class BottomKAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]]
    with UnaryLike[Expression] {

  require(k > 0, s"bottom_k k must be positive: $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bottom_k expects a bigint column, got ${child.dataType.catalogString}")
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.TreeSet[Long] = mutable.TreeSet.empty[Long]

  private def add(buf: mutable.TreeSet[Long], v: Long): Unit = {
    // skip values that cannot enter a full buffer — keeps the common path
    // allocation-free (TreeSet.last is O(log n))
    if (buf.size < k) { buf += v; () }
    else if (v < buf.last && !buf.contains(v)) { buf += v; buf -= buf.last; () }
  }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray.map(_.asInstanceOf[Any]))

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf += bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomKAggregate =
    copy(child = newChild)

  override def prettyName: String = "bottom_k"
}

object BottomKAggregate {
  /** Aggregate Column: `bottom_k(h, k)` → array<bigint> (≤ k ascending). */
  def bottomK(h: Column, k: Int): Column =
    GraftColumnBridge.column(
      BottomKAggregate(GraftColumnBridge.expression(h), k).toAggregateExpression())
}
