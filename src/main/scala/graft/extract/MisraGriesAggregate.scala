package graft.extract

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `mg_sketch(item, k)` — a Misra-Gries frequent-items summary as a native
  * Catalyst [[TypedImperativeAggregate]]: a BOUNDED (≤ k entries) mergeable
  * counter map over an unbounded item stream.
  *
  * Why an aggregate expression and not a `groupBy(item).count`: at corpus
  * scale the item domain (tokens, shingles, URLs) has billions of distinct
  * values, so the exact group-by shuffles the whole distinct domain and its
  * partial-aggregation hash maps overflow and flush. This sketch holds ≤ 2k
  * entries per partition NO MATTER the domain, and each partition ships one
  * ≤ k-entry summary to the single final merge — shuffle volume is
  * O(partitions · k), independent of data size. That is the 100 TB posture.
  *
  * Algorithm (Misra-Gries 1982, merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS 2012): counters grow to 2k, then COMPACT — subtract the
  * (k+1)-th largest count from every counter and drop the non-positive ones
  * (≥ k+1 counters shrink by the full cut, so the total mass removed per
  * compaction is ≥ cut·(k+1); summing over all compactions, every retained
  * count is an UNDERestimate by at most n/(k+1)). Merging two summaries is
  * the same: add counts pointwise, compact. Hence any item with true count
  * > n/(k+1) survives to the final summary — the candidate-superset
  * guarantee [[graft.data.HeavyHitters]] builds its exactness proof on.
  *
  * The emitted value is a `map<string,long>` of the ≤ k survivors with their
  * (under-)estimates, keys emitted in sorted order so the output is
  * deterministic given the same survivor set. The ESTIMATES are order-
  * dependent (any MG summary's are); only the superset guarantee is not —
  * consumers that need exact counts do a second exact pass over the ≤ k
  * candidates ([[graft.data.HeavyHitters.heavyHitters]]), which is what the
  * oracle checks.
  *
  * Reference analog: the reference counts surface-form frequencies driver-
  * side with `collections.Counter` (e.g. knowledge_graph/concept.py usage in
  * scripts); this is that capability made distributed and bounded.
  */
case class MisraGriesAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with UnaryLike[Expression] {

  require(k > 0, s"mg_sketch k must be positive: $k")

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"mg_sketch expects a string item column, got ${child.dataType.catalogString}")
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.updateWith(item) {
        case Some(c) => Some(c + 1L)
        case None => Some(1L)
      }
      // amortized compaction: let the map grow to 2k, cut back to <= k.
      if (buf.size >= 2 * k) compact(buf)
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) =>
      buf.updateWith(item) {
        case Some(c0) => Some(c0 + c)
        case None => Some(c)
      }
    }
    if (buf.size > k) compact(buf)
    buf
  }

  /** Subtract the (k+1)-th largest count from every counter, drop counters
    * that hit zero or below. Post: size ≤ k (everything ≤ the cut dies). */
  private def compact(buf: mutable.HashMap[String, Long]): Unit = {
    val counts = buf.values.toArray
    java.util.Arrays.sort(counts)
    val cut = counts(counts.length - (k + 1)) // (k+1)-th largest
    buf.filterInPlace((_, c) => c > cut)
    buf.mapValuesInPlace((_, c) => c - cut)
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val keys = buf.keysIterator.toArray
    java.util.Arrays.sort(keys, implicitly[Ordering[String]])
    new ArrayBasedMapData(
      new GenericArrayData(keys.map(UTF8String.fromString(_).asInstanceOf[Any])),
      new GenericArrayData(keys.map(buf(_).asInstanceOf[Any])))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAggregate =
    copy(child = newChild)

  override def prettyName: String = "mg_sketch"
}

object MisraGriesAggregate {
  /** Aggregate Column: `mg_sketch(item, k)` → map<string,long> (≤ k entries). */
  def mgSketch(item: Column, k: Int): Column =
    GraftColumnBridge.column(
      MisraGriesAggregate(GraftColumnBridge.expression(item), k).toAggregateExpression())
}
