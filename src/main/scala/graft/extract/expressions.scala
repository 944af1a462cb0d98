package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Identifier8

/** Native Catalyst expressions for mention extraction.
  *
  * Why expressions instead of a typed flatMap: a Dataset flatMap forces a
  * full decode of every input row into JVM objects and a re-encode of every
  * output object — at 10^8 rows that allocation traffic, not the matching
  * arithmetic, is what throttles single-node scaling. As expressions, the
  * extraction runs inside the codegen'd projection: only the text column is
  * materialized (one UTF8String -> String per row), conv_id/turn_idx flow
  * through as unsafe rows untouched, and results are emitted as ArrayData
  * consumed directly by explode.
  *
  * These are CodegenFallback (the matcher itself is already compiled JVM
  * code; generating Java for it would buy nothing), which keeps the
  * surrounding stage in whole-stage codegen.
  */

/** array<int> of concept ORDINALS (indices into gazetteer.concepts) with
  * >= 1 surviving mention — the primitive-keyed twin of
  * ExtractConceptsPresent for stateful streaming, where repeating the
  * concept-id STRING through shuffle, state encode and state decode is the
  * dominant cost. Consumers map ordinals back via gazetteer.concepts. */
case class ExtractOrdinalsPresent(child: Expression, gazetteer: Gazetteer)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Int])
    val present = gazetteer.findPresent(v.asInstanceOf[UTF8String].toString)
    var n = 0
    var i = 0
    while (i < present.length) { if (present(i)) n += 1; i += 1 }
    val out = new Array[Int](n)
    var k = 0
    i = 0
    while (i < present.length) {
      if (present(i)) { out(k) = i; k += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "extract_ordinals_present"
}

/** array<string> of concept ids with >= 1 surviving mention in the text. */
case class ExtractConceptsPresent(child: Expression, gazetteer: Gazetteer)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val idsUtf8: Array[UTF8String] =
    gazetteer.concepts.map(c => UTF8String.fromString(c.wikibaseId)).toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Any])
    val present = gazetteer.findPresent(v.asInstanceOf[UTF8String].toString)
    var n = 0
    var i = 0
    while (i < present.length) { if (present(i)) n += 1; i += 1 }
    val out = new Array[Any](n)
    var k = 0
    i = 0
    while (i < present.length) {
      if (present(i)) { out(k) = idsUtf8(i); k += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "extract_concepts_present"
}

/** array<struct<concept_id, start, end, surface, span_id>> — full
  * span-grain mention extraction (C1 semantics for every concept at once). */
case class ExtractMentions(child: Expression, gazetteer: Gazetteer, withSpanIds: Boolean = true)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(
      Seq(
        StructField("concept_id", StringType, nullable = false),
        StructField("start", IntegerType, nullable = false),
        StructField("end", IntegerType, nullable = false),
        StructField("surface", StringType, nullable = false),
        StructField("span_id", StringType, nullable = true)
      )
    ),
    containsNull = false
  )
  override def nullable: Boolean = false

  @transient private lazy val idsUtf8: Array[UTF8String] =
    gazetteer.concepts.map(c => UTF8String.fromString(c.wikibaseId)).toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Any])
    val text = v.asInstanceOf[UTF8String].toString
    val all = gazetteer.findAllRaw(text) // UTF-16 indices for substring
    val convert = graft.core.CodePoints.hasSupplementary(text)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
    var ci = 0
    while (ci < all.length) {
      val spans = all(ci)
      if (spans.nonEmpty) {
        val conceptId = gazetteer.concepts(ci).wikibaseId
        spans.foreach { s =>
          val surface = text.substring(s.start, s.end)
          // emitted offsets (and the ids derived from them) are codepoint-
          // based, matching the reference's Python string indices
          val cpStart = if (convert) text.codePointCount(0, s.start) else s.start
          val cpEnd = if (convert) text.codePointCount(0, s.end) else s.end
          val spanId =
            if (withSpanIds) UTF8String.fromString(Identifier8.spanId(text, cpStart, cpEnd, conceptId))
            else null
          rows += InternalRow(
            idsUtf8(ci),
            cpStart,
            cpEnd,
            UTF8String.fromString(surface),
            spanId
          )
        }
      }
      ci += 1
    }
    new GenericArrayData(rows.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "extract_mentions"
}

object expressions {
  import org.apache.spark.sql.GraftColumnBridge

  def extractConceptsPresent(text: Column, gazetteer: Gazetteer): Column =
    GraftColumnBridge.column(ExtractConceptsPresent(GraftColumnBridge.expression(text), gazetteer))

  def extractOrdinalsPresent(text: Column, gazetteer: Gazetteer): Column =
    GraftColumnBridge.column(ExtractOrdinalsPresent(GraftColumnBridge.expression(text), gazetteer))

  def extractMentions(text: Column, gazetteer: Gazetteer, withSpanIds: Boolean = true): Column =
    GraftColumnBridge.column(ExtractMentions(GraftColumnBridge.expression(text), gazetteer, withSpanIds))
}
