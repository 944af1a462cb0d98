package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.SpanXml

/** C5 at the distributed grain: the LLM span-emission path
  * (span.py:247-384 + the fuzzy alignment at span.py:489-553) driven by a
  * DETERMINISTIC annotation simulator.
  *
  * The LLM response is an INPUT to the reference pipeline, by design —
  * `Span.from_xml` never calls a model. `LlmSim.buildXml` stands in for that
  * input: it wraps trigger tokens in `<concept>` tags and perturbs the
  * annotation the way a paraphrasing annotator does (extra whitespace,
  * dropped tokens, truncated wrapped tokens), so the exact-at-offset,
  * exact-in-window, fuzzy-ratio and unalignable-drop branches of the
  * alignment all fire on a real corpus. The same builder is mirrored by
  * tools/gen_c5_fixture.py, which runs the EXECUTED reference
  * `Span.from_xml` over the same pairs to mint the oracle fixture.
  */
object LlmSim {
  val Triggers: Set[String] = Set("scan", "join", "merge", "window", "sort")

  /** Deterministic annotator-mutation of `text` (single-space tokenized):
    *  - trigger tokens are wrapped in <concept> tags; every 7-residue-3
    *    wrapped token longer than 4 chars loses its last char (fuzzy branch)
    *  - every 13-residue-5 unwrapped token is dropped from the annotation
    *    (offset shift; occasionally pushes a span out of its search window —
    *    the unalignable-drop branch)
    *  - every 9-residue-4 token gains a trailing space (whitespace drift)
    * Mirrored token-for-token by tools/gen_c5_fixture.py. */
  def buildXml(text: String): String = {
    val toks = text.split(" ", -1)
    val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    var i = 0
    while (i < toks.length) {
      val tok = toks(i)
      val wrapped = Triggers(tok.toLowerCase)
      if (!wrapped && i % 13 == 5) () // dropped from the annotation
      else {
        val t = if (wrapped && i % 7 == 3 && tok.length > 4) tok.substring(0, tok.length - 1) else tok
        val piece = if (wrapped) s"<concept>$t</concept>" else t
        out += (if (i % 9 == 4) piece + " " else piece)
      }
      i += 1
    }
    out.mkString(" ")
  }
}

/** array<struct<start:int,end:int,surface:string>> of aligned LLM spans in
  * the input text. CodegenFallback like the other extraction expressions:
  * the alignment is compiled JVM code already, and staying an expression
  * keeps the surrounding stage in whole-stage codegen with only the text
  * column materialized. */
case class LlmXmlSpans(child: Expression, conceptId: String) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("start", IntegerType, nullable = false),
      StructField("end", IntegerType, nullable = false),
      StructField("surface", StringType, nullable = false)
    )),
    containsNull = false
  )
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Any])
    val text = v.asInstanceOf[UTF8String].toString
    val xml = LlmSim.buildXml(text)
    val spans = SpanXml.fromXml(xml, conceptId, Vector("llm"), Some(text))
    val rows: Array[Any] = spans.map { sp =>
      InternalRow(sp.start, sp.end, UTF8String.fromString(text.substring(sp.start, sp.end)))
    }.toArray
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "llm_xml_spans"
}

object LlmXml {
  import org.apache.spark.sql.GraftColumnBridge
  def llmXmlSpans(text: Column, conceptId: String): Column =
    GraftColumnBridge.column(LlmXmlSpans(GraftColumnBridge.expression(text), conceptId))
}
