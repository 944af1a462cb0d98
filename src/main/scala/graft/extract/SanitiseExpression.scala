package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Sanitise

/** Native `sanitise(text)` expression — the reference's golden-output text
  * sanitisation (labelled_passage.py:109-133, ported char-for-char in
  * graft.core.Sanitise) as a Catalyst expression, so passage pipelines (A9)
  * run the REAL sanitiser inside a column plan instead of a UDF. Null
  * propagates (UnaryExpression's default null-safe eval). */
case class SanitiseText(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Sanitise(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "sanitise"
}

object SanitiseText {
  def sanitise(c: Column): Column =
    GraftColumnBridge.column(SanitiseText(GraftColumnBridge.expression(c)))
}
