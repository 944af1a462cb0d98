package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Geography

/** string -> ISO code via the reference's fuzzy geography match
  * (geography.py:22-33). Runs inside the codegen'd projection like the
  * gazetteer expressions (CodegenFallback: the DP is compiled JVM code);
  * the dimension is plan-embedded — a bounded model artifact. */
case class GeoLink(child: Expression) extends UnaryExpression with CodegenFallback {

  // a non-string child must fail at ANALYSIS, not as an executor-side
  // ClassCastException (AbstractDataType/ExpectsInputTypes is private[sql],
  // so the check is spelled out)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"geo_link requires a string input, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else UTF8String.fromString(Geography.bestIso(v.asInstanceOf[UTF8String].toString))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "geo_link"
}

object GeoLink {
  import org.apache.spark.sql.GraftColumnBridge

  def linkGeography(s: Column): Column =
    GraftColumnBridge.column(GeoLink(GraftColumnBridge.expression(s)))
}
