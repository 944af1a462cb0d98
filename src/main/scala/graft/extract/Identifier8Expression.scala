package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Identifier8

/** Native n-ary `identifier8(args...)` expression — the reference's
  * deterministic Identifier.generate as a Catalyst expression, so
  * golden-compatible ids can be minted inside any column plan (SURVEY.md
  * §2.10). Arguments are stringified with Python semantics: NULL -> "None",
  * integers/strings as-is. */
case class Identifier8Expression(children: Seq[Expression])
    extends Expression
    with CodegenFallback {

  require(children.nonEmpty, "identifier8 requires at least one argument")

  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val sb = new java.lang.StringBuilder()
    children.foreach { c =>
      val v = c.eval(input)
      if (v == null) sb.append("None")
      else
        v match {
          case s: UTF8String => sb.append(s.toString)
          case other         => sb.append(other.toString)
        }
    }
    UTF8String.fromString(Identifier8.ofString(sb.toString))
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "identifier8"
}

object Identifier8Expression {
  def identifier8(cols: Column*): Column =
    GraftColumnBridge.column(Identifier8Expression(cols.map(GraftColumnBridge.expression)))
}
