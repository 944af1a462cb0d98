package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native `dot_product(array<double>, array<double>)` — the strict
  * left-to-right sequential fold `((0 + a0*b0) + a1*b1) + ...` as a
  * whole-stage-codegen expression.
  *
  * Semantically identical (bit-for-bit, same accumulation order) to the
  * higher-order-function form `aggregate(zip_with(a, b, (x,y) => x*y),
  * 0.0d, (acc,v) => acc+v)` it replaces — which is also what DuckDB's
  * `list_dot_product` computes, so oracle parity is untouched — but HOF
  * lambdas are interpreted per element (closure dispatch + boxing, three
  * folds per cosine), which made every embedding query pay ~17us per
  * 64-dim cosine. The codegen loop reads `ArrayData.getDouble` directly
  * and stays inside the surrounding WholeStageCodegen span.
  *
  * Null semantics mirror the HOF form exactly: NULL input array -> NULL;
  * length mismatch -> NULL (zip_with pads with NULL, NULL poisons the
  * fold); any NULL element -> NULL.
  */
case class DotProductExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two array<double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  // length mismatch / null elements produce NULL even for non-null inputs
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProductExpression {
  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProductExpression(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
