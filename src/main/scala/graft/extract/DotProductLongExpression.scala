package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native `dot_product_long(array<bigint>, array<bigint>)` — the integer
  * sibling of [[DotProductExpression]], for SQ8-quantized vectors.
  *
  * Integer addition is associative, so unlike the double form there is no
  * accumulation-order caveat at all — the value is EXACT for any order;
  * the codegen loop exists purely because the HOF form
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` pays interpreted lambda
  * dispatch + boxing per element (measured 3.2× the FLOAT brute-force
  * scan time at 2M×100 SQ8 dot products — the compressed tier must not be
  * slower than the tier it compresses). Null semantics mirror the HOF
  * form: NULL array → NULL; length mismatch → NULL; NULL element → NULL.
  *
  * Overflow: |q| ≤ 127 per element ⇒ a 64-dim dot ≤ ~1.03e6 — twelve
  * orders of headroom under Long; no guard needed at any realistic dim.
  */
case class DotProductLongExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dot_product_long requires two array<bigint> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  // length mismatch / null elements produce NULL even for non-null inputs
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
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
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product_long"
}

object DotProductLongExpression {
  def dotProductLong(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProductLongExpression(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
