package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native `sorted_intersect_count(array<string>, array<string>)` — the size
  * of the intersection of two DISTINCT, ASCENDING-SORTED string arrays by a
  * single linear merge.
  *
  * Replaces `size(array_intersect(a, b))` in the exact-Jaccard verification
  * of LSH candidates (Dedup.verifyJaccard): array_intersect builds a hash
  * set PER INVOCATION (~25 us per ~55-shingle pair measured at sf0.1 —
  * 7.1 s of the 8.9 s dedup_minhash row under exhaustive banding). The
  * merge walk is a handful of UTF8String comparisons per element with zero
  * allocation. Given distinct sorted inputs the count is IDENTICAL to
  * array_intersect's (set semantics), and the union size follows as
  * |A| + |B| − |A∩B|, so oracle parity is untouched. Callers are
  * responsible for the sorted-distinct precondition
  * (array_sort(array_distinct(...)) — one sort per DOC, amortized over all
  * its candidate pairs).
  *
  * Full doGenCode: the merge loop is emitted inline into the surrounding
  * whole-stage-codegen stage, reading the two ArrayData locals directly. A
  * CodegenFallback here forces the generated stage to materialize every
  * input row (two ~55-string arrays copied into an UnsafeRow per candidate
  * pair) just to call eval — measured ~3x the cost of the merge itself on
  * the dedup_minhash verification stage.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two array<string> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny")
        val c = ctx.freshName("cmp")
        s"""
           |int $i = 0;
           |int $j = 0;
           |final int $nx = $a.numElements();
           |final int $ny = $b.numElements();
           |${ev.value} = 0;
           |while ($i < $nx && $j < $ny) {
           |  final int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
           |  if ($c == 0) { ${ev.value}++; $i++; $j++; }
           |  else if ($c < 0) { $i++; } else { $j++; }
           |}
         """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

object SortedIntersect {
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      SortedIntersectCount(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
