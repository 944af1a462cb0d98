package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * CodegenFallback: the loop body is UTF8String.compareTo — already
  * compiled JVM code; the expression keeps the surrounding stage in
  * whole-stage codegen like the other extraction expressions.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression
    with CodegenFallback {

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

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

object SortedIntersect {
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      SortedIntersectCount(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
