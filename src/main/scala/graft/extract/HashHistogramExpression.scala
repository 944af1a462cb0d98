package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** `hash_histogram(text, dim)` — the hashed-token-count embedding used by the
  * synthetic text-derived classifier pass (KgPipeline.multiClassifierMentions)
  * as ONE per-row call instead of per-token HOF lambdas.
  *
  * Bit-identical to the column form it replaces:
  * {{{
  *   hv = transform(split(text, " "), t => (conv(substring(md5(t),1,15),16,10) % dim).cast("int"))
  *   e  = transform(sequence(0, dim-1), i => (size(filter(hv, h => h === i)) + 1).cast("double"))
  * }}}
  * i.e. bucket = first 60 bits of md5(token) mod dim, +1 smoothing, counts as
  * exact small-integer doubles — which is also what the DuckDB oracle
  * recomputes from scratch. The HOF form evaluated interpreted lambdas
  * per token per bucket (O(dim x tokens) closure dispatches per row); here
  * the md5 calls are the only real work.
  *
  * Split semantics mirror Spark's `split(text, " ")` (limit -1: trailing
  * empty tokens kept, consecutive spaces yield empty tokens, and md5 of the
  * empty string is hashed like any other token). NULL text -> NULL, matching
  * the HOF chain's null propagation.
  */
case class HashHistogramExpression(child: Expression, dim: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(dim > 0, "hash_histogram dim must be positive")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val md = HashHistogramExpression.digestTL.get()
    val counts = new Array[Long](dim)
    // limit -1 == Spark StringSplit default: keep trailing empty strings
    text.split(" ", -1).foreach { tok =>
      md.reset()
      val digest = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars = high 60 bits of the digest, as in
      // conv(substring(md5(t),1,15),16,10): 7.5 bytes -> drop the low nibble
      // of byte 7
      var h = 0L
      var i = 0
      while (i < 7) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
      h = (h << 4) | ((digest(7) & 0xf0L) >> 4)
      counts((h % dim).toInt) += 1
    }
    new GenericArrayData(counts.map(c => (c + 1).toDouble))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "hash_histogram"
}

object HashHistogramExpression {
  // one digest per executor thread (same idiom as Identifier8):
  // MessageDigest.getInstance is a provider lookup + allocation per call
  private val digestTL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def hashHistogram(text: Column, dim: Int): Column =
    GraftColumnBridge.column(HashHistogramExpression(GraftColumnBridge.expression(text), dim))
}
