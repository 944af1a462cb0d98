package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** string -> array<struct<pos:int, h:bigint>>: one 64-bit hash per
  * `width`-token sliding window of the whitespace-tokenized text, computed in
  * a single O(n) pass (per-token FNV-1a over the UTF-8 bytes, then a rolling
  * polynomial across the window — remove the outgoing token, shift, add the
  * incoming one). Two windows carry the same hash iff their token sequences
  * match (modulo 64-bit collisions); equal joined-with-space strings and
  * equal token sequences are the same thing because tokens cannot contain
  * the separator. `pos` is the 0-based token index of the window start;
  * texts shorter than `width` tokens yield an empty array.
  *
  * This is the scale-path primitive for substring-level exact dedup (the
  * "remove any >=W-token span that appears verbatim elsewhere in the corpus"
  * posture of Lee et al. 2021): the shuffle downstream carries ~20 bytes per
  * token instead of the W-token window strings a transform(sequence(...),
  * concat_ws) formulation would materialize (O(n*W) bytes map-side AND
  * interpreted per element — Spark HOF lambdas don't codegen).
  *
  * Tokenization matches split(text, " ") / DuckDB string_split(text, ' '):
  * split on every single space, empty tokens preserved. Splitting on the raw
  * UTF-8 bytes is safe — 0x20 never occurs inside a multi-byte sequence.
  */
case class TokenWindowHashes(child: Expression, width: Int) extends UnaryExpression with CodegenFallback {
  require(width >= 1, s"window width must be positive, got $width")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"token_window_hashes requires a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(
    StructType(
      Seq(
        StructField("pos", IntegerType, nullable = false),
        StructField("h", LongType, nullable = false)
      )
    ),
    containsNull = false
  )

  override def nullable: Boolean = child.nullable

  private val B = 0x9e3779b97f4a7c15L // odd multiplier -> invertible mod 2^64

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val bytes = v.asInstanceOf[UTF8String].getBytes
    // per-token FNV-1a hashes, one pass over the bytes, no token allocation
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    if (nTok < width) return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](nTok)
    var t = 0
    var h = 0xcbf29ce484222325L
    i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == ' ') { th(t) = h; t += 1; h = 0xcbf29ce484222325L }
      else h = (h ^ (b & 0xffL)) * 0x100000001b3L
      i += 1
    }
    th(t) = h
    // rolling polynomial: win(p) = sum_k th(p+k) * B^(width-1-k)  (mod 2^64)
    var pw = 1L // B^(width-1)
    var k = 1
    while (k < width) { pw *= B; k += 1 }
    var wh = 0L
    k = 0
    while (k < width) { wh = wh * B + th(k); k += 1 }
    val out = new Array[Any](nTok - width + 1)
    out(0) = InternalRow(0, wh)
    var p = 1
    while (p <= nTok - width) {
      wh = (wh - th(p - 1) * pw) * B + th(p + width - 1)
      out(p) = InternalRow(p, wh)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "token_window_hashes"
}

object TokenWindowHashes {
  import org.apache.spark.sql.GraftColumnBridge

  def tokenWindowHashes(s: Column, width: Int): Column =
    GraftColumnBridge.column(TokenWindowHashes(GraftColumnBridge.expression(s), width))
}
