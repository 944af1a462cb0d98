package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.RollingChunker

/** string -> array<struct<chunk_idx:int, start:int, end:int, chunk_md5>>:
  * content-defined chunks of the UTF-8 bytes via the Karp-Rabin rolling hash
  * (RollingChunker). Offsets are BYTE offsets into the UTF-8 encoding; the
  * md5 is over the chunk's bytes. Runs inside the codegen'd projection
  * (CodegenFallback — the chunker is compiled JVM code). */
case class CdcChunks(child: Expression) extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"cdc_chunks requires a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(
    StructType(
      Seq(
        StructField("chunk_idx", IntegerType, nullable = false),
        StructField("start", IntegerType, nullable = false),
        StructField("end", IntegerType, nullable = false),
        StructField("chunk_md5", StringType, nullable = false)
      )
    ),
    containsNull = false
  )
  // null propagates like any Spark expression (a null text is NOT an empty
  // document — GeoLink has the same contract)
  override def nullable: Boolean = child.nullable

  @transient private lazy val digestTL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val ends = RollingChunker.boundaries(bytes)
    val md = digestTL.get()
    val rows = new Array[Any](ends.length)
    var start = 0
    var i = 0
    while (i < ends.length) {
      val end = ends(i)
      md.reset()
      md.update(bytes, start, end - start)
      val hex = md.digest().map("%02x".format(_)).mkString
      rows(i) = InternalRow(i, start, end, UTF8String.fromString(hex))
      start = end
      i += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "cdc_chunks"
}

object CdcChunks {
  import org.apache.spark.sql.GraftColumnBridge

  def cdcChunks(s: Column): Column =
    GraftColumnBridge.column(CdcChunks(GraftColumnBridge.expression(s)))
}
