package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.core.RollingChunker

/** Content-defined chunking vs the independent python implementation
  * (tools/gen_cdc_vectors.py) plus structural invariants. */
class CdcSpec extends AnyFunSuite {

  private lazy val vectors: Vector[(String, Vector[(Int, Int, Int, String)])] = {
    val in = getClass.getResourceAsStream("/cdc_vectors.json")
    require(in != null)
    val root = new ObjectMapper().readTree(in)
    in.close()
    root.asScala.toVector.map { n =>
      val t = n.get("text").asText()
      val cs = n.get("chunks").asScala.toVector.map { c =>
        (c.get(0).asInt(), c.get(1).asInt(), c.get(2).asInt(), c.get(3).asText())
      }
      (t, cs)
    }
  }

  private def localChunks(text: String): Vector[(Int, Int, Int, String)] = {
    val bytes = text.getBytes("UTF-8")
    val md = java.security.MessageDigest.getInstance("MD5")
    var start = 0
    RollingChunker.boundaries(bytes).zipWithIndex.map { case (end, idx) =>
      md.reset()
      md.update(bytes, start, end - start)
      val hex = md.digest().map("%02x".format(_)).mkString
      val r = (idx, start, end, hex)
      start = end
      r
    }
  }

  test("boundaries match the independent python DP on all 49 vectors (incl. unicode)") {
    vectors.foreach { case (t, expected) =>
      assert(localChunks(t) == expected, s"text='${t.take(40)}...' (${t.length} chars)")
    }
  }

  test("structural invariants: cover, bounds, determinism, content-anchoring") {
    val text = "the quick brown fox jumps over the lazy dog " * 30
    val bytes = text.getBytes("UTF-8")
    val ends = RollingChunker.boundaries(bytes)
    assert(ends.last == bytes.length)
    assert(ends == ends.sorted && ends.distinct == ends)
    val lens = (0 +: ends).sliding(2).map(p => p(1) - p(0)).toVector
    assert(lens.forall(l => l >= 1 && l <= RollingChunker.MaxLen))
    // content anchoring: inserting a prefix shifts early boundaries but the
    // tail chunk hashes re-align (the CDC property fixed blocks lack)
    val shifted = ("PREFIX-INSERTED " + text).getBytes("UTF-8")
    def hashes(b: Array[Byte]) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      var s = 0
      RollingChunker.boundaries(b).map { e =>
        md.reset(); md.update(b, s, e - s); s = e
        md.digest().map("%02x".format(_)).mkString
      }
    }
    val common = hashes(bytes).toSet intersect hashes(shifted).toSet
    assert(common.size >= hashes(bytes).size / 2, "tail chunks failed to re-align after insertion")
  }

  test("spark expression matches the local chunker over corpus texts") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet").limit(50)
    val got = docs
      .select(col("text"), explode(graft.extract.CdcChunks.cdcChunks(col("text"))).as("c"))
      .select(col("text"), col("c.chunk_idx"), col("c.start"), col("c.end"), col("c.chunk_md5"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (t, rows) =>
        t -> rows.map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).sortBy(_._1).toVector
      }
    got.foreach { case (t, cs) => assert(cs == localChunks(t), s"text='${t.take(40)}'") }
    assert(got.nonEmpty)
  }

  test("null text propagates to a null chunk array (not an empty one)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq((1L, Option("one two three")), (2L, None: Option[String]))
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.extract.CdcChunks.cdcChunks(col("text")).as("chunks"))
      .orderBy("doc_id")
      .collect()
    assert(!rows(0).isNullAt(1) && rows(0).getSeq[Any](1).nonEmpty)
    assert(rows(1).isNullAt(1), "null input must yield null, not empty array")
    // empty string stays distinguishable: zero chunks but non-null
    val empty = Seq((3L, "")).toDF("doc_id", "text")
      .select(graft.extract.CdcChunks.cdcChunks(col("text")).as("chunks"))
      .collect()(0)
    assert(!empty.isNullAt(0) && empty.getSeq[Any](0).isEmpty)
  }
}
