package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Identifier8Expression.identifier8
import graft.kg.{KgPipeline, Sources, Transcripts}

/** Alternative transcript source formats (JSONL/CSV) + the identifier8
  * expression. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("JSONL and CSV transcript sources round-trip the canonical table") {
    val t = Transcripts.read(spark, TestSpark.sf0001).cache()
    val dir = Files.createTempDirectory("graft_sources").toString

    t.write.json(s"$dir/jsonl")
    val fromJson = Sources.jsonl(spark, s"$dir/jsonl")
    assert(
      fromJson.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        Sources.transcriptsSchema.fields.map(f => (f.name, f.dataType)).toSeq
    )
    assert(fromJson.exceptAll(t).count() == 0 && t.exceptAll(fromJson).count() == 0)

    t.withColumn("ts", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .write.option("header", "true").csv(s"$dir/csv")
    val fromCsv = Sources.csv(spark, s"$dir/csv")
    assert(fromCsv.exceptAll(t).count() == 0 && t.exceptAll(fromCsv).count() == 0)

    t.write.orc(s"$dir/orc")
    val fromOrc = Sources.orc(spark, s"$dir/orc")
    assert(fromOrc.exceptAll(t).count() == 0 && t.exceptAll(fromOrc).count() == 0)

    // the pipeline runs unchanged on an alternative source
    val m = KgPipeline.extractMentionEdges(
      spark, KgPipeline.eligibleTurns(fromJson), KgPipeline.defaultConcepts)
    assert(m.count() > 0)
  }

  test("identifier8 expression matches the reference algorithm inside a column plan") {
    val df = Seq(("text", 0, 5, "Q42"), ("naïve ünïcode ΔT", 3, 17, "Q787"))
      .toDF("t", "s", "e", "c")
      .select(identifier8(col("t"), col("s"), col("e"), col("c")).as("id"), col("t"), col("s"), col("e"), col("c"))
    val got = df.collect().map(r => (r.getString(1), r.getInt(2), r.getInt(3), r.getString(4)) -> r.getString(0)).toMap
    // cross-check against the pure function (itself locked to the reference
    // byte-for-byte in CoreSpec)
    got.foreach { case ((t, s, e, c), id) =>
      assert(id == graft.core.Identifier8.spanId(t, s, e, c))
    }
    // NULL -> "None" (python str(None))
    val withNull = Seq(("x", null: String)).toDF("a", "b")
      .select(identifier8(col("a"), col("b")).as("id")).collect()(0).getString(0)
    assert(withNull == graft.core.Identifier8.ofString("xNone"))
  }

  test("session-cache fingerprint tracks rewrites of single-FILE parquet datasets") {
    // the testdata layout backs each table with one parquet file, not a
    // directory — listFiles() returns null there, and a constant fingerprint
    // would disable supersession eviction and serve stale cached artifacts
    val dir = java.nio.file.Files.createTempDirectory("fp").toFile
    try {
      val f = new java.io.File(dir, "documents.parquet")
      java.nio.file.Files.write(f.toPath, "v1".getBytes)
      f.setLastModified(1000000L)
      val fp1 = SparkEntry.fingerprint(dir.getPath, "documents")
      assert(fp1 != "documents:17", "single-file dataset must not collapse to the empty fingerprint")
      // in-place rewrite: same name, new length/mtime -> new fingerprint
      java.nio.file.Files.write(f.toPath, "v2-longer".getBytes)
      f.setLastModified(2000000L)
      val fp2 = SparkEntry.fingerprint(dir.getPath, "documents")
      assert(fp2 != fp1)
      // directory-of-parts layout still fingerprints its contents
      val sub = new java.io.File(dir, "orders.parquet")
      assert(sub.mkdir())
      java.nio.file.Files.write(new java.io.File(sub, "part-0").toPath, "p".getBytes)
      val fp3 = SparkEntry.fingerprint(dir.getPath, "orders")
      java.nio.file.Files.write(new java.io.File(sub, "part-1").toPath, "q".getBytes)
      assert(SparkEntry.fingerprint(dir.getPath, "orders") != fp3)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}
