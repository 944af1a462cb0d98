package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kg.Aggregations

/** Aggregation differential on the reference's OWN emitted aggregate-flow
  * output (the json files under tests/flows/fixtures/inference_results — the
  * {passage_id: [VespaConcept...]} documents its S5 sink writes,
  * flows/aggregate.py:301-408): parse the real VespaConcept records, push
  * them through this engine's S8/G1 grouping and G4 model-field parse, and
  * check the per-passage collation is reproduced exactly. This widens the
  * golden evidence beyond the labelled_passages families: GoldenPrSpec
  * proves the MATCHER reproduces reference spans; this proves the
  * AGGREGATION layer reproduces reference grouping on reference-emitted
  * data (including its quirks — swapped start/end offsets and a mix of
  * legacy labeller strings and v2 "wikibase:concept:classifier" models).
  */
class InferenceResultsSpec extends AnyFunSuite {

  private val base = Paths.get("/root/reference/tests/flows/fixtures/inference_results")
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** (doc, passage_id, concept_id, name, model, start, end, ts) rows. */
  private def parse(file: String): Vector[(String, String, String, String, String, Int, Int, String)] = {
    val root = mapper.readTree(new String(Files.readAllBytes(base.resolve(file)), "UTF-8"))
    root.properties().asScala.toVector.flatMap { e =>
      e.getValue.asScala.toVector.map { c =>
        (
          file,
          e.getKey,
          c.get("id").asText(),
          c.get("name").asText(),
          c.get("model").asText(),
          c.get("start").asInt(),
          c.get("end").asInt(),
          c.get("timestamp").asText()
        )
      }
    }
  }

  private val files = Seq(
    // counts pinned from the fixture content: passages, concept records
    ("CCLW.executive.4934.1571.json", 135, 30),
    ("CCLW.executive.10014.4470_translated_en.json", 1830, 416)
  )

  test("reference inference_results fixtures parse at the pinned shape") {
    assume(Files.isDirectory(base), "reference fixtures not present")
    files.foreach { case (f, nPassages, nConcepts) =>
      val rows = parse(f)
      val root = mapper.readTree(new String(Files.readAllBytes(base.resolve(f)), "UTF-8"))
      assert(root.size() == nPassages, s"$f passage count")
      assert(rows.size == nConcepts, s"$f concept count")
      // the fixtures carry start/end SWAPPED (every record has end < start);
      // the differential must see the data as-is, so pin the quirk
      assert(rows.forall { case (_, _, _, _, _, start, end, _) => end < start })
      // ISO-microsecond timestamps parse (the §2.8 timestamp contract)
      rows.foreach { r =>
        assert(java.time.LocalDateTime.parse(r._8).getYear == 2025, s"timestamp ${r._8}")
      }
    }
  }

  test("G4 model-field parse splits the fixtures' mixed model formats") {
    assume(Files.isDirectory(base), "reference fixtures not present")
    val models = files.flatMap(f => parse(f._1)).map(_._5).distinct
    val legacy = models.filter(_.startsWith("KeywordClassifier("))
    val v2 = models.filter(m => Aggregations.parseModelField(m).isDefined)
    assert(legacy.nonEmpty && v2.nonEmpty, s"expected both formats, got $models")
    // the two classes partition the model set: legacy strings never parse as
    // v2 (aggregate.py:141-171 returns None for them), v2 triplets always do
    assert(legacy.forall(m => Aggregations.parseModelField(m).isEmpty))
    assert((legacy.toSet ++ v2.toSet) == models.toSet)
    v2.foreach { m =>
      val Some((wid, cid, clf)) = Aggregations.parseModelField(m)
      assert(m == s"$wid:$cid:$clf")
    }
  }

  test("S8 grouping over reference-emitted concepts reproduces the per-passage collation") {
    assume(Files.isDirectory(base), "reference fixtures not present")
    val spark = TestSpark.spark
    val rows = files.flatMap(f => parse(f._1))
    // map the fixture grain onto the engine's (conv_id, turn_idx) grain:
    // doc -> conv, passage ordinal -> turn (the reference keys passages by
    // string id; a dense ordinal per doc preserves identity for grouping)
    val passageIdx = rows.map(r => (r._1, r._2)).distinct.zipWithIndex.toMap
    val data = rows.map { case (doc, pid, conceptId, _, _, start, end, _) =>
      Row(doc, passageIdx((doc, pid)), start, end, conceptId, s"$conceptId@$start")
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("conv_id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("turn_idx", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("start", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("end", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("concept_id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("span_id", org.apache.spark.sql.types.StringType)))
    val df = spark.createDataFrame(data.asJava, schema)
    val grouped = Aggregations
      .mentionsPerTurn(df)
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getSeq[Row](2).map(s => (s.getInt(0), s.getInt(1), s.getString(2)))))
      .toMap
    // every non-empty fixture passage groups to exactly its concept multiset
    val expected = rows
      .groupBy(r => (r._1, passageIdx((r._1, r._2))))
      .view
      .mapValues(_.map(r => (r._6, r._7, r._3)).sorted)
      .toMap
    assert(grouped.keySet == expected.keySet)
    expected.foreach { case (k, exp) =>
      assert(grouped(k) == exp, s"passage $k collation mismatch")
      // O2: our emitted arrays are sorted by span start (the fixture's own
      // in-file order is insertion order — 112 of 1965 passages unsorted —
      // which the reference only sorts downstream, index.py:508-573)
      assert(grouped(k).map(_._1) == grouped(k).map(_._1).sorted)
    }
    val nSpans = Aggregations.mentionsPerTurn(df).agg(sum(col("n_spans"))).collect()(0).getLong(0)
    assert(nSpans == rows.size)
  }
}
