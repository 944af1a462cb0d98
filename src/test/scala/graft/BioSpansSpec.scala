package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.extract.{BioSpans, ModelClassifiers}

/** C4 BIO span reconstruction vs the EXECUTED reference
  * `_reconstruct_spans_from_predictions` (tools/gen_bio_vectors.py runs the
  * real function with model imports stubbed) — 66 vectors including orphaned
  * I runs, adjacent B-B, spans open at sequence end, sub-min-length spans
  * and mid-sequence special tokens. Plus the Spark plumbing for C3/C4. */
class BioSpansSpec extends AnyFunSuite {

  test("reconstruction matches the executed reference on all vectors") {
    val in = getClass.getResourceAsStream("/bio_vectors.json")
    require(in != null)
    val root = new ObjectMapper().readTree(in)
    in.close()
    var n = 0
    root.asScala.foreach { c =>
      val labels = c.get("labels").asScala.map(_.asInt()).toArray
      val probs = c.get("probs").asScala.map(_.asDouble()).toArray
      val offsets = c.get("offsets").asScala.map(o => (o.get(0).asInt(), o.get(1).asInt())).toArray
      val expected = c.get("expected").asScala.map { s =>
        (s.get("start").asInt(), s.get("end").asInt(), s.get("probability").asDouble())
      }.toVector
      val got = BioSpans.reconstruct(labels, probs, offsets).map(s => (s.start, s.end, s.probability))
      assert(got == expected, s"case $n: labels=${labels.mkString(",")}")
      n += 1
    }
    assert(n == 66)
  }

  test("C4 token classifier: batched mapPartitions plumbing reconstructs trigger-run spans") {
    val spark = TestSpark.spark
    import spark.implicits._
    val passages = Seq(
      (1L, "the carbon tax was introduced"),
      (2L, "no relevant content here"),
      (3L, "carbon tax now or carbon later")
    ).toDF("passage_id", "text")
    val scorer =
      new ModelClassifiers.StubTokenScorer(triggers = Set("carbon"), continuations = Set("tax", "later"))
    val got = ModelClassifiers
      .predictTokenSpans(spark, passages, scorer, "Q99", threshold = None, batchSize = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    // passage 1: "carbon tax" is one B+I run (chars 4..14); passage 3 has two
    // runs: "carbon tax" (0..10) and "carbon later" (18..30)
    assert(got == Set((1L, 4, 14, "Q99"), (3L, 0, 10, "Q99"), (3L, 18, 30, "Q99")))
    // surfaces line up with the reconstructed char offsets
    val texts = Map(1L -> "the carbon tax was introduced", 3L -> "carbon tax now or carbon later")
    got.foreach { case (id, s, e, _) =>
      assert(texts(id).substring(s, e).startsWith("carbon"), s"($id,$s,$e)")
    }
  }

  test("C3 sequence classifier: whole-text span contract at the reference threshold") {
    val spark = TestSpark.spark
    import spark.implicits._
    val passages = (0L until 40L).map(i => (i, s"tok$i alpha beta gamma")).toDF("passage_id", "text")
    val scorer = new ModelClassifiers.StubSequenceScorer
    val rows = ModelClassifiers
      .predictSequence(spark, passages, scorer, "Q1651", threshold = 0.524, batchSize = 8)
      .collect()
    assert(rows.nonEmpty && rows.length < 40, "threshold must genuinely split the batch")
    rows.foreach { r =>
      assert(r.getInt(1) == 0) // start = 0
      assert(r.getInt(2) == s"tok${r.getLong(0)} alpha beta gamma".length) // end = len(text)
      assert(r.getString(3) == "Q1651")
      assert(r.getDouble(4) >= 0.524)
    }
    // deterministic: a second run yields the identical row set
    val again = ModelClassifiers
      .predictSequence(spark, passages, scorer, "Q1651", threshold = 0.524, batchSize = 8)
      .collect()
    assert(again.map(_.toString).sorted.toSeq == rows.map(_.toString).sorted.toSeq)
  }
}
