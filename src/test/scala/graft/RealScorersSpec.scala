package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.extract.{BioSpans, ModelClassifiers}

/** The REAL-WEIGHTS scorers behind the C3/C4 seam: JVM execution parity
  * against the offline numpy trainer (tools/train_c3c4_models.py), plus
  * BioSpans reconstruction over genuine learned-model output.
  */
class RealScorersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixDir = "src/test/resources"

  /** All distinct en texts across the sf dirs plus the COMMITTED fixture
    * texts (ref_texts.parquet pins every fixture key's text so the suite is
    * hermetic — it does not depend on the gitignored bigdata/ sweep corpus
    * having been regenerated); the sf1-equivalent sweep corpus still joins
    * in when present so new fixture generations can draw from it. */
  private lazy val allTexts: Map[String, String] = {
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1") ++
      (if (new java.io.File("/root/repo/bigdata/documents.parquet").exists()) Seq("/root/repo/bigdata") else Nil)
    dirs
      .map(d => spark.read.parquet(s"$d/documents.parquet").where(col("lang") === "en").select("text"))
      .reduce(_ union _)
      .union(spark.read.parquet(s"$fixDir/ref_texts.parquet").select("text"))
      .distinct()
      .select(md5(col("text")).as("m"), col("text"))
      .as[(String, String)]
      .collect()
      .toMap
  }

  test("C3 LogisticSequenceScorer reproduces the trainer's kept set and quantized probabilities") {
    val fixture = spark.read
      .parquet(s"$fixDir/ref_c3_real.parquet")
      .as[(String, Long, Double)]
      .collect()
      .map { case (m, z, p) => m -> ((z, p)) }
      .toMap
    assert(fixture.nonEmpty)
    val scorer = new ModelClassifiers.LogisticSequenceScorer
    val sample = allTexts.toSeq.sortBy(_._1).take(600)
    var kept = 0
    sample.foreach { case (m, text) =>
      val p = scorer.scoreBatch(Seq(text)).head
      fixture.get(m) match {
        case Some((_, pr)) =>
          kept += 1
          assert(p >= 0.524, s"fixture-kept text scored below threshold: $p")
          assert(math.floor(p * 1e6 + 0.5) / 1e6 === pr, s"quantized prob mismatch for $m")
        case None =>
          assert(p < 0.524, s"fixture-dropped text scored $p >= threshold")
      }
    }
    // the learned decision boundary is non-degenerate on this sample
    assert(kept > 50 && kept < sample.size - 50, s"degenerate kept count $kept")
  }

  test("C4 SoftmaxTokenScorer reproduces the trainer's argmax labels, offsets and probabilities") {
    val fixture = spark.read
      .parquet(s"$fixDir/ref_c4_tokens.parquet")
      .as[(String, Long, Long, Double, Long, Long)]
      .collect()
      .groupBy(_._1)
      .map { case (m, rows) => m -> rows.sortBy(_._2).map(r => (r._3.toInt, r._4, r._5.toInt, r._6.toInt)) }
    assert(fixture.nonEmpty)
    val scorer = new ModelClassifiers.SoftmaxTokenScorer
    var checkedTexts = 0
    fixture.foreach { case (m, expected) =>
      allTexts.get(m).foreach { text =>
        checkedTexts += 1
        val (labels, probs, offs) = scorer.scoreBatch(Seq(text)).head
        // position 0 is the scorer's [CLS]-style special token, not in fixture
        assert(labels.length === expected.length + 1, s"token count mismatch for $m")
        expected.zipWithIndex.foreach { case ((lab, pr, s, e), i) =>
          assert(labels(i + 1) === lab, s"label mismatch at token $i of $m")
          assert(offs(i + 1) === ((s, e)), s"offset mismatch at token $i of $m")
          assert(math.abs(math.floor(probs(i + 1) * 1e6 + 0.5) / 1e6 - pr) < 1e-9,
            s"prob mismatch at token $i of $m: ${probs(i + 1)} vs $pr")
        }
      }
    }
    assert(checkedTexts >= 30, s"only $checkedTexts fixture texts found in corpus")
  }

  test("BioSpans reconstruction over real-scorer output: structural invariants hold") {
    val scorer = new ModelClassifiers.SoftmaxTokenScorer
    val texts = allTexts.toSeq.sortBy(_._1).take(300).map(_._2)
    var totalSpans = 0
    texts.foreach { text =>
      val (labels, probs, offs) = scorer.scoreBatch(Seq(text)).head
      val spans = BioSpans.reconstruct(labels, probs, offs)
      totalSpans += spans.size
      val bStarts = offs.indices.filter(i => labels(i) == BioSpans.BLabel).map(offs(_)._1).toSet
      spans.foreach { sp =>
        assert(sp.end - sp.start >= 2, "min-span-chars filter violated")
        assert(bStarts.contains(sp.start), s"span at ${sp.start} does not start at a B token")
        assert(sp.probability > 0.0 && sp.probability <= 1.0)
        // span ends on some token boundary
        assert(offs.exists(_._2 == sp.end), s"span end ${sp.end} is not a token end")
      }
      // mean-probability invariant on single-token spans: prob == token prob
      spans.filter(sp => offs.exists(o => o == ((sp.start, sp.end)))).foreach { sp =>
        val i = offs.indexOf((sp.start, sp.end))
        if (labels(i) == BioSpans.BLabel &&
          (i + 1 >= labels.length || labels(i + 1) != BioSpans.ILabel))
          assert(math.abs(sp.probability - probs(i)) < 1e-12)
      }
    }
    assert(totalSpans > 100, s"real model produced too few spans: $totalSpans")
  }

  test("C3 driver row shape: predictSequence with real weights emits whole-text spans") {
    val passages = spark.read
      .parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("doc_id").cast("long").as("passage_id"), col("text"))
    val out = ModelClassifiers
      .predictSequence(spark, passages, new ModelClassifiers.LogisticSequenceScorer, "Q1651")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("start") === 0)
      assert(r.getAs[Double]("probability") >= 0.524)
      assert(r.getAs[String]("concept_id") === "Q1651")
    }
  }
}
