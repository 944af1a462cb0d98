package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.extract.AutoPrompt
import graft.extract.AutoPrompt.{ErrorMiningProposer, Prompt, TermPromptClassifier}

/** C6: the AutoLLM prompt-optimization loop — the distributed engine run is
  * checked against an independent LOCAL implementation of the same trial
  * semantics (evaluate → mine errors → re-evaluate → argmax, ties earliest),
  * and the loop must genuinely recover a hidden labelling rule. */
class AutoPromptSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // hidden gold rule the optimiser has to discover: (window OR stream) AND NOT vector
  private def goldOf(text: String): Boolean = {
    val t = text.toLowerCase.split(" ").distinct.toSet
    (t("window") || t("stream")) && !t("vector")
  }

  private lazy val corpus: Seq[(Long, String)] = spark.read
    .parquet(s"${TestSpark.sf0001}/documents.parquet")
    .where(col("lang") === "en")
    .select(col("doc_id"), col("text"))
    .as[(Long, String)]
    .collect()
    .toSeq
    .sortBy(_._1)

  /** Pure-local twin of the loop (no Spark): same classifier, proposer and
    * trial chaining. */
  private def localLoop(nTrials: Int): (String, Vector[(Long, Long, Long, Long)]) = {
    val proposer = new ErrorMiningProposer
    def predict(guidelines: String, text: String): Boolean = {
      val (inc, exc) = AutoPrompt.parseGuidelines(guidelines)
      val toks = text.toLowerCase.split(" ").distinct.toSet
      inc.exists(toks) && !exc.exists(toks)
    }
    def evaluate(g: String): ((Long, Long, Long, Long), String) = {
      val rows = corpus.map { case (id, text) => (id, text, goldOf(text), predict(g, text)) }
      val tp = rows.count(r => r._3 && r._4).toLong
      val fp = rows.count(r => !r._3 && r._4).toLong
      val tn = rows.count(r => !r._3 && !r._4).toLong
      val fn = rows.count(r => r._3 && !r._4).toLong
      val incorrect = rows.filter(r => r._3 != r._4)
      val shown = if (incorrect.nonEmpty) incorrect else rows.take(10)
      val rendered = shown.map(r => s"${r._1}${r._2}${r._3}${r._4}").mkString("\n")
      ((tp, fp, tn, fn), rendered)
    }
    var g = AutoPrompt.renderGuidelines(Seq("window"), Nil)
    var (cm0, rendered) = evaluate(g)
    var cms = Vector(cm0)
    (0 until nTrials).foreach { _ =>
      g = proposer.propose("desc", g, rendered)
      val (cm, r) = evaluate(g)
      cms :+= cm
      rendered = r
    }
    (g, cms)
  }

  test("distributed loop matches the local twin trial-for-trial and recovers the hidden rule") {
    val passages = corpus
      .map { case (id, text) => (id, text, goldOf(text)) }
      .toDF("passage_id", "text", "gold")
    val (best, trials) = AutoPrompt.fit(
      spark, passages, new TermPromptClassifier, new ErrorMiningProposer,
      Prompt("sys", AutoPrompt.renderGuidelines(Seq("window"), Nil)), "desc", nTrials = 2)

    val (localFinal, localCms) = localLoop(2)
    assert(trials.size === 3)
    trials.zip(localCms).foreach { case (t, (tp, fp, tn, fn)) =>
      assert((t.cm.tp, t.cm.fp, t.cm.tn, t.cm.fn) === ((tp, fp, tn, fn)), s"trial ${t.index}")
    }
    // the loop genuinely improved: trial 0 had errors, the best trial is
    // strictly better, and the final guidelines chain equals the local twin's
    assert(trials.head.cm.fp + trials.head.cm.fn > 0, "trial 0 must be imperfect for the test to bite")
    assert(trials.map(_.fBeta).max > trials.head.fBeta)
    assert(trials.last.prompt.guidelines === localFinal)
    // the hidden rule's terms were discovered
    val (inc, exc) = AutoPrompt.parseGuidelines(best.guidelines)
    assert(inc.contains("window"))
    assert(inc.contains("stream") || exc.contains("vector"),
      s"expected a discovered term, got include=$inc exclude=$exc")
  }

  test("fully-correct trials leave guidelines unchanged (head-sample branch)") {
    val proposer = new ErrorMiningProposer
    val g = AutoPrompt.renderGuidelines(Seq("a"), Seq("b"))
    val rendered = Seq("1some texttruetrue", "2more textfalsefalse").mkString("\n")
    assert(proposer.propose("d", g, rendered) === g)
  }
}
