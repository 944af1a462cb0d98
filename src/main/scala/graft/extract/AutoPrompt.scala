package graft.extract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.eval.ConfusionMatrix

/** C6: the AutoLLMClassifier prompt-optimization loop
  * (/root/reference/knowledge_graph/classifier/autollm.py:94-305) —
  * training-time orchestration that iteratively improves a prompt-driven
  * classifier against a labelled validation set.
  *
  * The loop is the reference's, faithfully: trial 0 evaluates the initial
  * prompt; each subsequent trial feeds the CURRENT prompt's incorrect
  * validation rows (or a head sample when everything is correct,
  * autollm.py:264-270) to the optimiser, builds a new prompt from the
  * proposed guidelines, and re-evaluates; the adopted prompt is the
  * f-beta argmax over all trials with ties to the EARLIEST trial
  * (python max semantics, autollm.py:192-199). The prompt chain advances
  * through the latest trial, not the best — also the reference's behavior.
  *
  * Both models are pluggable seams, same posture as C5/C7: the optimiser
  * LLM (`GuidelineProposer`) and the underlying prompt-driven classifier
  * (`PromptClassifier`) are INPUTS by design. `ErrorMiningProposer` /
  * `TermPromptClassifier` are deterministic stand-ins that make the loop
  * executable and oracle-checkable end-to-end: the proposer mines the
  * validation errors for the most discriminative tokens (add to the
  * include list what false negatives share, to the exclude list what
  * false positives share) — a real, improving optimization process with no
  * model runtime.
  *
  * Spark-first shape: each trial's evaluation is ONE distributed action —
  * the collect of the trial's incorrect validation rows, exactly what the
  * reference interpolates into the meta-prompt. The full confusion matrix
  * is derived from those rows plus two once-computed corpus invariants
  * (row count and gold-positive count), so no separate count-aggregate or
  * cached join is needed per trial.
  */
object AutoPrompt {

  /** A classifier prompt: fixed system template + evolving guidelines
    * (LLMClassifierPrompt, large_language_model.py). */
  final case class Prompt(systemTemplate: String, guidelines: String)

  /** The optimiser-LLM seam (autollm.py:250-305): sees the concept
    * description, the current guidelines and the rendered validation
    * results; returns new guidelines. */
  trait GuidelineProposer extends Serializable {
    def propose(conceptDescription: String, currentGuidelines: String, validationResults: String): String
  }

  /** The underlying prompt-driven classifier seam: passage-level positives
    * under a prompt. Output: (passage_id, predicted boolean). */
  trait PromptClassifier extends Serializable {
    def predict(spark: SparkSession, prompt: Prompt, passages: DataFrame): DataFrame
  }

  final case class Trial(index: Int, prompt: Prompt, cm: ConfusionMatrix, fBeta: Double)

  /** Run the optimization loop over `passages` (passage_id, text, gold).
    * Returns (best prompt, all trials — trial 0 is the initial prompt). */
  def fit(
      spark: SparkSession,
      passages: DataFrame,
      classifier: PromptClassifier,
      proposer: GuidelineProposer,
      initial: Prompt,
      conceptDescription: String,
      nTrials: Int = 3,
      beta: Double = 1.0
  ): (Prompt, Vector[Trial]) = {
    val labelled = passages.select("passage_id", "text", "gold").cache()
    // corpus invariants, computed once: with these, every trial's full
    // confusion matrix falls out of its collected INCORRECT rows alone
    // (fn/fp counted directly, tp = nGold - fn, tn = nTotal - nGold - fp),
    // so a trial is ONE distributed action instead of a count-aggregate
    // plus a separate error-render collect over a cached join
    val totalsRow = labelled
      .agg(count(lit(1)).as("n"), sum(when(col("gold"), 1L).otherwise(0L)).as("g"))
      .collect()(0)
    val nTotal = totalsRow.getLong(0)
    val nGold = totalsRow.getLong(1)

    def evaluate(index: Int, prompt: Prompt): (Trial, String) = {
      val pred = classifier.predict(spark, prompt, labelled)
      val joined = labelled
        .join(pred.select(col("passage_id"), col("predicted")), Seq("passage_id"))
      val incorrectRows = joined
        .where(col("gold") =!= col("predicted"))
        .orderBy("passage_id")
        .select(col("passage_id"), col("text"), col("gold"), col("predicted"))
        .collect()
      val fn = incorrectRows.count(_.getBoolean(2)).toLong
      val fp = incorrectRows.length - fn
      val cm = ConfusionMatrix(nGold - fn, fp, nTotal - nGold - fp, fn)
      // validation rendering (autollm.py:264-270): ALL incorrect rows, or a
      // 10-row head sample when the trial is fully correct (only that branch
      // pays a second action)
      val shownRows =
        if (incorrectRows.nonEmpty) incorrectRows
        else
          joined
            .orderBy("passage_id")
            .limit(10)
            .select(col("passage_id"), col("text"), col("gold"), col("predicted"))
            .collect()
      // same wire format concat_ws("\u0001", ...) produced: longs and
      // booleans render as their canonical decimal / true-false strings
      val rendered = shownRows
        .map(r => s"${r.get(0)}\u0001${r.getString(1)}\u0001${r.getBoolean(2)}\u0001${r.getBoolean(3)}")
        .mkString("\n")
      (Trial(index, prompt, cm, cm.fBeta(beta)), rendered)
    }

    var trials = Vector.empty[Trial]
    var (trial, rendered) = evaluate(0, initial)
    trials :+= trial
    var current = initial
    var i = 0
    while (i < nTrials) {
      val guidelines = proposer.propose(conceptDescription, current.guidelines, rendered)
      current = Prompt(current.systemTemplate, guidelines)
      val (t, r) = evaluate(i + 1, current)
      trials :+= t
      rendered = r
      i += 1
    }
    labelled.unpersist()
    val best = trials.maxBy(_.fBeta) // scala maxBy keeps the FIRST max, like python max
    (best.prompt, trials)
  }

  // ---- deterministic stand-ins (the LLM response is an input, by design) ---

  /** Guidelines encoding for the stub pair: "include: a,b; exclude: c,d". */
  def renderGuidelines(include: Seq[String], exclude: Seq[String]): String =
    s"include: ${include.mkString(",")}; exclude: ${exclude.mkString(",")}"

  def parseGuidelines(g: String): (Vector[String], Vector[String]) = {
    def part(p: String): Vector[String] = {
      val i = g.indexOf(p + ":")
      if (i < 0) Vector.empty
      else {
        val rest = g.substring(i + p.length + 1)
        val end = if (rest.indexOf(';') >= 0) rest.substring(0, rest.indexOf(';')) else rest
        end.split(",").map(_.trim).filter(_.nonEmpty).toVector
      }
    }
    (part("include"), part("exclude"))
  }

  /** Prompt-driven classifier stand-in: positive iff the passage's distinct
    * lowercase whitespace tokens hit the include list and miss the exclude
    * list. A pure column plan (no UDF): array_intersect against literal
    * term arrays. */
  final class TermPromptClassifier extends PromptClassifier {
    def predict(spark: SparkSession, prompt: Prompt, passages: DataFrame): DataFrame = {
      val (inc, exc) = parseGuidelines(prompt.guidelines)
      val toks = array_distinct(split(lower(col("text")), " "))
      val hit =
        if (inc.isEmpty) lit(false)
        else size(array_intersect(toks, typedLit(inc))) > 0
      val blocked =
        if (exc.isEmpty) lit(false)
        else size(array_intersect(toks, typedLit(exc))) > 0
      passages.select(col("passage_id"), (hit && !blocked).as("predicted"))
    }
  }

  /** Optimiser stand-in: mines the rendered validation errors for the most
    * discriminative tokens. Score(tok) = (#false-negative passages whose
    * distinct tokens contain tok) − (#false-positive passages containing
    * tok); the top token by (score desc, token asc) with score >= 1 and not
    * already in the guidelines joins the include list — and symmetrically
    * (FP − FN) for the exclude list. When the trial was fully correct (the
    * rendering carries no incorrect rows) the guidelines are returned
    * unchanged. */
  final class ErrorMiningProposer extends GuidelineProposer {
    def propose(conceptDescription: String, currentGuidelines: String, validationResults: String): String = {
      val (inc, exc) = parseGuidelines(currentGuidelines)
      val known = (inc ++ exc).toSet
      val rows = validationResults.split("\n").filter(_.nonEmpty).map { line =>
        val f = line.split("\u0001", -1)
        (f(1), f(2).toBoolean, f(3).toBoolean)
      }
      val errors = rows.filter { case (_, gold, pred) => gold != pred }
      if (errors.isEmpty) return currentGuidelines
      val fnDocs = errors.collect { case (text, true, false) => text }
      val fpDocs = errors.collect { case (text, false, true) => text }
      def df(docs: Array[String]): Map[String, Int] =
        docs.flatMap(_.toLowerCase.split(" ").distinct).groupBy(identity).view.mapValues(_.length).toMap
      val fnDf = df(fnDocs)
      val fpDf = df(fpDocs)
      def top(pos: Map[String, Int], neg: Map[String, Int]): Option[String] = {
        val scored = (pos.keySet ++ neg.keySet).iterator
          .filterNot(known)
          .filter(_.nonEmpty)
          .map(t => (t, pos.getOrElse(t, 0) - neg.getOrElse(t, 0)))
          .filter(_._2 >= 1)
          .toVector
        if (scored.isEmpty) None
        else Some(scored.minBy { case (t, s) => (-s, t) }._1)
      }
      val newInc = inc ++ (if (fnDocs.nonEmpty) top(fnDf, fpDf) else None)
      val newExc = exc ++ (if (fpDocs.nonEmpty) top(fpDf, fnDf) else None)
      renderGuidelines(newInc, newExc)
    }
  }
}
