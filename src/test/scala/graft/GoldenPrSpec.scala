package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Concept
import graft.eval.{LabelledPassages, Metrics}
import graft.extract.KeywordMatcher

/** The north-rule correctness gate: our matcher must reproduce the
  * reference's emitted concept mentions on ITS OWN golden labelled-passage
  * fixtures at P/R >= 0.95 (span-level, jaccard threshold 0.9 — the
  * reference's default, knowledge_graph/metrics.py:102).
  *
  * The goldens (JSON files under
  * /root/reference/tests/flows/fixtures/labelled_passages/Qxx/clf/)
  * carry spans but not the concept label lists, so each concept is
  * reconstructed from its golden surfaces (plus the preferred label parsed
  * from the labeller string); ASCII surfaces containing uppercase also
  * contribute their lowercase form, since the reference's case-insensitive
  * labels match any casing. The same reconstruction strategy was validated
  * against the real Python classifier (tools/golden prototype): P=R=1.0.
  */
class GoldenPrSpec extends AnyFunSuite {

  private val base = Paths.get("/root/reference/tests/flows/fixtures/labelled_passages")
  private val LabellerRe = """KeywordClassifier\("(.+)"\)""".r

  private def conceptDirs: Seq[(String, Path)] =
    if (!Files.isDirectory(base)) Seq.empty
    else
      Files.list(base).iterator.asScala.toSeq.flatMap { qdir =>
        Files.list(qdir).iterator.asScala.toSeq.map(c => (qdir.getFileName.toString, c))
      }

  test("span-level P/R >= 0.95 vs reference goldens for every concept fixture") {
    assume(Files.isDirectory(base), "reference fixtures not present")
    var evaluated = 0
    conceptDirs.foreach { case (qid, clfDir) =>
      val passages = Files
        .list(clfDir)
        .iterator
        .asScala
        .toVector
        .filterNot(p => new String(Files.readAllBytes(p), "UTF-8").startsWith("version https://git-lfs"))
        .flatMap(LabelledPassages.parseFile)

      val goldSpans = passages.map(_.spans.filter(_.conceptId == qid))
      val surfaces = passages
        .flatMap(p => p.spans.filter(_.conceptId == qid).map(_.labelledTextIn(p.text)))
        .distinct
      if (surfaces.nonEmpty) {
        val preferred = passages
          .flatMap(_.spans.flatMap(_.labellers))
          .collectFirst { case LabellerRe(l) => l }
          .getOrElse(surfaces.min)
        val lowered = surfaces.filter(s => s.forall(_ < 128) && s.exists(_.isUpper)).map(_.toLowerCase)
        val labels = (surfaces ++ lowered).distinct
        val concept = Concept.normalized(
          wikibaseId = qid,
          preferredLabel = preferred,
          alternativeLabels = labels.filterNot(_ == preferred)
        )
        val matcher = new KeywordMatcher(concept)
        val predicted = passages.map(p => matcher.findSpans(p.text))
        // the reference evaluates at jaccard thresholds {0, .5, .9, .99}
        // (operations/evaluate.py:142) plus passage level
        Seq(0.0, 0.5, 0.9, 0.99).foreach { t =>
          val cm = Metrics.countSpanLevel(goldSpans, predicted, threshold = t)
          assert(
            cm.precision >= 0.95 && cm.recall >= 0.95,
            s"$qid/${clfDir.getFileName} @jaccard>$t: P=${cm.precision} R=${cm.recall} ($cm)"
          )
        }
        val passageCm = Metrics.countPassageLevel(
          passages.indices.map(i => i.toString -> goldSpans(i)).toMap,
          passages.indices.map(i => i.toString -> predicted(i)).toMap
        )
        assert(
          passageCm.precision >= 0.95 && passageCm.recall >= 0.95,
          s"$qid/${clfDir.getFileName} passage-level: $passageCm"
        )
        val cm09 = Metrics.countSpanLevel(goldSpans, predicted, threshold = 0.9)
        evaluated += 1
        info(f"$qid/${clfDir.getFileName}: P=${cm09.precision}%.3f R=${cm09.recall}%.3f tp=${cm09.tp} over ${passages.length} passages (all 4 thresholds + passage level >= 0.95)")
      }
    }
    // EVERY golden concept fixture family the reference ships is covered:
    // Q123/g29kcna9, Q1286/7bt99yeu, Q218/6z4pufsm, Q218/q4xsgmjb,
    // Q223/36bhx4mu, Q767/mgwutbqx, Q857/sd6wjpa2 — 7 evaluable families
    // (the eighth, Q218/bavawka9, is a git-lfs stub with no content in the
    // checkout). The exact count is asserted so a silently-skipped family
    // (parse failure, empty surface reconstruction) fails the gate rather
    // than shrinking the evidence.
    assert(evaluated == 7, s"expected all 7 non-lfs golden concept fixture families, got $evaluated")
  }

  test("golden span ids reproduce via Identifier8") {
    assume(Files.isDirectory(base), "reference fixtures not present")
    val f = base.resolve("Q123/g29kcna9/CCLW.executive.10061.4515.json")
    assume(Files.exists(f))
    val passages = LabelledPassages.parseFile(f)
    // re-derive each golden span's deterministic id and compare with the file
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(new String(Files.readAllBytes(f), "UTF-8"))
    var checked = 0
    root.forEach { el =>
      val node = if (el.isTextual) mapper.readTree(el.asText()) else el
      val text = node.get("text").asText()
      val spans = node.get("spans")
      if (spans != null) spans.forEach { s =>
        val id = Option(s.get("id")).map(_.asText()).orNull
        if (id != null) {
          val got = graft.core.Identifier8.spanId(
            text,
            s.get("start_index").asInt(),
            s.get("end_index").asInt(),
            Option(s.get("concept_id")).filterNot(_.isNull).map(_.asText()).orNull
          )
          assert(got == id, s"span id mismatch in ${f.getFileName}")
          checked += 1
        }
      }
    }
    assert(checked > 0)
  }
}
