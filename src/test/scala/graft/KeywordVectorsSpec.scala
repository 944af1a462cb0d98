package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Concept
import graft.extract.{Gazetteer, KeywordMatcher}

/** Differential tests against the ACTUAL reference KeywordClassifier:
  * src/test/resources/keyword_vectors.json was produced by running
  * /root/reference/knowledge_graph/classifier/keyword.py (via
  * tools/ref_oracle.py) over 16 concepts × 172 texts covering case
  * sensitivity, unicode labels, separator variants, negative labels, word
  * boundaries and overlap merging. Expected values include the reference's
  * deterministic span ids, so this also locks Identifier8 to the real
  * pydantic implementation.
  */
class KeywordVectorsSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private case class Case(
      concept: Concept,
      texts: Vector[String],
      expected: Vector[Vector[(Int, Int, String)]]
  )

  private def loadCases(resource: String): Vector[Case] =
    mapper.readTree(getClass.getResourceAsStream(resource)).asScala.toVector.map { c =>
      def strs(field: String): Vector[String] =
        Option(c.get(field)).map(_.asScala.toVector.map(_.asText())).getOrElse(Vector.empty)
      Case(
        concept = Concept.normalized(
          wikibaseId = c.get("wikibase_id").asText(),
          preferredLabel = c.get("preferred_label").asText(),
          alternativeLabels = strs("alternative_labels"),
          negativeLabels = strs("negative_labels")
        ),
        texts = strs("texts"),
        expected = c.get("expected").asScala.toVector.map { spans =>
          spans.asScala.toVector.map(s => (s.get("start").asInt(), s.get("end").asInt(), s.get("id").asText()))
        }
      )
    }

  private val cases: Vector[Case] = loadCases("/keyword_vectors.json")
  private val fuzzCases: Vector[Case] = loadCases("/keyword_vectors_fuzz.json")

  test("vectors loaded") {
    assert(cases.length >= 10)
    assert(cases.map(_.texts.length).sum >= 100)
  }

  for ((c, ci) <- cases.zipWithIndex) {
    test(s"case $ci '${c.concept.preferredLabel}' matches reference spans and ids") {
      val m = new KeywordMatcher(c.concept)
      c.texts.lazyZip(c.expected).foreach { (text, want) =>
        val got = m.findSpans(text).map(s => (s.start, s.end, s.idFor(text)))
        assert(got == want, s"text=<$text>")
      }
    }
  }

  test("single-concept gazetteer emits identical spans to KeywordMatcher on all vectors") {
    cases.foreach { c =>
      val g = new Gazetteer(Vector(c.concept))
      val m = new KeywordMatcher(c.concept)
      c.texts.foreach { text =>
        assert(
          g.findAll(text)(0) == m.findSpans(text),
          s"concept=${c.concept.preferredLabel} text=<$text>"
        )
      }
    }
  }

  test("fuzz corpus: 60 random concepts x 10 texts match reference spans, ids, gazetteer and presence") {
    assert(fuzzCases.length >= 50)
    fuzzCases.foreach { c =>
      val m = new KeywordMatcher(c.concept)
      val g = new Gazetteer(Vector(c.concept))
      c.texts.lazyZip(c.expected).foreach { (text, want) =>
        val got = m.findSpans(text).map(s => (s.start, s.end, s.idFor(text)))
        assert(got == want, s"concept=${c.concept.preferredLabel} text=<$text>")
        assert(g.findAll(text)(0) == m.findSpans(text), s"gazetteer mismatch text=<$text>")
        assert(g.findPresent(text)(0) == m.findSpans(text).nonEmpty, s"presence mismatch text=<$text>")
      }
    }
  }

  test("fuzz corpus: combined 60-concept gazetteer == per-concept matchers") {
    val g = new Gazetteer(fuzzCases.map(_.concept))
    val matchers = fuzzCases.map(c => new KeywordMatcher(c.concept))
    fuzzCases.flatMap(_.texts).distinct.take(200).foreach { text =>
      val all = g.findAll(text)
      matchers.indices.foreach { i =>
        assert(all(i) == matchers(i).findSpans(text), s"concept=${fuzzCases(i).concept.preferredLabel} text=<$text>")
      }
    }
  }

  test("findPresent (presence fast path) == findAll nonEmpty on every vector text") {
    val concepts = cases.zipWithIndex.map { case (c, i) => c.concept.copy(wikibaseId = s"Q${900 + i}") }
    val g = new Gazetteer(concepts)
    cases.flatMap(_.texts).distinct.foreach { text =>
      val all = g.findAll(text).map(_.nonEmpty).toSeq
      val present = g.findPresent(text).toSeq
      assert(present == all, s"text=<$text>")
    }
  }

  test("combined multi-concept gazetteer == per-concept matchers on every vector text") {
    // distinct wikibase ids so concepts don't collide in one trie
    val concepts = cases.zipWithIndex.map { case (c, i) => c.concept.copy(wikibaseId = s"Q${900 + i}") }
    val g = new Gazetteer(concepts)
    val matchers = concepts.map(new KeywordMatcher(_))
    val texts = cases.flatMap(_.texts).distinct
    texts.foreach { text =>
      val all = g.findAll(text)
      concepts.indices.foreach { i =>
        assert(
          all(i) == matchers(i).findSpans(text),
          s"concept=${concepts(i).preferredLabel} text=<$text>"
        )
      }
    }
  }

  test("cs anchor prefilter is lossless: boundary-failing anchors, absent anchors, true matches") {
    import graft.core.Concept
    import graft.extract.{Gazetteer, KeywordMatcher}
    // labels chosen so the LONGEST word run ('Spark', 'GHG', 'NetZero') is a
    // real anchor; texts place the anchor inside larger words (prefilter
    // passes, regex must still reject on boundaries), omit it entirely
    // (prefilter must prove the miss), or present genuine matches
    val concepts = Vector(
      Concept.normalized("Q201", "motor", Seq("Spark Plug", "plug")),
      Concept.normalized("Q202", "emissions", Seq("GHG")),
      Concept.normalized("Q203", "target", Seq("NetZero-2050"))
    )
    val gaz = new Gazetteer(concepts)
    val matchers = concepts.map(new KeywordMatcher(_))
    val texts = Vector(
      "the Spark Plug fired",            // true cs match
      "sparkly Sparkling aSpark text",   // anchor inside larger words only
      "spark plug lowercase only",       // ci labels may fire, cs must not
      "GHGs and aGHG and GHG",           // boundary fails + one true match
      "no anchors anywhere here",        // prefilter proves the miss
      "NetZero 2050 and NetZero-2050",   // separator-flexible multi-part
      "NetZeroX-2050 almost"             // anchor present, boundary fails
    )
    texts.foreach { t =>
      val all = gaz.findAll(t)
      val present = gaz.findPresent(t)
      concepts.indices.foreach { i =>
        assert(all(i) == matchers(i).findSpans(t), s"spans diverged: '${t}' concept ${concepts(i).wikibaseId}")
        assert(present(i) == matchers(i).findSpans(t).nonEmpty, s"presence diverged: '${t}' ${concepts(i).wikibaseId}")
      }
    }
  }
}
