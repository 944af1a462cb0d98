package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Fuzzy, SpanXml}

/** Differential tests for the LLM-emission string algorithms against the
  * reference implementation and Python difflib (xml_vectors.json, generated
  * by running span.py / difflib directly). */
class XmlFuzzySpec extends AnyFunSuite {

  private val root =
    new ObjectMapper().readTree(getClass.getResourceAsStream("/xml_vectors.json"))

  test("Fuzzy.ratio matches difflib.SequenceMatcher.ratio (incl. autojunk territory)") {
    root.get("ratio").asScala.foreach { c =>
      val got = Fuzzy.ratio(c.get("a").asText(), c.get("b").asText())
      val want = c.get("ratio").asDouble()
      assert(math.abs(got - want) < 1e-12, s"a=<${c.get("a").asText().take(40)}…>")
    }
  }

  test("SpanXml.fromXml matches reference Span.from_xml (incl. mutated-input alignment)") {
    root.get("xml").asScala.foreach { c =>
      val xml = c.get("xml").asText()
      val input = Option(c.get("input_text")).filterNot(_.isNull).map(_.asText())
      if (!c.get("valid").asBoolean()) {
        assertThrows[SpanXml.SpanXmlFormatError](SpanXml.fromXml(xml, "Q42", Vector("llm"), input))
      } else if (Option(c.get("raises")).exists(_.asBoolean())) {
        // the reference raises span validation errors on these inputs
        assertThrows[Exception](SpanXml.fromXml(xml, "Q42", Vector("llm"), input))
      } else {
        val got = SpanXml.fromXml(xml, "Q42", Vector("llm"), input)
        val want = c.get("expected").asScala.toVector.map(e => (e.get(0).asInt(), e.get(1).asInt()))
        assert(got.map(s => (s.start, s.end)) == want, s"xml=<$xml>")
      }
    }
  }

  test("findSpanTextInInputText matches reference find_span_text_in_input_text") {
    root.get("fuzzy").asScala.foreach { c =>
      val got = Fuzzy.findSpanTextInInputText(
        c.get("input").asText(),
        c.get("span").asText(),
        c.get("start").asInt()
      )
      val want = Option(c.get("found"))
        .filterNot(_.isNull)
        .map(f => (f.get(0).asInt(), f.get(1).asInt()))
      assert(got == want, s"input=<${c.get("input").asText()}> span=<${c.get("span").asText()}>")
    }
  }
}
