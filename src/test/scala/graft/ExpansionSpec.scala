package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Concept
import graft.extract.{KeywordExpansion, KeywordMatcher}

/** C7 KeywordExpansionClassifier fit-time semantics
  * (keyword_expansion.py:79-121): JSON parse, set-union with existing
  * labels, rebuild as C1, fallback-to-original on any parse failure. */
class ExpansionSpec extends AnyFunSuite {

  private val horse = Concept.normalized("Q77", "horse", Seq("equine"))

  test("valid response: expanded labels match, existing labels survive the union") {
    val resp = """{"positive_keywords": ["pony", "mare", "horse"], "negative_keywords": ["clothes horse"]}"""
    val expanded = KeywordExpansion.expand(horse, resp)
    assert(expanded.alternativeLabels.toSet == Set("equine", "mare", "pony")) // 'horse' stays preferred only
    assert(expanded.negativeLabels == Vector("clothes horse"))
    val m = new KeywordMatcher(expanded)
    assert(m.findSpans("a pony and an equine").map(_.start) == Vector(2, 14))
    // the expansion's negative keyword suppresses overlapped positives
    assert(m.findSpans("the clothes horse dries").isEmpty)
    assert(new KeywordMatcher(horse).findSpans("a pony").isEmpty, "original must not match pony")
  }

  test("malformed JSON and missing keys fall back to the original concept") {
    assert(KeywordExpansion.expand(horse, "not json at all {") == horse)
    assert(KeywordExpansion.expand(horse, """{"positive_keywords": ["pony"]}""") == horse)
    assert(KeywordExpansion.expand(horse, """{"positive_keywords": "pony", "negative_keywords": []}""") == horse)
  }

  test("a term in both lists stays negative: it never emits, matching the reference's dead-positive") {
    val resp = """{"positive_keywords": ["pony"], "negative_keywords": ["pony"]}"""
    val expanded = KeywordExpansion.expand(horse, resp)
    assert(expanded.negativeLabels.contains("pony") && !expanded.alternativeLabels.contains("pony"))
    // the reference would keep pony as BOTH positive and negative; its
    // overlap filter kills every pony span — net behavior: no match
    assert(new KeywordMatcher(expanded).findSpans("a pony runs").isEmpty)
  }

  test("expanded classifier == a fresh C1 over the hand-expanded concept") {
    val resp = """{"positive_keywords": ["stallion", "mare"], "negative_keywords": []}"""
    val viaExpansion = KeywordExpansion.expandedMatcher(horse, resp)
    val byHand = new KeywordMatcher(
      Concept.normalized("Q77", "horse", Seq("equine", "stallion", "mare")))
    val texts = Seq("the stallion and the mare", "a horse of course", "equine matters", "nothing here")
    texts.foreach { t =>
      assert(viaExpansion.findSpans(t) == byHand.findSpans(t), t)
    }
  }
}
