package graft.extract

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import graft.core.Concept

/** C7 KeywordExpansionClassifier — fit-time semantics of
  * /root/reference/knowledge_graph/classifier/keyword_expansion.py:79-121:
  * an LLM is asked for JSON {"positive_keywords": [...],
  * "negative_keywords": [...]}; the lists are set-unioned with the concept's
  * existing labels and the classifier is rebuilt over the expanded concept
  * (inference then delegates entirely to C1 — Gazetteer/KeywordMatcher). Any
  * parse failure falls back to the ORIGINAL concept (keyword_expansion.py:
  * 96-101).
  *
  * The LLM call itself is a pluggable response string (no egress in this
  * sandbox — the same posture as C5, where the LLM's XML output is parsed by
  * SpanXml): callers supply the model response, tests drive fixtures.
  * Matching behavior is invariant under duplicate labels, so
  * Concept.normalized's dedup preserves the reference's set() semantics. A
  * response term appearing in BOTH lists stays a NEGATIVE and is dropped
  * from the positives: the reference (whose model_copy skips validation)
  * would keep both, but its negative-overlap filter kills every match of
  * the identical positive, so the net matching behavior is the same — the
  * term never emits and still suppresses other overlapping positives. */
object KeywordExpansion {

  // ObjectMapper construction is heavyweight and the instance is
  // thread-safe for readTree; the C7 fit loop runs per concept
  private val mapper = new ObjectMapper()

  def expand(concept: Concept, llmResponse: String): Concept =
    try {
      val root = mapper.readTree(llmResponse)
      val posNode = root.get("positive_keywords")
      val negNode = root.get("negative_keywords")
      require(posNode != null && posNode.isArray && negNode != null && negNode.isArray)
      val pos = posNode.asScala.map(_.asText()).toVector
      val neg = negNode.asScala.map(_.asText()).toVector
      val negative = (neg ++ concept.negativeLabels).distinct
      val positive = (pos ++ concept.allLabels).distinct.filterNot(negative.contains)
      Concept.normalized(
        concept.wikibaseId,
        concept.preferredLabel,
        alternativeLabels = positive.filterNot(_ == concept.preferredLabel),
        negativeLabels = negative,
        description = concept.description,
        definition = concept.definition,
        subconceptOf = concept.subconceptOf,
        hasSubconcept = concept.hasSubconcept,
        relatedConcepts = concept.relatedConcepts
      )
    } catch {
      case _: Exception => concept // parse failure -> original concept
    }

  /** The expanded classifier: C1 over the expanded concept. */
  def expandedMatcher(concept: Concept, llmResponse: String): KeywordMatcher =
    new KeywordMatcher(expand(concept, llmResponse))
}
