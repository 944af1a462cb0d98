package graft.core

/** A concept from the knowledge-graph concept store — the small broadcast
  * dimension of the whole engine.
  *
  * Field semantics follow /root/reference/knowledge_graph/concept.py:23-190.
  * The pydantic load-time validators become `Concept.normalized`:
  *  - labels stripped of surrounding whitespace (concept.py:142-149)
  *  - alternative labels deduped + sorted, preferred label removed
  *    (concept.py:95-109)
  *  - negative labels deduped (concept.py:111-123) and disallowed from also
  *    being alternative labels (concept.py:125-140)
  */
final case class Concept(
    wikibaseId: String,
    preferredLabel: String,
    alternativeLabels: Vector[String] = Vector.empty,
    negativeLabels: Vector[String] = Vector.empty,
    description: Option[String] = None,
    definition: Option[String] = None,
    subconceptOf: Vector[String] = Vector.empty,
    hasSubconcept: Vector[String] = Vector.empty,
    relatedConcepts: Vector[String] = Vector.empty
) {

  /** preferred + alternatives. The reference returns these in arbitrary set
    * order (concept.py:187-190); downstream the keyword classifier re-sorts
    * by length so match OUTPUT is order-independent — we fix a deterministic
    * order (preferred first, alternatives pre-sorted) for reproducible plans.
    */
  def allLabels: Vector[String] = preferredLabel +: alternativeLabels

  /** Deterministic concept id (concept.py:159-170). */
  def id: String = Identifier8.generate(
    (wikibaseId +: preferredLabel +: description.getOrElse("None")
      +: definition.getOrElse("None")
      +: (alternativeLabels.sorted ++ negativeLabels.sorted)): _*
  )

  /** VespaConcept parent fields (/root/reference/flows/aggregate.py:614-632):
    * comma-joined parent ids WITH a trailing comma. */
  def parentConceptIdsFlat: String =
    if (subconceptOf.isEmpty) "," else subconceptOf.mkString(",") + ","
}

object Concept {
  def normalized(
      wikibaseId: String,
      preferredLabel: String,
      alternativeLabels: Seq[String] = Nil,
      negativeLabels: Seq[String] = Nil,
      description: Option[String] = None,
      definition: Option[String] = None,
      subconceptOf: Seq[String] = Nil,
      hasSubconcept: Seq[String] = Nil,
      relatedConcepts: Seq[String] = Nil
  ): Concept = {
    val preferred = preferredLabel.trim
    require(preferred.nonEmpty, "preferred_label must be non-empty")
    val alts = alternativeLabels.map(_.trim).distinct.sorted.filterNot(_ == preferred).toVector
    val negs = negativeLabels.map(_.trim).distinct.toVector
    val overlap = negs.toSet.intersect(alts.toSet)
    require(
      overlap.isEmpty,
      s"$wikibaseId ($preferred): a negative label should not also be a positive label: $overlap"
    )
    Concept(
      wikibaseId = wikibaseId,
      preferredLabel = preferred,
      alternativeLabels = alts,
      negativeLabels = negs,
      description = description,
      definition = definition,
      subconceptOf = subconceptOf.toVector,
      hasSubconcept = hasSubconcept.toVector,
      relatedConcepts = relatedConcepts.toVector
    )
  }
}

/** WikibaseID helpers (/root/reference/knowledge_graph/identifiers.py:13-67):
  * pattern ^Q[1-9][0-9]*$, ordered numerically. */
object WikibaseId {
  private val Pattern = "^Q[1-9][0-9]*$".r
  def isValid(id: String): Boolean = Pattern.pattern.matcher(id).matches()
  def numeric(id: String): Long = id.substring(1).toLong
}
