package graft.core

/** Parsing `<concept>`-annotated text into spans — the reference's
  * LLM-classifier emission path (/root/reference/knowledge_graph/span.py:247-384).
  * Pure string algorithms (no LLM involved): validate tag structure, strip
  * tags, offset-correct each tagged group, and — when the annotator mutated
  * the text — align each span back to the original input with exact-then-
  * fuzzy window search (Fuzzy.findSpanTextInInputText).
  */
object SpanXml {

  final case class SpanXmlFormatError(xml: String)
      extends Exception(s"Span XML has incorrectly annotated concepts.\nXML:\t$xml\n")

  private val TagRe = "</?concept>".r
  // NO DOTALL: the reference's re.finditer(r"<concept>(.*?)</concept>") does
  // not set re.S, so a concept group cannot span a newline — tags separated
  // by \n simply don't pair up
  private val GroupRe = "<concept>(.*?)</concept>".r

  /** span.py:247-270 — tags must alternate, start tag first, equal counts. */
  def validate(xml: String): Unit = {
    val tags = TagRe.findAllIn(xml).toVector
    if (tags.isEmpty) return
    val wellFormed = tags.head == "<concept>" &&
      tags.toSet.size == 2 &&
      tags.lazyZip(tags.tail).forall(_ != _)
    if (!wellFormed) throw SpanXmlFormatError(xml)
  }

  /** span.py:272-326. Returns spans positioned in the tag-stripped text, or
    * aligned into `inputText` when provided and different. */
  def fromXml(
      xml: String,
      conceptId: String,
      labellers: Vector[String],
      inputText: Option[String] = None
  ): Vector[TextSpan] = {
    validate(xml)
    val withoutTags = xml.replace("<concept>", "").replace("</concept>", "")
    if (withoutTags == xml) return Vector.empty

    inputText match {
      case Some(input) if input != withoutTags =>
        fromXmlWithAlignment(xml, conceptId, labellers, input)
      case _ =>
        val tagPairLen = "<concept></concept>".length
        GroupRe.findAllMatchIn(xml).toVector.zipWithIndex.map { case (m, offset) =>
          val start = m.start - offset * tagPairLen
          // the reference's Span model rejects empty spans and spans past the
          // text end (span.py:93-104) — e.g. a tag pair broken by a newline
          // throws there too (the offset math overruns the stripped text)
          require(m.group(1).nonEmpty, s"The end index must be greater than the start index (empty concept group in: $xml)")
          require(
            start >= 0 && start + m.group(1).length <= withoutTags.length,
            s"The end index must be less than or equal to the length of the text (in: $xml)"
          )
          TextSpan(start, start + m.group(1).length, conceptId, labellers)
        }
    }
  }

  /** span.py:328-384 — align spans from a mutated annotation back into the
    * original input text; unalignable spans are dropped (the reference logs
    * a warning). */
  private def fromXmlWithAlignment(
      xml: String,
      conceptId: String,
      labellers: Vector[String],
      inputText: String
  ): Vector[TextSpan] = {
    val tagPairLen = "<concept></concept>".length
    GroupRe.findAllMatchIn(xml).toVector.zipWithIndex.flatMap { case (m, offset) =>
      val expectedStart = m.start - offset * tagPairLen
      Fuzzy
        .findSpanTextInInputText(inputText, m.group(1), expectedStart)
        .map { case (s, e) =>
          // reference Span validation (span.py:93-104): start >= 0, end > start
          require(s >= 0 && e > s, s"The end index must be greater than the start index (span ($s,$e) in: $xml)")
          TextSpan(s, e, conceptId, labellers)
        }
    }
  }
}
