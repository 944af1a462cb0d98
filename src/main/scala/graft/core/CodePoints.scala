package graft.core

/** UTF-16 <-> codepoint index conversion. Python string indices count
  * CODEPOINTS; Java strings count UTF-16 units. All matching runs in UTF-16
  * internally; span indices are converted to codepoint space at the public
  * API boundary so offsets (and the deterministic span ids derived from
  * them) are byte-identical to the reference on supplementary-plane text.
  * The conversion is a no-op (fast path) unless the text contains
  * surrogate pairs. */
object CodePoints {
  def hasSupplementary(text: String): Boolean = {
    var i = 0
    while (i < text.length) {
      if (Character.isHighSurrogate(text.charAt(i))) return true
      i += 1
    }
    false
  }

  /** Convert UTF-16-indexed spans to codepoint-indexed spans. */
  def toCodePointSpans(text: String, spans: Vector[TextSpan]): Vector[TextSpan] =
    if (spans.isEmpty || !hasSupplementary(text)) spans
    else
      spans.map(s =>
        s.copy(start = text.codePointCount(0, s.start), end = text.codePointCount(0, s.end))
      )
}
