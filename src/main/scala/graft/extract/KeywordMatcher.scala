package graft.extract

import java.util.regex.Pattern

import graft.core.{Concept, SpanAlgebra, TextSpan}

/** Single-concept keyword matcher — the engine's re-implementation of the
  * reference's default classifier
  * (/root/reference/knowledge_graph/classifier/keyword.py:13-279), whose
  * behavior drives all the labelled-passage goldens.
  *
  * Semantics reproduced exactly:
  *  - labels split into case-sensitive (any uppercase OR any non-ASCII char)
  *    vs case-insensitive (pure ASCII lowercase) sets, each sorted by length
  *    descending so longer keywords win (keyword.py:127-150)
  *  - each label becomes a separator-flexible regex: split on [\s\-–—]+,
  *    escape parts, re-join with [\s\-–—]+ (keyword.py:79-103)
  *  - one alternation per set, wrapped in custom word boundaries
  *    (?<!\w)(?:...)(?!\w), IGNORECASE on the insensitive set
  *    (keyword.py:105-125)
  *  - positives matched (case-sensitive first, then insensitive), empty
  *    matches dropped, overlapping positives merged by greedy group + union
  *    (keyword.py:248-258)
  *  - negatives matched and merged the same way; positives overlapping any
  *    negative are dropped (keyword.py:260-277)
  *
  * Regex dialect: Python's \w / \s / IGNORECASE are Unicode-aware, so Java
  * patterns are compiled with UNICODE_CHARACTER_CLASS (+ UNICODE_CASE for the
  * insensitive set). Known residual divergence (documented, irrelevant to the
  * goldens): Python treats numeric category No (e.g. U+2082 subscript two) as
  * \w; Java's \p{Digit} covers Nd only.
  *
  * The class is Serializable with @transient lazy compiled patterns: tasks
  * ship only the pattern STRINGS, each executor compiles once and reuses
  * across its whole partition (the Spark analog of the reference compiling
  * its regexes once per classifier container, keyword.py:174-190).
  */
final class KeywordMatcher(val concept: Concept) extends Serializable {
  import KeywordMatcher._

  /** 'KeywordClassifier("label")' — classifier.py:201-208. */
  val labeller: String = "KeywordClassifier(\"" + concept.preferredLabel + "\")"

  private val (csPositive, ciPositive) = splitByCaseHandling(concept.allLabels)
  private val (csNegative, ciNegative) = splitByCaseHandling(concept.negativeLabels)

  private val csPositiveRegex = alternation(csPositive)
  private val ciPositiveRegex = alternation(ciPositive)
  private val csNegativeRegex = alternation(csNegative)
  private val ciNegativeRegex = alternation(ciNegative)

  @transient private lazy val csPositivePattern = compile(csPositiveRegex, caseSensitive = true)
  @transient private lazy val ciPositivePattern = compile(ciPositiveRegex, caseSensitive = false)
  @transient private lazy val csNegativePattern = compile(csNegativeRegex, caseSensitive = true)
  @transient private lazy val ciNegativePattern = compile(ciNegativeRegex, caseSensitive = false)

  private def matchSpans(text: String, pattern: Pattern): Vector[TextSpan] = {
    if (pattern == null) return Vector.empty
    val m = pattern.matcher(text)
    val out = Vector.newBuilder[TextSpan]
    while (m.find()) {
      if (m.start() != m.end() && KeywordMatcher.codepointBoundariesOk(text, m.start(), m.end()))
        out += TextSpan(m.start(), m.end(), concept.wikibaseId, Vector(labeller))
    }
    out.result()
  }

  /** Full predict semantics (keyword.py:224-279), UTF-16 indices. */
  private[extract] def findSpansRaw(text: String): Vector[TextSpan] = {
    val positives =
      matchSpans(text, csPositivePattern) ++ matchSpans(text, ciPositivePattern)
    if (positives.isEmpty) return Vector.empty
    val merged = SpanAlgebra.mergeOverlapping(positives)
    val negatives =
      matchSpans(text, csNegativePattern) ++ matchSpans(text, ciNegativePattern)
    if (negatives.isEmpty) merged
    else {
      val mergedNeg = SpanAlgebra.mergeOverlapping(negatives)
      merged.filterNot(p => mergedNeg.exists(n => SpanAlgebra.overlaps(p, n)))
    }
  }

  /** Full predict semantics with PYTHON (codepoint) indices — identical to
    * UTF-16 unless the text contains supplementary-plane chars. */
  def findSpans(text: String): Vector[TextSpan] =
    graft.core.CodePoints.toCodePointSpans(text, findSpansRaw(text))
}

object KeywordMatcher {
  /** The separator class with PYTHON \s semantics (keyword.py:52-57):
    * python's \s = Unicode White_Space PLUS the U+001C-001F separators
    * (str.isspace), which java's unicode \s excludes — hence the explicit
    * range. \x{..} escapes parse in both java.util.regex and RE2 (the
    * DuckDB oracle reuses these pattern strings). */
  val separatorClass: String = "[\\s\\x{1c}-\\x{1f}\\-–—]+"
  private val separatorSplitter =
    Pattern.compile(separatorClass, Pattern.UNICODE_CHARACTER_CLASS)

  /** keyword.py:79-103 — label -> separator-flexible regex string. */
  def separatorFlexible(label: String): String = {
    val parts = separatorSplitter.split(label.trim).filter(_.nonEmpty).map(Pattern.quote)
    if (parts.length == 1) parts(0) else parts.mkString(separatorClass)
  }

  /** keyword.py:141-148 — any uppercase char or any codepoint > 127 makes a
    * label case-sensitive. */
  def isCaseSensitiveLabel(label: String): Boolean =
    label.exists(c => Character.isUpperCase(c) || c > 127)

  /** keyword.py:127-150 — partition by case handling, longest labels first.
    * Scala's sortBy is stable, matching Python's sorted. */
  def splitByCaseHandling(labels: Seq[String]): (Vector[String], Vector[String]) = {
    val sorted = labels.sortBy(l => -l.length)
    val (cs, ci) = sorted.filter(_.trim.nonEmpty).partition(isCaseSensitiveLabel)
    (cs.toVector, ci.toVector)
  }

  def alternation(sortedLabels: Seq[String]): Option[String] =
    if (sortedLabels.isEmpty) None
    else Some("(?<!\\w)(?:" + sortedLabels.map(separatorFlexible).mkString("|") + ")(?!\\w)")

  /** Java's lookbehind steps back one CHAR, not one codepoint, so
    * (?<!\w) wrongly accepts a match right after a supplementary-plane word
    * char (it only sees the low surrogate). Python evaluates per codepoint.
    * This post-check re-verifies both custom word boundaries per codepoint.
    */
  def codepointBoundariesOk(text: String, start: Int, end: Int): Boolean = {
    val beforeOk = start == 0 || !graft.extract.Gazetteer.isWordCp(text.codePointBefore(start))
    val afterOk = end >= text.length || !graft.extract.Gazetteer.isWordCp(text.codePointAt(end))
    beforeOk && afterOk
  }

  def compile(regex: Option[String], caseSensitive: Boolean): Pattern = regex match {
    case None => null
    case Some(r) =>
      val flags =
        if (caseSensitive) Pattern.UNICODE_CHARACTER_CLASS
        else Pattern.UNICODE_CHARACTER_CLASS | Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE
      Pattern.compile(r, flags)
  }
}
