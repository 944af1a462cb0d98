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
      if (m.start() != m.end())
        out += TextSpan(m.start(), m.end(), concept.wikibaseId, Vector(labeller))
    }
    out.result()
  }

  /** Full predict semantics (keyword.py:224-279). */
  def findSpans(text: String): Vector[TextSpan] = {
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
}

object KeywordMatcher {
  /** [\s\-–—]+ with Unicode \s — keyword.py:52-57. */
  val separatorClass: String = "[\\s\\-–—]+"
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

  def compile(regex: Option[String], caseSensitive: Boolean): Pattern = regex match {
    case None => null
    case Some(r) =>
      val flags =
        if (caseSensitive) Pattern.UNICODE_CHARACTER_CLASS
        else Pattern.UNICODE_CHARACTER_CLASS | Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE
      Pattern.compile(r, flags)
  }
}
