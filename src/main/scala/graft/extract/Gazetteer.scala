package graft.extract

import graft.core.{Concept, SpanAlgebra, TextSpan}

/** Multi-concept gazetteer: one shared token-trie pass over each passage
  * instead of C regex scans for C concepts.
  *
  * Scale rationale: the reference runs one compiled regex set per concept per
  * passage (/root/reference/knowledge_graph/classifier/keyword.py:174-222),
  * i.e. O(concepts × text). At 10^12 turns × thousands of concepts that is
  * the dominant cost, so the gazetteer tokenizes each passage ONCE and walks
  * an Aho-Corasick-style token trie built over all concepts' labels,
  * O(tokens × max-label-words + matches). This is the "gazetteer/trie-based
  * concept mention detection" stage the pipeline centres on.
  *
  * Exactness: for case-insensitive labels whose separator-split parts are
  * pure ASCII word characters (the overwhelming majority — case-insensitive
  * labels are pure-ASCII-lowercase by construction, keyword.py:141-148), the
  * trie provably emits the same spans as the compiled alternation:
  *   - parts are \w-only, so a regex match can only start/end at token
  *     boundaries and each part must equal a whole token;
  *   - between parts the regex requires [\s\-–—]+, checked on the raw gap;
  *   - finditer order is emulated by scanning hits left-to-right, preferring
  *     the lowest alternation rank (labels sorted longest-first) at each
  *     start, and resuming after each match end.
  * Concepts with any non-simple case-insensitive label, all case-sensitive
  * labels, and all negative labels fall back to the per-concept compiled
  * patterns, preserving KeywordMatcher's exact semantics. The equivalence
  * gazetteer == per-concept KeywordMatcher is property-tested.
  */
final class Gazetteer(val concepts: Vector[Concept]) extends Serializable {
  import Gazetteer._

  val matchers: Vector[KeywordMatcher] = concepts.map(new KeywordMatcher(_))

  // Per concept: case-insensitive labels in alternation-rank order (longest
  // first), or None if any is non-simple (then the regex path covers them).
  private val ciLabelSets: Vector[Option[Vector[Vector[String]]]] = concepts.map { c =>
    val (_, ci) = KeywordMatcher.splitByCaseHandling(c.allLabels)
    val tokenized = ci.map(tokenizeSimpleLabel)
    if (tokenized.forall(_.isDefined)) Some(tokenized.map(_.get)) else None
  }

  private val trieViaIndex: Vector[Boolean] = ciLabelSets.map(_.isDefined)

  // cs labels always via regex; ci via regex only for fallback concepts.
  @transient private lazy val csPatterns =
    concepts.indices.toVector.map { i =>
      val (cs, _) = KeywordMatcher.splitByCaseHandling(concepts(i).allLabels)
      KeywordMatcher.compile(KeywordMatcher.alternation(cs), caseSensitive = true)
    }
  @transient private lazy val ciFallbackPatterns =
    concepts.indices.toVector.map { i =>
      if (trieViaIndex(i)) null
      else {
        val (_, ci) = KeywordMatcher.splitByCaseHandling(concepts(i).allLabels)
        KeywordMatcher.compile(KeywordMatcher.alternation(ci), caseSensitive = false)
      }
    }
  @transient private lazy val negMatchers: Vector[KeywordMatcher] = matchers

  // ---- trie ----------------------------------------------------------------
  private final class Node extends Serializable {
    val children = new java.util.HashMap[String, Node]()
    // (conceptIdx, rank in that concept's ci alternation)
    var terminals: List[(Int, Int)] = Nil
  }

  private val root: Node = {
    val r = new Node
    for (ci <- concepts.indices; labels <- ciLabelSets(ci); (parts, rank) <- labels.zipWithIndex) {
      var node = r
      parts.foreach { part =>
        var next = node.children.get(part)
        if (next == null) { next = new Node; node.children.put(part, next) }
        node = next
      }
      node.terminals ::= (ci, rank)
    }
    r
  }

  /** Spans for every concept in one pass. Returns (conceptIdx -> spans in the
    * same order KeywordMatcher would emit them). */
  def findAll(text: String): Array[Vector[TextSpan]] = {
    val tokens = tokenize(text)
    // hits per concept: (startChar, endChar, rank)
    val hits = Array.fill(concepts.length)(List.empty[(Int, Int, Int)])
    var i = 0
    while (i < tokens.length) {
      var node = root
      var j = i
      var continue = true
      while (continue && j < tokens.length) {
        val key = tokens(j).lowered
        node = if (key == null) null else node.children.get(key)
        if (node == null) continue = false
        else {
          node.terminals.foreach { case (ci, rank) =>
            hits(ci) ::= ((tokens(i).start, tokens(j).end, rank))
          }
          // extend only across pure-separator gaps
          if (j + 1 < tokens.length && isSeparatorGap(text, tokens(j).end, tokens(j + 1).start)) j += 1
          else continue = false
        }
      }
      i += 1
    }

    val out = new Array[Vector[TextSpan]](concepts.length)
    var ci = 0
    while (ci < concepts.length) {
      val m = matchers(ci)
      // case-sensitive matches first (reference extends cs then ci)
      val csSpans = matchWith(text, csPatterns(ci), m)
      val ciSpans =
        if (trieViaIndex(ci)) emulateFinditer(hits(ci), m)
        else matchWith(text, ciFallbackPatterns(ci), m)
      val positives = csSpans ++ ciSpans
      out(ci) =
        if (positives.isEmpty) Vector.empty
        else {
          val merged = SpanAlgebra.mergeOverlapping(positives)
          val negs = negativeSpans(text, ci)
          if (negs.isEmpty) merged
          else merged.filterNot(p => negs.exists(n => SpanAlgebra.overlaps(p, n)))
        }
      ci += 1
    }
    out
  }

  private def matchWith(text: String, p: java.util.regex.Pattern, m: KeywordMatcher): Vector[TextSpan] = {
    if (p == null) return Vector.empty
    val mt = p.matcher(text)
    val out = Vector.newBuilder[TextSpan]
    while (mt.find()) {
      if (mt.start() != mt.end())
        out += TextSpan(mt.start(), mt.end(), m.concept.wikibaseId, Vector(m.labeller))
    }
    out.result()
  }

  @transient private lazy val negPatterns: Vector[(java.util.regex.Pattern, java.util.regex.Pattern)] =
    concepts.map { c =>
      val (cs, ci) = KeywordMatcher.splitByCaseHandling(c.negativeLabels)
      (
        KeywordMatcher.compile(KeywordMatcher.alternation(cs), caseSensitive = true),
        KeywordMatcher.compile(KeywordMatcher.alternation(ci), caseSensitive = false)
      )
    }

  private def negativeSpans(text: String, ci: Int): Vector[TextSpan] = {
    if (concepts(ci).negativeLabels.isEmpty) return Vector.empty
    val (csP, ciP) = negPatterns(ci)
    val raw = matchWith(text, csP, matchers(ci)) ++ matchWith(text, ciP, matchers(ci))
    if (raw.isEmpty) Vector.empty else SpanAlgebra.mergeOverlapping(raw)
  }

  /** Replay regex finditer semantics over collected trie hits. */
  private def emulateFinditer(hitsReversed: List[(Int, Int, Int)], m: KeywordMatcher): Vector[TextSpan] = {
    if (hitsReversed.isEmpty) return Vector.empty
    val sorted = hitsReversed.toArray
    java.util.Arrays.sort(
      sorted,
      Ordering.by[(Int, Int, Int), (Int, Int)](h => (h._1, h._3))
    )
    val out = Vector.newBuilder[TextSpan]
    var pos = 0
    var k = 0
    while (k < sorted.length) {
      val (s, e, _) = sorted(k)
      if (s >= pos) {
        out += TextSpan(s, e, m.concept.wikibaseId, Vector(m.labeller))
        pos = e
        // skip remaining hits at the same start (lower-priority alternatives)
        while (k + 1 < sorted.length && sorted(k + 1)._1 == s) k += 1
      }
      k += 1
    }
    out.result()
  }
}

object Gazetteer {
  final case class Token(start: Int, end: Int, lowered: String)

  /** Java \w with UNICODE_CHARACTER_CLASS:
    * [\p{Alpha}\p{gc=Mn}\p{gc=Me}\p{gc=Mc}\p{Digit}\p{gc=Pc}\p{IsJoin_Control}] */
  def isWordChar(c: Char): Boolean = {
    if (c < 128) (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'
    else {
      val t = Character.getType(c)
      Character.isAlphabetic(c) || Character.isDigit(c) ||
      t == Character.NON_SPACING_MARK || t == Character.ENCLOSING_MARK ||
      t == Character.COMBINING_SPACING_MARK || t == Character.CONNECTOR_PUNCTUATION ||
      c == '\u200c' || c == '\u200d' // ZWNJ / ZWJ join controls
    }
  }

  /** Python/Java \s (Unicode White_Space) plus the hyphen/dash separators. */
  def isSeparatorChar(c: Char): Boolean =
    c == '-' || c == '–' || c == '—' || Character.isWhitespace(c) ||
      c == '\u00a0' || c == '\u2007' || c == '\u202f' || c == '\u0085'

  def isSeparatorGap(text: String, from: Int, until: Int): Boolean = {
    var i = from
    while (i < until) {
      if (!isSeparatorChar(text.charAt(i))) return false
      i += 1
    }
    true
  }

  /** Tokenize into maximal \w runs. `lowered` is the ASCII-lowercased token,
    * or null if the token contains any non-ASCII char (those can never equal
    * a pure-ASCII trie label part). */
  def tokenize(text: String): Array[Token] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Token]
    var i = 0
    val n = text.length
    while (i < n) {
      if (isWordChar(text.charAt(i))) {
        val start = i
        var ascii = true
        while (i < n && isWordChar(text.charAt(i))) {
          if (text.charAt(i) > 127) ascii = false
          i += 1
        }
        val lowered =
          if (!ascii) null
          else {
            val sb = new java.lang.StringBuilder(i - start)
            var k = start
            while (k < i) {
              val c = text.charAt(k)
              sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
              k += 1
            }
            sb.toString
          }
        out += Token(start, i, lowered)
      } else i += 1
    }
    out.toArray
  }

  /** A label is trie-eligible iff every separator-split part is pure ASCII
    * word chars. Returns the parts, already lowercase by construction. */
  def tokenizeSimpleLabel(label: String): Option[Vector[String]] = {
    val parts = java.util.regex.Pattern
      .compile(KeywordMatcher.separatorClass, java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)
      .split(label.trim)
      .filter(_.nonEmpty)
    val ok = parts.nonEmpty && parts.forall(_.forall(c =>
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'
    ))
    if (ok) Some(parts.toVector) else None
  }
}
