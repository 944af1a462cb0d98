package graft.core

/** Ratcliff-Obershelp similarity, matching Python difflib.SequenceMatcher
  * semantics (including autojunk for long right-hand strings) — required by
  * the reference's LLM-output span alignment
  * (/root/reference/knowledge_graph/span.py:489-553), which fuzzily relocates
  * a span's text inside the original passage when a generative model mutated
  * it. `levenshtein()` is NOT the same metric, so this is a faithful port of
  * the public difflib algorithm.
  */
object Fuzzy {

  /** difflib.SequenceMatcher(None, a, b).ratio() = 2*M/T. */
  def ratio(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val matches = totalMatches(a, b)
    2.0 * matches / (a.length + b.length)
  }

  private def totalMatches(a: String, b: String): Int = {
    // b2j with autojunk: drop elements occurring more than 1% of b when
    // len(b) >= 200 (difflib's heuristic)
    val b2j = new java.util.HashMap[Char, java.util.ArrayList[Integer]]()
    var i = 0
    while (i < b.length) {
      val c = b.charAt(i)
      var l = b2j.get(c)
      if (l == null) { l = new java.util.ArrayList[Integer](); b2j.put(c, l) }
      l.add(i)
      i += 1
    }
    if (b.length >= 200) {
      val ntest = b.length / 100 + 1
      val it = b2j.entrySet().iterator()
      while (it.hasNext) {
        if (it.next().getValue.size() > ntest) it.remove()
      }
    }

    // recursive matching-blocks sum, iterative with an explicit queue
    var total = 0
    val queue = scala.collection.mutable.Stack((0, a.length, 0, b.length))
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val (bi, bj, size) = findLongestMatch(a, b, b2j, alo, ahi, blo, bhi)
      if (size > 0) {
        total += size
        if (alo < bi && blo < bj) queue.push((alo, bi, blo, bj))
        if (bi + size < ahi && bj + size < bhi) queue.push((bi + size, ahi, bj + size, bhi))
      }
    }
    total
  }

  /** difflib.find_longest_match: longest block with ties broken towards the
    * earliest start in a, then earliest in b; junk-aware extension. */
  private def findLongestMatch(
      a: String,
      b: String,
      b2j: java.util.HashMap[Char, java.util.ArrayList[Integer]],
      alo: Int,
      ahi: Int,
      blo: Int,
      bhi: Int
  ): (Int, Int, Int) = {
    var besti = alo
    var bestj = blo
    var bestsize = 0
    var j2len = new java.util.HashMap[Integer, Integer]()
    var i = alo
    while (i < ahi) {
      val newj2len = new java.util.HashMap[Integer, Integer]()
      val js = b2j.get(a.charAt(i))
      if (js != null) {
        val it = js.iterator()
        var break = false
        while (it.hasNext && !break) {
          val j = it.next().intValue()
          if (j >= blo) {
            if (j >= bhi) break = true
            else {
              val k = Option(j2len.get(j - 1)).map(_.intValue()).getOrElse(0) + 1
              newj2len.put(j, k)
              if (k > bestsize) { besti = i - k + 1; bestj = j - k + 1; bestsize = k }
            }
          }
        }
      }
      j2len = newj2len
      i += 1
    }
    // difflib's junk-aware extension loops: with isjunk=None the bjunk set is
    // empty, so BOTH loop pairs extend unconditionally over any equal chars
    // (including "popular" chars that autojunk removed from b2j — popularity
    // only stops matches from SEEDING there, not from extending across).
    var bi = besti; var bj = bestj; var size = bestsize
    while (bi > alo && bj > blo && a.charAt(bi - 1) == b.charAt(bj - 1)) {
      bi -= 1; bj -= 1; size += 1
    }
    while (bi + size < ahi && bj + size < bhi && a.charAt(bi + size) == b.charAt(bj + size)) size += 1
    (bi, bj, size)
  }

  /** span.py:489-553 — find span text in (possibly mutated) input text:
    * exact match at the expected offset first, else the best fuzzy window. */
  def findSpanTextInInputText(
      inputText: String,
      spanTextRaw: String,
      spanStartIndex: Int,
      fuzzyMatchThreshold: Double = 0.9,
      nSpansLengthToSearch: Int = 4,
      spanLengthErrorMargin: Int = 1
  ): Option[(Int, Int)] = {
    val spanText = spanTextRaw.trim.replaceAll("\\s+", " ")
    val sLen = spanText.length
    // exact-match check with Python slice semantics (span.py:521):
    // input_text[start : start+len] clamps out-of-range and wraps negative
    // indices, so an empty span text matches at ANY offset — reproduce that
    // rather than crash on out-of-window offsets
    def pySlice(s: String, from: Int, until: Int): String = {
      def idx(i: Int): Int = {
        val j = if (i < 0) s.length + i else i
        math.max(0, math.min(s.length, j))
      }
      val (f, u) = (idx(from), idx(until))
      if (u <= f) "" else s.substring(f, u)
    }
    if (pySlice(inputText, spanStartIndex, spanStartIndex + sLen) == spanText)
      return Some((spanStartIndex, spanStartIndex + sLen))

    val windowLength = sLen * nSpansLengthToSearch
    val windowStart = math.max(0, spanStartIndex - windowLength / 2)
    val windowEnd = math.min(inputText.length, windowStart + windowLength)

    var bestRatio = 0.0
    var best: Option[(Int, Int)] = None
    var candLen = sLen - spanLengthErrorMargin
    while (candLen <= sLen + spanLengthErrorMargin) {
      var i = windowStart
      while (i <= windowEnd - candLen) {
        val candidate = inputText.substring(i, i + candLen)
        val r = ratio(spanText, candidate)
        if (r > bestRatio) {
          bestRatio = r
          best = Some((i, i + candLen))
        }
        i += 1
      }
      candLen += 1
    }
    if (bestRatio > fuzzyMatchThreshold) best else None
  }
}
