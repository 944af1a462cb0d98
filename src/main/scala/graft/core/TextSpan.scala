package graft.core

/** A character-interval annotation within one passage of text.
  *
  * Unlike the reference's Span (/root/reference/knowledge_graph/span.py:33-136),
  * which carries the full passage text on every span, we normalize: the passage
  * text lives once on the row (turn) and spans are (start, end, concept,
  * labellers). At 10^12-turn scale duplicating passage text per span would
  * multiply shuffle width by the mention count, so the engine reconstructs
  * `labelledText` on demand from the owning passage.
  *
  * `start` is inclusive, `end` exclusive, both character (UTF-16 unit) offsets
  * — matching Python string indices for BMP text.
  */
final case class TextSpan(
    start: Int,
    end: Int,
    conceptId: String,
    labellers: Vector[String] = Vector.empty,
    probability: Option[Double] = None
) {
  def length: Int = end - start
  def labelledTextIn(text: String): String = text.substring(start, end)
  def idFor(text: String): String = Identifier8.spanId(text, start, end, conceptId)
}

/** Pure span set-algebra, a faithful re-implementation of the interval
  * operators in /root/reference/knowledge_graph/span.py:387-486. These are the
  * correctness heart of mention extraction: the keyword classifier merges
  * overlapping matches with exactly this (greedy, order-sensitive) grouping,
  * so we reproduce it verbatim rather than "improving" it to a union-find.
  */
object SpanAlgebra {

  /** Intersection-over-union of two [start, end) intervals
    * (span.py:387-410). Both spans must refer to the same text. */
  def jaccard(a: TextSpan, b: TextSpan): Double = {
    val intersection = math.max(0, math.min(a.end, b.end) - math.max(a.start, b.start))
    val union = math.max(a.end, b.end) - math.min(a.start, b.start)
    if (union == 0) 0.0 else intersection.toDouble / union
  }

  /** span.py:238-245 */
  def overlaps(a: TextSpan, b: TextSpan): Boolean = jaccard(a, b) > 0

  /** Greedy single-pass grouping (span.py:445-469). For each span, join the
    * FIRST existing group containing any member with jaccard > threshold,
    * else open a new group. Order-sensitive by design; the reference's
    * output depends on iteration order so we keep input order exactly. */
  def groupOverlapping(
      spans: Seq[TextSpan],
      jaccardThreshold: Double = 0.0
  ): Vector[Vector[TextSpan]] = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[TextSpan]]
    spans.foreach { span =>
      var found = false
      var gi = 0
      while (!found && gi < groups.length) {
        val group = groups(gi)
        if (group.exists(other => jaccard(span, other) > jaccardThreshold)) {
          group += span
          found = true
        }
        gi += 1
      }
      if (!found) groups += scala.collection.mutable.ArrayBuffer(span)
    }
    groups.iterator.map(_.toVector).toVector
  }

  /** Merge labellers in first-seen order (span.py:148-180). Timestamps are
    * intentionally not modelled: golden comparisons ignore them (they are
    * `datetime.now()` in the reference, non-reproducible by construction). */
  private def mergeLabellers(spans: Seq[TextSpan]): Vector[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    spans.foreach(_.labellers.foreach(seen += _))
    seen.toVector
  }

  /** Smallest span containing all inputs (span.py:182-208). All spans must
    * share a concept id; single-element groups pass through untouched. */
  def union(spans: Seq[TextSpan]): TextSpan = {
    require(spans.nonEmpty, "Cannot merge an empty list of spans")
    require(spans.forall(_.conceptId == spans.head.conceptId), "All spans must have the same concept_id")
    if (spans.sizeIs == 1) spans.head
    else
      TextSpan(
        start = spans.iterator.map(_.start).min,
        end = spans.iterator.map(_.end).max,
        conceptId = spans.head.conceptId,
        labellers = mergeLabellers(spans)
      )
  }

  /** Largest span contained in all inputs (span.py:210-236). */
  def intersection(spans: Seq[TextSpan]): TextSpan = {
    require(spans.nonEmpty, "Cannot merge an empty list of spans")
    require(spans.forall(_.conceptId == spans.head.conceptId), "All spans must have the same concept_id")
    if (spans.sizeIs == 1) spans.head
    else
      TextSpan(
        start = spans.iterator.map(_.start).max,
        end = spans.iterator.map(_.end).min,
        conceptId = spans.head.conceptId,
        labellers = mergeLabellers(spans)
      )
  }

  /** span.py:472-486 — union over each greedy overlap group. */
  def mergeOverlapping(spans: Seq[TextSpan], jaccardThreshold: Double = 0.0): Vector[TextSpan] =
    groupOverlapping(spans, jaccardThreshold).map(union)

  /** IoU of the character-index SETS covered by two span lists
    * (span.py:413-442). Implemented with interval arithmetic (merge + sweep)
    * instead of materializing index sets — same result, O(n log n) not O(text).
    * Both empty => 1.0; exactly one empty => 0.0. */
  def jaccardForSpanLists(a: Seq[TextSpan], b: Seq[TextSpan]): Double = {
    def normalize(spans: Seq[TextSpan]): Vector[(Int, Int)] = {
      val sorted = spans.map(s => (s.start, s.end)).filter(p => p._2 > p._1).sortBy(identity)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      sorted.foreach { case (s, e) =>
        if (out.nonEmpty && s <= out.last._2) {
          val (ls, le) = out.last
          out(out.length - 1) = (ls, math.max(le, e))
        } else out += ((s, e))
      }
      out.toVector
    }
    val ia = normalize(a)
    val ib = normalize(b)
    val lenA = ia.iterator.map(p => p._2 - p._1).sum
    val lenB = ib.iterator.map(p => p._2 - p._1).sum
    if (lenA == 0 && lenB == 0) return 1.0
    if (lenA == 0 || lenB == 0) return 0.0
    // sweep both sorted interval lists for intersection length
    var i = 0; var j = 0; var inter = 0L
    while (i < ia.length && j < ib.length) {
      val lo = math.max(ia(i)._1, ib(j)._1)
      val hi = math.min(ia(i)._2, ib(j)._2)
      if (hi > lo) inter += (hi - lo)
      if (ia(i)._2 < ib(j)._2) i += 1 else j += 1
    }
    val union = lenA.toLong + lenB.toLong - inter
    inter.toDouble / union
  }
}
