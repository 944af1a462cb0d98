package graft.extract

/** BIO token predictions -> character-level spans, mirroring the reference's
  * `_reconstruct_spans_from_predictions`
  * (/root/reference/knowledge_graph/classifier/bert_token_classifier.py:119-193)
  * exactly: special tokens (offset (0,0)) are skipped, a B token finalises
  * any open span and starts a new one, an I token extends an OPEN span
  * (orphaned I tokens finalise instead — they never start a span), anything
  * else finalises; spans shorter than `minSpanChars` are dropped; the span
  * probability is the arithmetic mean of its tokens' predicted-label
  * probabilities (sequential sum / count, matching np.mean's fold). This is
  * pure JVM logic — the model behind the labels is pluggable (TokenScorer),
  * so the algorithm is testable against the EXECUTED reference function
  * without any transformer runtime. */
object BioSpans {

  val OLabel = 0
  val BLabel = 1
  val ILabel = 2

  final case class BioSpan(start: Int, end: Int, probability: Double)

  def reconstruct(
      tokenLabels: Array[Int],
      tokenProbs: Array[Double],
      offsets: Array[(Int, Int)],
      minSpanChars: Int = 2
  ): Vector[BioSpan] = {
    require(
      tokenLabels.length == tokenProbs.length && tokenLabels.length == offsets.length,
      "labels, probs and offsets must align")
    val out = Vector.newBuilder[BioSpan]
    var curStart = -1
    var curEnd = -1
    var probSum = 0.0
    var probN = 0

    def finalise(): Unit = {
      if (curStart >= 0 && curEnd >= 0 && curEnd - curStart >= minSpanChars)
        out += BioSpan(curStart, curEnd, probSum / probN)
      curStart = -1
      curEnd = -1
      probSum = 0.0
      probN = 0
    }

    var i = 0
    while (i < tokenLabels.length) {
      val (ts, te) = offsets(i)
      if (!(ts == 0 && te == 0)) { // special tokens carry offset (0,0)
        tokenLabels(i) match {
          case BLabel =>
            finalise()
            curStart = ts
            curEnd = te
            probSum = tokenProbs(i)
            probN = 1
          case ILabel if curStart >= 0 =>
            curEnd = te
            probSum += tokenProbs(i)
            probN += 1
          case _ =>
            finalise()
        }
      }
      i += 1
    }
    finalise()
    out.result()
  }
}
