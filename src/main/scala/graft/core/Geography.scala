package graft.core

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** Geography fuzzy matching — the Spark-side twin of the reference's
  * `geography_string_to_iso` (/root/reference/knowledge_graph/geography.py:
  * 22-33): score the input against every dimension row's name with
  * rapidfuzz's `fuzz.ratio`, iterate rows in dimension order, and keep the
  * first strictly-greater score's ISO code ("" when nothing scores > 0).
  *
  * `fuzz.ratio` is the normalized InDel similarity: with d the
  * insertion/deletion-only edit distance, ratio = 100 * (1 - d/(|a|+|b|)),
  * equivalently 100 * 2*LCS(a,b) / (|a|+|b|) — over codepoints, no
  * preprocessing (case-sensitive), 100.0 for two empty strings. Verified by
  * differential vectors from an independent DP implementation
  * (tools/gen_geo_vectors.py).
  */
object Fuzz {

  /** rapidfuzz fuzz.ratio semantics (see object doc). */
  def indelRatio(a: String, b: String): Double = {
    val x = a.codePoints().toArray
    val y = b.codePoints().toArray
    if (x.length == 0 && y.length == 0) return 100.0
    if (x.length == 0 || y.length == 0) return 0.0
    200.0 * lcsLength(x, y) / (x.length + y.length)
  }

  /** Classic O(|x|*|y|) single-row LCS DP — inputs here are short
    * geography-name-sized strings, so quadratic is the right tool. */
  private def lcsLength(x: Array[Int], y: Array[Int]): Int = {
    val dp = new Array[Int](y.length + 1)
    var i = 0
    while (i < x.length) {
      var prev = 0
      var j = 0
      while (j < y.length) {
        val tmp = dp(j + 1)
        dp(j + 1) = if (x(i) == y(j)) prev + 1 else math.max(dp(j + 1), dp(j))
        prev = tmp
        j += 1
      }
      i += 1
    }
    dp(y.length)
  }
}

object Geography {

  /** Ordered (name, iso) dimension — order matters: ties keep the earlier
    * row, exactly like the reference's strictly-greater loop over the CSV. */
  lazy val dim: Vector[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/geography_dim.json")
    require(in != null, "graft/geography_dim.json missing from classpath")
    val mapper = new ObjectMapper()
    val root = mapper.readTree(in)
    in.close()
    root.asScala.toVector.map(n => (n.get("name").asText(), n.get("iso").asText()))
  }

  /** geography.py:22-33 — best (first strictly-greater) fuzzy match.
    * Exactness-preserving length prune (rapidfuzz's score_cutoff idea):
    * LCS <= min(|a|,|b|), so 200*min/(|a|+|b|) is a true upper bound on the
    * ratio — candidates that cannot beat the current best skip the DP
    * entirely. Identical results to the naive loop (locked by the
    * differential vectors), ~3-5x fewer DPs on real name distributions. */
  def bestIso(s: String, entries: IndexedSeq[(String, String)] = dim): String = {
    val la = s.codePointCount(0, s.length)
    var bestScore = 0.0
    var best = ""
    var i = 0
    while (i < entries.length) {
      val name = entries(i)._1
      val lb = name.codePointCount(0, name.length)
      val bound = if (la + lb == 0) 100.0 else 200.0 * math.min(la, lb) / (la + lb)
      if (bound > bestScore) {
        val sc = Fuzz.indelRatio(s, name)
        if (sc > bestScore) {
          bestScore = sc
          best = entries(i)._2
        }
      }
      i += 1
    }
    best
  }
}
