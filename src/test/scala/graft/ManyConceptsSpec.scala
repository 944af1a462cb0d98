package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Concept
import graft.extract.{Gazetteer, KeywordMatcher}

/** The gazetteer's scale claim: per-passage cost is O(text), independent of
  * concept count. Build a 2000-concept store, verify exactness against the
  * per-concept matchers on sampled texts, and check the throughput ratio vs
  * a 13-concept store stays near 1 (the reference's per-concept regex pass
  * scales linearly with concepts instead). */
class ManyConceptsSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(99)
  private val syllables = Vector("bar", "cor", "dul", "fen", "gar", "hol", "jin", "kel",
    "lom", "mur", "nex", "pol", "qua", "rit", "sel", "tun", "vor", "wex", "yal", "zim")

  private def word(): String = (0 until (2 + rng.nextInt(2))).map(_ => syllables(rng.nextInt(syllables.length))).mkString

  private val bigStore: Vector[Concept] = (0 until 2000).map { i =>
    val pref = if (rng.nextBoolean()) word() else s"${word()} ${word()}"
    val alts = (0 until rng.nextInt(3)).map(_ => word())
    Concept.normalized(s"Q${10000 + i}", pref, alts)
  }.toVector

  private def makeText(nTokens: Int, store: Vector[Concept]): String =
    (0 until nTokens).map { _ =>
      if (rng.nextInt(10) == 0) {
        val c = store(rng.nextInt(store.length))
        c.allLabels(rng.nextInt(c.allLabels.length))
      } else word() + rng.nextInt(100)
    }.mkString(" ")

  test("2000-concept gazetteer is exact vs per-concept matchers on sampled texts") {
    val gaz = new Gazetteer(bigStore)
    val texts = (0 until 30).map(_ => makeText(30, bigStore))
    // verify against 100 sampled concepts x 30 texts (full 2000x30 regex
    // passes would take minutes — which is exactly the point)
    val sampleIdx = (0 until 100).map(_ => rng.nextInt(bigStore.length)).distinct
    val matchers = sampleIdx.map(i => i -> new KeywordMatcher(bigStore(i))).toMap
    texts.foreach { text =>
      val all = gaz.findAll(text)
      sampleIdx.foreach { i =>
        assert(all(i) == matchers(i).findSpans(text), s"concept ${bigStore(i).preferredLabel}")
      }
    }
    assert(texts.map(t => gaz.findAll(t).count(_.nonEmpty)).sum > 0, "sampled texts should contain mentions")
  }

  test("per-passage cost is ~independent of concept count (O(text), not O(concepts x text))") {
    val smallStore = bigStore.take(13)
    val gazSmall = new Gazetteer(smallStore)
    val gazBig = new Gazetteer(bigStore)
    val texts = (0 until 3000).map(_ => makeText(30, bigStore)).toArray
    // warm-up
    texts.take(500).foreach { t => gazSmall.findPresent(t); gazBig.findPresent(t) }
    def timeIt(g: Gazetteer): Double = {
      val t0 = System.nanoTime()
      texts.foreach(g.findPresent)
      (System.nanoTime() - t0) / 1e9
    }
    // interleave the legs and take per-leg minima so a transient host-load
    // spike (this is a shared box) cannot inflate one leg's single sample —
    // same contention-immunity device as the Bench scaling harness
    val samples = (0 until 3).map(_ => (timeIt(gazSmall), timeIt(gazBig)))
    val (tSmall, tBig) = (samples.map(_._1).min, samples.map(_._2).min)
    val ratio = tBig / tSmall
    info(f"13 concepts: $tSmall%.3fs, 2000 concepts: $tBig%.3fs, ratio ${ratio}%.2f (reference would be ~154x)")
    // generous bound: trie depth/fan-out effects allow some growth, but
    // nothing near the 154x a per-concept pass would cost
    assert(ratio < 8.0, f"gazetteer cost grew ${ratio}%.1fx with 154x more concepts")
  }
}
