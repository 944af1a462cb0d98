package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Fuzz, Geography}

/** Geography fuzzy match (geography.py:22-33) vs differential vectors from an
  * independent python DP implementation of rapidfuzz's InDel ratio
  * (tools/gen_geo_vectors.py). */
class GeographySpec extends AnyFunSuite {

  private lazy val vectors = {
    val in = getClass.getResourceAsStream("/geo_vectors.json")
    require(in != null)
    val root = new ObjectMapper().readTree(in)
    in.close()
    root.asScala.toVector.map { n =>
      (n.get("query").asText(), n.get("expected_iso").asText(), n.get("expected_score").asDouble())
    }
  }

  test("dimension loads ordered with 55 entries") {
    assert(Geography.dim.size == 55)
    assert(Geography.dim.head == ("Afghanistan", "AFG"))
    assert(Geography.dim.last == ("Vietnam", "VNM"))
  }

  test("bestIso matches the independent DP vectors on all cases") {
    vectors.foreach { case (q, iso, _) =>
      assert(Geography.bestIso(q) == iso, s"query='$q'")
    }
    assert(vectors.size >= 100)
  }

  test("best score matches the independent DP bit-for-bit") {
    vectors.foreach { case (q, _, score) =>
      val best = Geography.dim.map { case (n, _) => Fuzz.indelRatio(q, n) }
        .foldLeft(0.0)((b, s) => if (s > b) s else b)
      assert(best == score, s"query='$q'")
    }
  }

  test("ratio semantics: empty/identical/disjoint/case-sensitivity") {
    assert(Fuzz.indelRatio("", "") == 100.0)
    assert(Fuzz.indelRatio("", "x") == 0.0)
    assert(Fuzz.indelRatio("France", "France") == 100.0)
    assert(Fuzz.indelRatio("abc", "xyz") == 0.0)
    // case-sensitive like rapidfuzz fuzz.ratio with no processor
    assert(Fuzz.indelRatio("FRANCE", "France") < 100.0)
    // indel, not levenshtein: a substitution costs 2
    assert(Fuzz.indelRatio("abc", "axc") == 200.0 * 2 / 6)
  }

  test("ties keep the earlier dimension row (strictly-greater loop)") {
    // a query equidistant from two names must return the first one's iso
    val dim = Vector(("aa", "X1"), ("ab", "X2"))
    assert(Geography.bestIso("a", dim) == "X1")
  }

  test("ratio laws: symmetry, bounds, identity (property sweep)") {
    val gen = new scala.util.Random(42)
    val alphabet = "abcXYZ é'–"
    def word() = (0 until gen.nextInt(12)).map(_ => alphabet(gen.nextInt(alphabet.length))).mkString
    (1 to 500).foreach { _ =>
      val (a, b) = (word(), word())
      val r = Fuzz.indelRatio(a, b)
      assert(r == Fuzz.indelRatio(b, a), s"symmetry: '$a' '$b'")
      assert(r >= 0.0 && r <= 100.0, s"bounds: '$a' '$b' -> $r")
      assert(Fuzz.indelRatio(a, a) == 100.0 || a.isEmpty)
      if (r == 100.0) assert(a == b, s"100 only for equal: '$a' '$b'")
    }
  }

  test("geo_link rejects non-string input at analysis time") {
    val spark = TestSpark.spark
    import spark.implicits._
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x").select(graft.extract.GeoLink.linkGeography($"x")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("geo_link"))
  }

  test("spark expression matches the local function") {
    val spark = TestSpark.spark
    import spark.implicits._
    val qs = vectors.map(_._1).toDF("q")
    val got = qs
      .select($"q", graft.extract.GeoLink.linkGeography($"q").as("iso"))
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
    vectors.foreach { case (q, iso, _) => assert(got(q) == iso, s"query='$q'") }
  }
}
