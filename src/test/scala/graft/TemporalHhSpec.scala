package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.data.{HeavyHitters, TemporalJoins}
import graft.extract.MisraGriesAggregate

/** Brute-force property checks for the temporal-join operators and the
  * Misra-Gries heavy-hitter pipeline — deterministic synthetic inputs whose
  * ground truth is computed by an independent in-memory formulation. */
class TemporalHhSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic Zipf-ish item stream: item i appears ~N/(i+1) times,
  // interleaved (not grouped) so per-partition prefixes are adversarial for
  // an order-dependent sketch
  private def zipfStream(nItems: Int, scale: Int): Seq[String] = {
    val out = Seq.newBuilder[String]
    var round = 0
    while (round < scale) {
      var i = 0
      while (i < nItems) {
        if (round % (i + 1) == 0) out += s"item_$i"
        i += 1
      }
      round += 1
    }
    out.result()
  }

  test("heavyHitters is EXACT vs brute force with k far below the distinct count") {
    val items = zipfStream(nItems = 5000, scale = 400) // ~33k rows, 5000 distinct
    val df = items.toDF("tok").repartition(7) // multiple partitions => real merges
    val phi = 0.005
    val k = 250 // >= 1/phi, << 5000 distinct: compaction must engage
    val got = HeavyHitters
      .heavyHitters(df, "tok", phi, k)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val n = items.size
    val t = math.max(1L, math.ceil(phi * n).toLong)
    val want = items.groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= t).toMap
    assert(got == want, s"threshold=$t n=$n got=${got.size} want=${want.size}")
    assert(want.nonEmpty && want.size < 5000) // the test actually discriminates
  }

  test("mg_sketch survivor set is a superset of every item above n/(k+1), any partitioning") {
    val items = zipfStream(nItems = 800, scale = 120)
    val n = items.size
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 3, 13)) {
      val k = 64
      val row = items.toDF("tok").repartition(parts)
        .agg(MisraGriesAggregate.mgSketch(col("tok"), k))
        .head()
      val survivors = row.getMap[String, Long](0)
      assert(survivors.size <= k)
      val mustSurvive = truth.filter(_._2 > n.toLong / (k + 1)).keySet
      val missing = mustSurvive -- survivors.keySet
      assert(missing.isEmpty, s"parts=$parts missing=$missing")
      // estimates are undercounts by at most n/(k+1)
      survivors.foreach { case (item, est) =>
        assert(est <= truth(item), s"$item overestimated: $est > ${truth(item)}")
        assert(est >= truth(item) - n / (k + 1), s"$item undercut past the bound")
      }
    }
  }

  test("asofBackward equals the per-row argmax brute force, including ties and no-match rows") {
    // keys with: interleaved lefts/rights, exact-ts ties (left==right ts and
    // right==right ts), lefts before any right
    val left = Seq(
      (1L, "u1", 100L, 1.0), (2L, "u1", 200L, 2.0), (3L, "u1", 50L, 3.0),
      (4L, "u2", 300L, 4.0), (5L, "u2", 300L, 5.0), // two lefts at one ts
      (6L, "u3", 10L, 6.0) // no right at or before
    )
    val right = Seq(
      (11L, "u1", 100L, 10.0), (12L, "u1", 100L, 20.0), // tie: larger id wins
      (13L, "u1", 150L, 30.0),
      (14L, "u2", 300L, 40.0), // matches AT the left ts
      (15L, "u3", 999L, 50.0) // only after the left
    )
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val lDf = left.map { case (id, u, t, v) => (id, u, ts(t), v) }.toDF("event_id", "user_id", "ts", "value")
    val rDf = right.map { case (id, u, t, v) => (id, u, ts(t), v) }.toDF("event_id", "user_id", "ts", "value")
    val got = TemporalJoins
      .asofBackward(lDf, rDf, "user_id", "ts", "event_id", Seq("event_id", "value"), prefix = "m_")
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(4)).map(_.asInstanceOf[Long]), Option(r.get(5)).map(_.asInstanceOf[Double])))
      .toMap
    val want = left.map { case (id, u, t, _) =>
      val m = right.filter(r => r._2 == u && r._3 <= t).sortBy(r => (r._3, r._1)).lastOption
      id -> (m.map(_._1), m.map(_._4))
    }.toMap
    assert(got == want)
    assert(got(3L) == ((None, None))) // genuinely exercises the no-match path
    assert(got(1L) == ((Some(12L), Some(20.0)))) // tie broken by larger right id
  }

  test("asofBackward ignores right rows with NULL ts or NULL key (SQL comparison semantics)") {
    import org.apache.spark.sql.types._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", StringType),
      StructField("ts", TimestampType), StructField("value", DoubleType)))
    val lDf = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "u1", ts(100L), 1.0), Row(2L, "u2", ts(100L), 2.0)), schema)
    // u1 has ONLY a null-ts right row (must not match anything: NULL <= ts is
    // never true in SQL); u2 has a null-key row (same) plus one real match
    val rDf = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(11L, "u1", null, 10.0),
        Row(12L, null, ts(50L), 20.0),
        Row(13L, "u2", ts(50L), 30.0)), schema)
    val got = TemporalJoins
      .asofBackward(lDf, rDf, "user_id", "ts", "event_id", Seq("event_id", "value"), prefix = "m_")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(4)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got == Map(1L -> None, 2L -> Some(13L)))
  }

  test("bandJoin equals the brute-force inequality join, band edges inclusive exactly once") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // pairs exactly AT the band edge, straddling bin boundaries, same-bin
    val left = Seq((1L, "u1", 0L), (2L, "u1", 1000L), (3L, "u2", 500L))
    val right = Seq((11L, "u1", 300L), (12L, "u1", 1300L), (13L, "u1", 5000L), (14L, "u2", 200L), (15L, "u2", 800L))
    val lDf = left.map { case (id, u, t) => (id, u, ts(t)) }.toDF("event_id", "user_id", "ts")
    val rDf = right.map { case (id, u, t) => (id, u, ts(t)) }.toDF("event_id", "user_id", "ts")
    val band = 300L
    val got = TemporalJoins
      .bandJoin(lDf, rDf, "user_id", "ts", band, Seq("event_id"), Seq("event_id"), prefix = "r_")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    val want = (for {
      (lid, lu, lt) <- left
      (rid, ru, rt) <- right
      if lu == ru && math.abs(lt - rt) <= band
    } yield (lid, rid, lt - rt)).sortBy(x => (x._1, x._2))
    assert(got.toSeq == want)
    // edge pair at exactly |dt| == band present exactly once
    assert(want.count { case (l, r, dt) => math.abs(dt) == band } >= 2)
  }
}
