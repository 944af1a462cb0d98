package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kg.PageRank

/** PageRank: exact equality vs an independent single-threaded fixed-point
  * reference implementation of the same recurrence (the arithmetic is
  * integer, so equality is exact, not approximate). */
class GraphAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Single-threaded reference: same recurrence, plain Scala maps. */
  private def referenceRanks(
      edges: Seq[(String, String, Long)],
      iterations: Int
  ): Map[String, Long] = {
    val sym = edges.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val outw = sym.groupBy(_._1).map { case (n, es) => n -> es.map(_._3).sum }
    val nodes = sym.map(_._1).distinct
    var rank: Map[String, Long] = nodes.map(_ -> PageRank.Scale).toMap
    for (_ <- 1 to iterations) {
      val contrib = sym
        .map { case (src, dst, w) => dst -> rank(src) * w / outw(src) }
        .groupBy(_._1)
        .map { case (n, cs) => n -> cs.map(_._2).sum }
      rank = nodes.map(n => n -> (PageRank.Teleport + 85L * contrib.getOrElse(n, 0L) / 100L)).toMap
    }
    rank
  }

  private val edges = Seq(
    // a hub (Q1) plus a chain and a detached pair
    ("Q1", "Q2", 10L), ("Q1", "Q3", 5L), ("Q1", "Q4", 1L),
    ("Q2", "Q3", 2L), ("Q4", "Q5", 7L), ("Q6", "Q7", 3L)
  )

  test("distributed fixed-point PageRank equals the single-threaded reference exactly") {
    val df = edges.toDF("concept_a", "concept_b", "n_convs")
    val got = PageRank
      .run(df, iterations = 5)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val want = referenceRanks(edges, 5)
    assert(got === want)
    // the hub must out-rank every spoke
    assert(got("Q1") > got("Q2") && got("Q1") > got("Q4"))
  }

  test("k-hop BFS equals single-threaded BFS over the concept graph") {
    val got = graft.kg.KgPipeline
      .kHopNeighborhood(spark, seed = "Q15", maxHops = 3)
      .collect()
      .map(r => r.getString(0) -> r.getInt(1))
      .toMap
    // independent reference BFS over the same edge universe
    val cs = graft.kg.DemoConceptStore.concepts
    val ids = cs.map(_.wikibaseId).toSet
    val edges =
      graft.kg.DemoConceptStore.conceptEdgesOf(cs).collect { case (s, _, o) if ids(s) && ids(o) => (s, o) } ++
        graft.kg.DemoConceptStore.surfaceEdgesOf(cs).filter { case (_, c) => ids(c) }
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    var dist = Map("Q15" -> 0)
    var frontier = Set("Q15")
    for (d <- 1 to 3) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty)).diff(dist.keySet)
      dist ++= next.map(_ -> d)
      frontier = next
    }
    assert(got === dist)
    assert(got("Q15") === 0)
    assert(got.values.exists(_ == 3), "graph should have depth-3 reachability from Q15")
  }

  /** Single-threaded reference: count triangles by brute-force set
    * intersection over sorted adjacency — independent of both the engine's
    * degree orientation and the oracle's three-way self-join. */
  private def referenceTriangles(edges: Seq[(String, String)]): Map[String, Long] = {
    val und = (edges ++ edges.map(_.swap)).distinct
    val adj = und.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = und.map(_._1).distinct
    nodes.map { n =>
      val nb = adj(n)
      // each triangle at n counted twice over ordered neighbour pairs
      n -> nb.toSeq.map(m => (adj(m) & nb).size).sum.toLong / 2
    }.toMap
  }

  test("triangle counts equal brute-force reference on K4 + appendage + detached edge") {
    // K4 (Q1..Q4, 4 triangles, 3 per corner), Q5 hanging off Q1, Q6-Q7 detached
    val tedges = Seq(
      ("Q1", "Q2"), ("Q1", "Q3"), ("Q1", "Q4"), ("Q2", "Q3"), ("Q2", "Q4"), ("Q3", "Q4"),
      ("Q1", "Q5"), ("Q6", "Q7"))
    val df = tedges.toDF("concept_a", "concept_b")
    val got = graft.kg.Triangles
      .triangleCounts(df)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(got === referenceTriangles(tedges))
    assert(got("Q1") === 3L && got("Q5") === 0L && got("Q6") === 0L)
  }

  test("triangle counts equal brute-force reference on a pseudo-random graph with a hub") {
    val rnd = new scala.util.Random(7)
    val n = 40
    val base = (0 until 160).map(_ => (rnd.nextInt(n), rnd.nextInt(n))).filter(p => p._1 != p._2)
    val hub = (1 until n).filter(_ => rnd.nextBoolean()).map(i => (0, i)) // hot node 0
    val tedges = (base ++ hub)
      .map { case (a, b) => (s"N${math.min(a, b)}", s"N${math.max(a, b)}") }
      .distinct
    val df = tedges.toDF("concept_a", "concept_b").repartition(13)
    val got = graft.kg.Triangles
      .triangleCounts(df)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(got === referenceTriangles(tedges))
    assert(got.values.sum > 0, "graph must actually contain triangles")
  }

  test("link prediction equals brute-force common-neighbour ranking; degree cap excludes hub wedges") {
    val rnd = new scala.util.Random(11)
    val n = 30
    val base = (0 until 90).map(_ => (rnd.nextInt(n), rnd.nextInt(n))).filter(p => p._1 != p._2)
    val hub = (1 until n).map(i => (0, i)) // node 0 adjacent to EVERYONE
    val tedges = (base ++ hub).map(p => (f"N${math.min(p._1, p._2)}%02d", f"N${math.max(p._1, p._2)}%02d")).distinct
    val df = tedges.toDF("concept_a", "concept_b").repartition(5)

    def reference(maxDeg: Int): Seq[(String, String, Long)] = {
      val und = (tedges ++ tedges.map(_.swap)).distinct
      val adj = und.groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).toSet }
      val eligible = adj.filter(_._2.size <= maxDeg).keySet
      val edgeSet = tedges.toSet
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for (u <- eligible; v <- adj(u); w <- adj(u); if v < w)
        counts((v, w)) = counts.getOrElse((v, w), 0L) + 1L
      counts.toSeq
        .collect { case ((a, b), c) if !edgeSet((a, b)) => (a, b, c) }
        .sortBy { case (a, b, c) => (-c, a, b) }
        .take(8)
    }

    def got(maxDeg: Long): Seq[(String, String, Long)] =
      graft.kg.Triangles
        .linkPrediction(df, maxDeg = maxDeg, k = 8)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSeq

    assert(got(10000L) === reference(10000))
    // capping at 28 excludes only the hub (degree 29); scores must drop
    // the hub's wedge contributions but hub PAIRS may still appear
    assert(got(28L) === reference(28))
    assert(got(10000L) !== got(28L), "hub exclusion must change the ranking on this graph")
  }

  /** Single-threaded reference LPA: synchronous weighted rounds, max total
    * incident weight per label, tie → min label. */
  private def referenceLpa(edges: Seq[(String, String, Long)], iterations: Int): Map[String, String] = {
    val sym = edges.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val nodes = sym.map(_._1).distinct
    var labels: Map[String, String] = nodes.map(n => n -> n).toMap
    for (_ <- 1 to iterations) {
      labels = sym
        .groupBy(_._2) // by dst
        .map { case (dst, es) =>
          val votes = es.groupBy(e => labels(e._1)).map { case (l, vs) => l -> vs.map(_._3).sum }
          val mx = votes.values.max
          dst -> votes.collect { case (l, w) if w == mx => l }.min
        }
    }
    labels
  }

  test("label propagation equals the synchronous single-threaded reference (two planted blocks)") {
    // two dense blocks joined by one weak bridge; ties exercised inside blocks
    val ledges = Seq(
      ("A1", "A2", 5L), ("A1", "A3", 5L), ("A2", "A3", 5L),
      ("B1", "B2", 5L), ("B1", "B3", 5L), ("B2", "B3", 5L),
      ("A3", "B1", 1L))
    val df = ledges.toDF("concept_a", "concept_b", "n_convs").repartition(3)
    val got = graft.kg.Communities
      .labelPropagation(df, iterations = 4)
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
    assert(got === referenceLpa(ledges, 4))
    // the two blocks must settle on different communities
    assert(Set("A1", "A2", "A3").map(got).size === 1)
    assert(Set("B1", "B2", "B3").map(got).size === 1)
    assert(got("A1") !== got("B1"))
  }

  test("label propagation matches the reference on a weighted pseudo-random graph") {
    val rnd = new scala.util.Random(23)
    val n = 30
    val ledges = (0 until 120)
      .map(_ => (rnd.nextInt(n), rnd.nextInt(n), rnd.nextInt(9) + 1L))
      .filter(p => p._1 != p._2)
      .map { case (a, b, w) => (f"N${math.min(a, b)}%02d", f"N${math.max(a, b)}%02d", w) }
      .groupBy(e => (e._1, e._2)) // one row per pair, like the co-occurrence table
      .map { case ((a, b), es) => (a, b, es.head._3) }
      .toSeq
    val df = ledges.toDF("concept_a", "concept_b", "n_convs").repartition(7)
    val got = graft.kg.Communities
      .labelPropagation(df, iterations = 3)
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
    assert(got === referenceLpa(ledges, 3))
  }

  test("clustering coefficients: ppm formula over brute-force triangles and degrees") {
    val tedges = Seq(
      ("Q1", "Q2"), ("Q1", "Q3"), ("Q1", "Q4"), ("Q2", "Q3"), ("Q2", "Q4"), ("Q3", "Q4"),
      ("Q1", "Q5"), ("Q6", "Q7"))
    val df = tedges.toDF("concept_a", "concept_b")
    val got = graft.kg.Triangles
      .clusteringCoefficients(df)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val tri = referenceTriangles(tedges)
    val und = (tedges ++ tedges.map(_.swap)).distinct
    val deg = und.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    for ((n, (d, t, c)) <- got) {
      assert(d === deg(n) && t === tri(n))
      val want = if (d >= 2) 2L * t * 1000000L / (d * (d - 1)) else 0L
      assert(c === want, s"coef_ppm for $n")
    }
    // K4 corners sit in fully-closed neighbourhoods except Q1 (Q5 dangles)
    assert(got("Q2")._3 === 1000000L && got("Q5")._3 === 0L)
    assert(got("Q1")._3 === (2L * 3L * 1000000L) / (4L * 3L))
  }

  /** Single-threaded bounded Bellman-Ford from the max-strength seed. */
  private def referenceSssp(edges: Seq[(String, String, Long)], maxHops: Int): Map[String, Long] = {
    val sym = edges.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val cost = sym.map { case (s, d, w) => (s, d, 1000000L / w) }
    val strength = sym.groupBy(_._1).map { case (n, es) => n -> es.map(_._3).sum }
    val seed = strength.toSeq.minBy { case (n, w) => (-w, n) }._1
    var dist = Map(seed -> 0L)
    for (_ <- 1 to maxHops) {
      val relaxed = cost.flatMap { case (s, d, c) => dist.get(s).map(x => d -> (x + c)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).map { case (n, ds) => n -> ds.map(_._2).min }
    }
    dist
  }

  test("bounded shortest paths equal single-threaded Bellman-Ford; hop bound binds") {
    // chain off the hub: Q1 is max-strength; Q9 is 4 hops out so maxHops=3 must exclude it
    val sedges = Seq(
      ("Q1", "Q2", 10L), ("Q1", "Q3", 5L), ("Q2", "Q3", 2L),
      ("Q3", "Q4", 4L), ("Q4", "Q8", 2L), ("Q8", "Q9", 2L))
    val df = sedges.toDF("concept_a", "concept_b", "n_convs").repartition(3)
    val got = graft.kg.ShortestPaths
      .fromStrongestNode(df, maxHops = 3)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(got === referenceSssp(sedges, 3))
    assert(got("Q1") === 0L)
    assert(!got.contains("Q9"), "Q9 is beyond the hop bound")
    // the 2-hop path Q1->Q2->Q3 (100000+500000) loses to the direct edge (200000)
    assert(got("Q3") === 200000L)
  }

  /** Single-threaded reference peeling to fixpoint. */
  private def referenceKCore(edges: Seq[(String, String)], k: Int): Map[String, Int] = {
    val und = (edges ++ edges.map(_.swap)).distinct
    var adj = und.groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    var changed = true
    while (changed) {
      val drop = adj.collect { case (n, nb) if nb.size < k => n }.toSet
      changed = drop.nonEmpty
      adj = adj.collect { case (n, nb) if !drop(n) => n -> (nb -- drop) }
    }
    adj.map { case (n, nb) => n -> nb.size }
  }

  test("k-core peeling equals reference: chain dissolves, K4 survives, cascade peels") {
    // K4 (Q1..Q4) + a tail Q4-Q5-Q6 that must peel away in CASCADE (Q6
    // first, then Q5, then Q4 keeps core degree 3), + detached chain Q7-Q8
    val edges = Seq(
      ("Q1", "Q2"), ("Q1", "Q3"), ("Q1", "Q4"), ("Q2", "Q3"), ("Q2", "Q4"), ("Q3", "Q4"),
      ("Q4", "Q5"), ("Q5", "Q6"), ("Q7", "Q8"))
    val df = edges.toDF("concept_a", "concept_b").repartition(3)
    val got2 = graft.kg.KCore.kCore(df, k = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    assert(got2 === referenceKCore(edges, 2))
    assert(got2.keySet === Set("Q1", "Q2", "Q3", "Q4"), "only the K4 survives the 2-core")
    val got3 = graft.kg.KCore.kCore(df, k = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    assert(got3 === referenceKCore(edges, 3))
    assert(got3.values.forall(_ >= 3), "3-core min-degree invariant")
    // k above the max core dissolves everything
    assert(graft.kg.KCore.kCore(df, k = 4).count() === 0L)
  }

  test("k-core on a pseudo-random hub graph matches reference peeling") {
    val rnd = new scala.util.Random(31)
    val n = 30
    val base = (0 until 100).map(_ => (rnd.nextInt(n), rnd.nextInt(n))).filter(p => p._1 != p._2)
    val hub = (1 until n).map(i => (0, i))
    val edges = (base ++ hub)
      .map(p => (f"N${math.min(p._1, p._2)}%02d", f"N${math.max(p._1, p._2)}%02d")).distinct
    val df = edges.toDF("concept_a", "concept_b").repartition(5)
    val got = graft.kg.KCore.kCore(df, k = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    assert(got === referenceKCore(edges, 3))
    assert(got.nonEmpty, "hub graph should retain a 3-core")
  }

  test("co-occurrence lift: exact quantized values; chance rate divided out") {
    // convs: c1{A,B} c2{A,B} c3{A,C} c4{B} — duplicate mention rows must
    // not inflate counts (per-conv distinct)
    val m = Seq(
      ("c1", "A"), ("c1", "A"), ("c1", "B"), ("c2", "A"), ("c2", "B"),
      ("c3", "A"), ("c3", "C"), ("c4", "B")
    ).toDF("conv_id", "concept_id")
    val got = graft.kg.KgPipeline
      .cooccurrenceLift(m)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    // n_A=3 n_B=3 n_C=1 N=4; lift = (1e6·n_ab·N) div (n_a·n_b)
    assert(got === Map(
      ("A", "B") -> ((2L, 1000000L * 2 * 4 / (3 * 3))),
      ("A", "C") -> ((1L, 1000000L * 1 * 4 / (3 * 1)))))
    // the rare-but-always-together pair (A,C) must out-lift the frequent
    // pair (A,B) even though it co-occurs half as often — the whole point
    assert(got(("A", "C"))._2 > got(("A", "B"))._2)
  }

  test("ranks are insensitive to edge-list order (fixed-point sums are exact)") {
    val df1 = edges.toDF("concept_a", "concept_b", "n_convs")
    val df2 = edges.reverse.toDF("concept_a", "concept_b", "n_convs").repartition(7)
    val r1 = PageRank.run(df1, 3).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val r2 = PageRank.run(df2, 3).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(r1 === r2)
  }
}
