package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-node triangle counts over the undirected concept co-occurrence
  * graph — the local-clustering analytic ("how interlinked is this
  * concept's neighbourhood") that complements PageRank's global
  * centrality. Triangle membership is what distinguishes a concept that
  * merely co-occurs widely from one sitting inside a densely connected
  * topic cluster.
  *
  * Algorithm: degree-ordered edge orientation (the standard distributed
  * triangle-counting shape — cf. Suri & Vassilvitskii, "Counting Triangles
  * and the Curse of the Last Reducer", WWW 2011). Every undirected edge is
  * oriented from its lower- to its higher-(degree, id) endpoint; wedges
  * are generated per node from its OUT-neighbours only, and a wedge
  * (u→v, u→w) closes into a triangle iff the oriented edge v→w exists.
  * Each triangle is found exactly once (at its lowest-rank corner).
  *
  * Scale posture: orientation bounds every out-degree by O(sqrt(m)), so
  * the wedge self-join materializes O(m^1.5) candidate rows worst-case —
  * the provably optimal bound for this join shape — instead of the
  * Σ deg² blow-up a hub suffers under naive (id-ordered) wedging: a hot
  * concept has huge IN-degree but tiny out-degree, so hubs cost nothing
  * at wedge time. All joins are shuffle joins on node keys (nothing
  * node-sized is broadcast); the closing-edge join keys on (v, w) pairs,
  * which orientation keeps near-uniform. Counts are orientation-
  * independent, so the DuckDB oracle cross-checks with the naive
  * a<b<c three-way self-join instead — two genuinely different
  * formulations agreeing on every row.
  */
object Triangles {

  /** @param edges undirected edges (concept_a, concept_b, ...) with
    *              concept_a < concept_b, one row per pair.
    * @return (concept_id, n_triangles) for every node of the graph,
    *         zero-count nodes included. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // canonicalize defensively: an edge listed in both orientations must
    // not become two oriented rows (wedges would double-count)
    val e = edges
      .select(
        least(col("concept_a"), col("concept_b")).as("a"),
        greatest(col("concept_a"), col("concept_b")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val deg = e
      .select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy("node")
      .agg(count(lit(1)).as("deg"))

    val withDeg = e
      .join(deg.select(col("node").as("a"), col("deg").as("deg_a")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("deg_b")), Seq("b"))
    val aLower = struct(col("deg_a"), col("a")) < struct(col("deg_b"), col("b"))
    // (lo, hi, hi_deg): lo = lower-rank endpoint; hi_deg carried so wedge
    // ordering below needs no re-join against the degree table
    val oriented = withDeg
      .select(
        when(aLower, col("a")).otherwise(col("b")).as("lo"),
        when(aLower, col("b")).otherwise(col("a")).as("hi"),
        when(aLower, col("deg_b")).otherwise(col("deg_a")).as("hi_deg"))
      .localCheckpoint() // feeds the wedge self-join AND the closing join

    val o1 = oriented.as("o1")
    val o2 = oriented.as("o2")
    val wedges = o1
      .join(
        o2,
        col("o1.lo") === col("o2.lo") &&
          struct(col("o1.hi_deg"), col("o1.hi")) < struct(col("o2.hi_deg"), col("o2.hi")))
      .select(col("o1.lo").as("u"), col("o1.hi").as("v"), col("o2.hi").as("w"))
    // rank(v) < rank(w), so the closing edge — if present — is oriented v→w
    val tri = wedges.join(
      oriented.select(col("lo").as("v"), col("hi").as("w")),
      Seq("v", "w"))

    val corners = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("cnt"))
    deg
      .join(corners, Seq("node"), "left")
      .select(col("node").as("concept_id"), coalesce(col("cnt"), lit(0L)).as("n_triangles"))
  }

  /** Local clustering coefficient per node — the normalized form of the
    * triangle counts: coef(v) = 2·tri(v) / (deg(v)·(deg(v)−1)), the fraction
    * of v's neighbour pairs that are themselves linked ("is this concept's
    * neighbourhood a clique or a star"). Emitted FIXED-POINT (parts per
    * million, floor division) so the ratio is a long and the DuckDB oracle
    * reproduces it exactly; deg < 2 → 0 by convention (no pairs to close).
    * Costs one extra degree aggregate + broadcast-sized join over
    * [[triangleCounts]] — the O(m^1.5) wedge bound carries over unchanged. */
  def clusteringCoefficients(edges: DataFrame): DataFrame = {
    val e = edges
      .select(
        least(col("concept_a"), col("concept_b")).as("a"),
        greatest(col("concept_a"), col("concept_b")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val deg = e
      .select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy("node")
      .agg(count(lit(1)).as("deg"))
    triangleCounts(edges)
      .join(deg, col("concept_id") === col("node"))
      .select(
        col("concept_id"),
        col("deg"),
        col("n_triangles"),
        when(
          col("deg") >= 2,
          expr("(2 * n_triangles * 1000000) div (deg * (deg - 1))")
        ).otherwise(lit(0L)).as("coef_ppm"))
  }

  /** Common-neighbour link prediction: the top-k NON-adjacent concept
    * pairs ranked by how many neighbours they share — "which concepts
    * should probably be related but aren't linked yet", the classic
    * missing-edge suggestion over a knowledge graph.
    *
    * Scale posture: wedge generation is Σ C(deg(u), 2), inherently
    * quadratic in degree — so nodes above `maxDeg` are excluded from
    * wedge generation (NOT from the result pairs). That is the standard
    * mitigation AND the statistically right call: a shared super-hub
    * neighbour ("both co-occur with 'climate change'") carries no signal,
    * exactly like a stopword in retrieval. The exclusion is a pre-join
    * filter on the (node, degree) table; everything downstream keys on
    * candidate pairs, which the cap keeps near-uniform. Deterministic
    * (score desc, a, b) ordering so the top-k boundary is
    * oracle-reproducible. */
  def linkPrediction(edges: DataFrame, maxDeg: Long = 10000L, k: Int = 20): DataFrame = {
    val e = edges
      .select(
        least(col("concept_a"), col("concept_b")).as("a"),
        greatest(col("concept_a"), col("concept_b")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val und = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
    val deg = und.groupBy("u").agg(count(lit(1)).as("deg"))
    val small = und.join(deg.where(col("deg") <= maxDeg).select("u"), Seq("u"))
    val x = small.as("x")
    val y = small.as("y")
    val cn = x
      .join(y, col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .groupBy(col("x.v").as("a"), col("y.v").as("b"))
      .agg(count(lit(1)).as("n_common"))
    cn.join(e, Seq("a", "b"), "left_anti")
      .orderBy(col("n_common").desc, col("a"), col("b"))
      .limit(k)
      .select(col("a").as("concept_a"), col("b").as("concept_b"), col("n_common"))
  }

  /** One row per (triangle, member edge) over CANONICAL edges (a < b, one
    * row per pair — the caller guarantees this; [[KTruss]] does): each
    * triangle is enumerated exactly once at its lowest-rank corner via the
    * same degree-ordered orientation as [[triangleCounts]] (the O(m^1.5)
    * wedge bound carries over), then credited to its three edges in
    * canonical (id-ordered) form. Distinct from triangleCounts' corner
    * explode: support is an EDGE-grain statistic, so the emit key is the
    * pair, not the node. */
  def triangleEdges(canonEdges: DataFrame): DataFrame = {
    val e = canonEdges
    val deg = e
      .select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy("node")
      .agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.select(col("node").as("a"), col("deg").as("deg_a")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("deg_b")), Seq("b"))
    val aLower = struct(col("deg_a"), col("a")) < struct(col("deg_b"), col("b"))
    val oriented = withDeg
      .select(
        when(aLower, col("a")).otherwise(col("b")).as("lo"),
        when(aLower, col("b")).otherwise(col("a")).as("hi"),
        when(aLower, col("deg_b")).otherwise(col("deg_a")).as("hi_deg"))
      .localCheckpoint() // feeds the wedge self-join AND the closing join
    val o1 = oriented.as("o1")
    val o2 = oriented.as("o2")
    val wedges = o1
      .join(
        o2,
        col("o1.lo") === col("o2.lo") &&
          struct(col("o1.hi_deg"), col("o1.hi")) < struct(col("o2.hi_deg"), col("o2.hi")))
      .select(col("o1.lo").as("u"), col("o1.hi").as("v"), col("o2.hi").as("w"))
    val tri = wedges.join(
      oriented.select(col("lo").as("v"), col("hi").as("w")),
      Seq("v", "w"))
    tri.select(
      explode(
        array(
          struct(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b")),
          struct(least(col("u"), col("w")).as("a"), greatest(col("u"), col("w")).as("b")),
          struct(least(col("v"), col("w")).as("a"), greatest(col("v"), col("w")).as("b"))))
        .as("edge"))
      .select(col("edge.a").as("a"), col("edge.b").as("b"))
  }

  /** Fixed-point scale of [[linkPredictionRA]] scores (ppm). */
  val RaScale: Long = 1000000L

  /** Resource-Allocation link prediction (Zhou, Lü & Zhang 2009): rank
    * non-adjacent pairs by Σ over shared neighbours z of 1/deg(z) — the
    * published refinement of raw common-neighbour counting that DISCOUNTS
    * promiscuous shared neighbours smoothly instead of only capping them
    * (a z shared with 500 others carries 1/500 of the evidence a
    * degree-2 z carries; the same insight as idf weighting in retrieval).
    * RA consistently beats common-neighbours and Adamic-Adar on accuracy
    * in the link-prediction literature — and unlike Adamic-Adar's
    * 1/log(deg) it needs no logarithm, so the score is an EXACT integer:
    *
    *   ra_q(a, b) = Σ_z (10^6 div deg(z))
    *
    * and the DuckDB oracle reproduces every score and the top-k boundary
    * bit-for-bit (ties broken (score desc, a, b)).
    *
    * Scale posture identical to [[linkPrediction]]: wedge generation is
    * Σ C(deg, 2), so nodes above `maxDeg` are excluded from wedge
    * generation (with RA this loses almost nothing BY CONSTRUCTION — an
    * excluded hub's per-wedge contribution is ≤ 10^6/maxDeg); deg(z) is
    * carried on the wedge-centre row, so the scoring needs no extra join. */
  def linkPredictionRA(edges: DataFrame, maxDeg: Long = 10000L, k: Int = 20): DataFrame = {
    val e = edges
      .select(
        least(col("concept_a"), col("concept_b")).as("a"),
        greatest(col("concept_a"), col("concept_b")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val und = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
    val deg = und.groupBy("u").agg(count(lit(1)).as("deg"))
    val small = und.join(deg.where(col("deg") <= maxDeg), Seq("u"))
    val x = small.select(col("u"), col("v").as("xv"), col("deg"))
    val y = small.select(col("u"), col("v").as("yv"))
    val ra = x
      .join(y, Seq("u"))
      .where(col("xv") < col("yv"))
      .groupBy(col("xv").as("a"), col("yv").as("b"))
      .agg(sum(expr(s"${RaScale}L div deg")).as("ra_q"))
    ra.join(e, Seq("a", "b"), "left_anti")
      .orderBy(col("ra_q").desc, col("a"), col("b"))
      .limit(k)
      .select(col("a").as("concept_a"), col("b").as("concept_b"), col("ra_q"))
  }

  /** Neighborhood-Jaccard link prediction: score a non-adjacent pair by
    * |N(a) ∩ N(b)| / |N(a) ∪ N(b)| — the normalized third lens next to
    * raw common-neighbours ([[linkPrediction]], hub-biased) and RA
    * ([[linkPredictionRA]], hub-discounted per shared neighbour): Jaccard
    * instead discounts by the ENDPOINTS' own degrees, so a pair of
    * low-degree concepts sharing most of their small neighbourhoods
    * outranks a hub pair sharing a sliver. All-integer fixed point:
    * jac_ppm = (10^6 · common) div (deg_a + deg_b − common) — denominator
    * ≥ common ≥ 1 by the wedge construction, and 10^6 · common cannot
    * approach Long range at any realistic dictionary size.
    *
    * Same wedge economics as the siblings: pair generation is Σ C(deg, 2)
    * over deg-capped middles (the stopword argument), the two degree
    * pins are dictionary-grain joins. */
  def linkPredictionJaccard(edges: DataFrame, maxDeg: Long = 10000L, k: Int = 20): DataFrame = {
    val e = edges
      .select(
        least(col("concept_a"), col("concept_b")).as("a"),
        greatest(col("concept_a"), col("concept_b")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val und = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
    val deg = und.groupBy("u").agg(count(lit(1)).as("deg"))
    val small = und.join(deg.where(col("deg") <= maxDeg).select("u"), Seq("u"))
    val x = small.as("x")
    val y = small.as("y")
    val cn = x
      .join(y, col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .groupBy(col("x.v").as("a"), col("y.v").as("b"))
      .agg(count(lit(1)).as("n_common"))
    cn.join(e, Seq("a", "b"), "left_anti")
      .join(deg.select(col("u").as("a"), col("deg").as("deg_a")), Seq("a"))
      .join(deg.select(col("u").as("b"), col("deg").as("deg_b")), Seq("b"))
      .select(
        col("a"),
        col("b"),
        expr("(1000000 * n_common) div (deg_a + deg_b - n_common)").as("jac_ppm"))
      .orderBy(col("jac_ppm").desc, col("a"), col("b"))
      .limit(k)
      .select(col("a").as("concept_a"), col("b").as("concept_b"), col("jac_ppm"))
  }
}
