package graft

import org.apache.spark.sql.functions._

/** Scale bench for the round-5 graph-analytics family — the same
  * evidence-class as PrBench's 32M-edge PageRank measurement: each leg runs
  * one operator at a size where the DISTRIBUTED shape matters (millions of
  * edges / hundreds of thousands of simultaneous BFS sources), asserts a
  * structural truth about the result (so a silently-wrong plan can't post a
  * fast number), and prints one JSON line.
  *
  * Legs and what each proves at scale:
  *   - hits:       4 HITS iterations over a synthetic conv→concept bipartite
  *                 with a planted dominant concept (every conversation
  *                 mentions it). Truth: the planted concept tops the
  *                 authority ranking and the L-inf normalization caps scores
  *                 at Scale. Proves the score-vector-only exchange loop holds
  *                 when the hub side has millions of rows.
  *   - ppr:        5 personalized-PageRank iterations on the CcBench skew
  *                 graph (one hub holds 50% of edges). Truth: the seed (=
  *                 the hub, max incident weight) tops its own proximity
  *                 ranking. Proves the PageRank loop skeleton under the
  *                 extra broadcast-seed comparison.
  *   - walks:      2 deterministic walks × len 8 per node over the block
  *                 graph. Truth: symmetrized edges have no sinks, so the
  *                 corpus is exactly nodes·nWalks·(len+1) rows. Proves the
  *                 frontier-only step join at a multi-million-row frontier.
  *   - harmonic:   multi-source BFS (maxHops 3) from EVERY node of a
  *                 100k-node degree-8 random graph — 100k simultaneous
  *                 traversals, a dist relation in the tens of millions.
  *                 Truth: scores are positive and bounded by
  *                 (n−1)·Scale (every term ≤ Scale).
  *   - betweenness: exact hop-bounded Brandes (maxHops 4) on a 10k-node
  *                 degree-6 graph + a planted bridge node joining two
  *                 halves. Truth: the bridge tops the ranking.
  *   - ktruss:     6-truss peel over 500k planted K6 cliques linked by a
  *                 triangle-free chain (~8M edges). Truth: the truss is
  *                 PROVABLY exactly the clique edges, every support == 4,
  *                 all chain edges peel. Proves the per-round triangle
  *                 enumeration + support agg at millions of edges.
  *   - node2vec:   second-order biased walks (1 walk × len 4) from every
  *                 node of a 1M-node block graph. Truth: no sinks, so the
  *                 corpus is exactly nodes·(len+1) rows. Proves the
  *                 classify-join + per-walk cumulative-window pick at a
  *                 millions-of-walks frontier.
  *   - scc:        forward-backward coloring over 500k planted directed
  *                 4-cycles in a 3-layer one-way bridge DAG (2M nodes).
  *                 Truth: every SCC is exactly one planted cycle and the
  *                 condensation is exactly one edge per bridge — and the
  *                 layering forces MULTIPLE peel rounds, so the outer loop
  *                 (not just one coloring pass) is what's measured.
  *   - landmark:   16-landmark distance artifact over a 1M-node degree-8
  *                 graph at maxHops 6 (a ~16M-row landmarks × nodes
  *                 relation), then 1M batch pair queries against it.
  *                 Truth: estimates within [1, 2·maxHops] and TRIANGLE
  *                 EQUALITY on every landmark-endpoint pair.
  *
  * Env: SPARK_GRAFT_CPUS (32), SPARK_GRAFT_GRAPH_SCALE (1.0 — multiplies
  * every size knob; 0.1 for a smoke run).
  */
object GraphBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scale = sys.env.getOrElse("SPARK_GRAFT_GRAPH_SCALE", "1.0").toDouble
    val spark = Bench.session(cpus)
    import spark.implicits._

    def nid(c: org.apache.spark.sql.Column) = concat(lit("n"), c.cast("string"))

    // ---- HITS: bipartite with a planted dominant concept -----------------
    // 2M conversations; each mentions concept "k<conv mod 50k>" (weight 1+conv%3)
    // and the planted "kstar" (weight 2) — kstar's incident mass dominates.
    val nConvs = (2000000 * scale).toLong.max(1000L)
    val nConcepts = (50000 * scale).toLong.max(100L)
    val bip = spark
      .range(nConvs)
      .select(
        concat(lit("c"), col("id").cast("string")).as("conv_id"),
        concat(lit("k"), (col("id") % nConcepts).cast("string")).as("concept_id"),
        (lit(1L) + col("id") % 3).as("n_mentions"))
      .union(
        spark
          .range(nConvs)
          .select(
            concat(lit("c"), col("id").cast("string")).as("conv_id"),
            lit("kstar").as("concept_id"),
            lit(2L).as("n_mentions")))
    val (hits, hitsSec) = Bench.time {
      val r = graft.kg.Hits.run(bip, iterations = 4)
      r.count(); r
    }
    val topAuth = hits.where(col("kind") === "auth").orderBy(col("score_q").desc).limit(1).collect()(0)
    require(topAuth.getString(0) == "kstar", s"planted concept must top authorities: got ${topAuth.getString(0)}")
    val maxScore = hits.agg(max(col("score_q"))).collect()(0).getLong(0)
    require(maxScore <= graft.kg.Hits.Scale, s"L-inf cap violated: $maxScore")
    val hitsEdges = nConvs * 2

    // ---- PPR on the skew graph ------------------------------------------
    val n = (8000000 * scale).toLong.max(10000L)
    val skewPath = s"/tmp/graft_cc_bench_skew_$n"
    if (!Bench.parquetComplete(skewPath)) {
      val ids = spark.range(n)
      val chain = ids
        .where(col("id") % 100 =!= 99L)
        .select(nid(col("id")).as("src"), nid(col("id") + 1).as("dst"))
      val hub = ids.where(col("id") > 0).select(nid(col("id")).as("src"), lit("n0").as("dst"))
      chain.union(hub).repartition(cpus * 4).write.mode("overwrite").parquet(skewPath)
    }
    val skewEdges = spark.read.parquet(skewPath)
    val pprEdges = skewEdges.count()
    val (ppr, pprSec) = Bench.time {
      val r = graft.kg.PageRank.personalized(
        skewEdges
          .where(col("src") =!= col("dst"))
          .select(col("src").as("concept_a"), col("dst").as("concept_b"), lit(1L).as("n_convs")),
        iterations = 5)
      r.count(); r
    }
    val topPpr = ppr.orderBy(col("rank_q").desc).limit(1).collect()(0)
    require(topPpr.getString(0) == "n0", s"seed hub must top PPR: got ${topPpr.getString(0)}")

    // ---- Walks on the block graph ---------------------------------------
    val wn = (4000000 * scale).toLong.max(10000L)
    val wPath = s"/tmp/graft_cc_bench_$wn"
    if (!Bench.parquetComplete(wPath))
      CcBench.synthesize(spark, wn).repartition(cpus * 4).write.mode("overwrite").parquet(wPath)
    val wEdges = spark.read.parquet(wPath)
    val wEdgeCount = wEdges.count()
    val nWalks = 2
    val wLen = 8
    val (walks, walksSec) = Bench.time {
      val r = graft.kg.Walks.deepWalks(
        wEdges
          .where(col("src") =!= col("dst"))
          .select(col("src").as("concept_a"), col("dst").as("concept_b"), lit(1L).as("n_convs")),
        nWalks = nWalks,
        len = wLen)
      r.count(); r
    }
    val wNodes = wEdges
      .where(col("src") =!= col("dst"))
      .select(explode(array(col("src"), col("dst"))))
      .distinct()
      .count()
    val walkRows = walks.count()
    require(
      walkRows == wNodes * nWalks * (wLen + 1),
      s"symmetrized graph has no sinks, every walk must run full length: $walkRows vs ${wNodes * nWalks * (wLen + 1)}")

    // ---- Harmonic centrality: 100k simultaneous BFS sources --------------
    // degree-8 pseudo-random graph: node i -> (i*29+j) mod hn for 4 js
    val hn = (100000 * scale).toLong.max(1000L)
    val rand = spark
      .range(hn)
      .select(col("id"), explode(array((1 to 4).map(j => (col("id") * 29 + j * 104729L) % hn): _*)).as("to"))
      .where(col("id") =!= col("to"))
      .select(
        nid(least(col("id"), col("to"))).as("concept_a"),
        nid(greatest(col("id"), col("to"))).as("concept_b"))
      .distinct()
      .withColumn("n_convs", lit(1L))
    val (harm, harmSec) = Bench.time {
      val r = graft.kg.Centrality.harmonic(rand, maxHops = 3)
      r.count(); r
    }
    val harmStats = harm.agg(min(col("harm_q")), max(col("harm_q")), count(lit(1))).collect()(0)
    require(harmStats.getLong(0) > 0, "every node reaches someone within 3 hops")
    require(
      harmStats.getLong(1) <= (hn - 1) * graft.kg.Centrality.Scale,
      s"harmonic sum bound violated: ${harmStats.getLong(1)}")
    val harmNodes = harmStats.getLong(2)

    // ---- k-truss on planted cliques over a triangle-free chain -----------
    // 500k disjoint K6 cliques on node blocks [6k..6k+5] + the single
    // cross-block chain edge (6k+5, 6k+6). Triangles exist ONLY within
    // cliques (the only cross-block edge per boundary can close nothing),
    // so the 6-truss is PROVABLY exactly the clique edges, each with
    // support exactly 4 — and the cross-block edges must peel in round 1.
    val cliques = (500000 * scale).toLong.max(1000L)
    val six = spark.range(cliques * 6)
    val cliqueEdges = six
      .select((col("id") - col("id") % 6).as("base"), (col("id") % 6).as("i"))
      .join(spark.range(6).select(col("id").as("j")), col("i") < col("j"))
      .select(nid(col("base") + col("i")).as("concept_a"), nid(col("base") + col("j")).as("concept_b"))
    val chainEdges = spark
      .range(cliques - 1)
      .select(nid(col("id") * 6 + 5).as("concept_a"), nid(col("id") * 6 + 6).as("concept_b"))
    val trussIn = cliqueEdges.union(chainEdges)
    val (truss, trussSec) = Bench.time {
      val r = graft.kg.KTruss.kTruss(trussIn, k = 6)
      r.count(); r
    }
    val trussStats = truss.agg(count(lit(1)), min(col("support")), max(col("support"))).collect()(0)
    require(
      trussStats.getLong(0) == cliques * 15,
      s"6-truss must be exactly the clique edges: ${trussStats.getLong(0)} vs ${cliques * 15}")
    require(
      trussStats.getLong(1) == 4L && trussStats.getLong(2) == 4L,
      s"every K6 edge closes exactly 4 triangles: got [${trussStats.getLong(1)}, ${trussStats.getLong(2)}]")
    val trussEdgesN = cliques * 15 + (cliques - 1)

    // ---- node2vec: millions of simultaneous second-order walks -----------
    // the block graph again; truth = symmetrized graph has no sinks, so the
    // corpus is exactly nodes·(len+1) rows — proves the classify-join +
    // per-walk cumulative-window pick at a multi-million-walk frontier
    val nvNodes = (1000000 * scale).toLong.max(10000L)
    val nvPath = s"/tmp/graft_cc_bench_$nvNodes"
    if (!Bench.parquetComplete(nvPath))
      CcBench.synthesize(spark, nvNodes).repartition(cpus * 4).write.mode("overwrite").parquet(nvPath)
    val nvEdges = spark.read.parquet(nvPath)
    val nvLen = 4
    val (nv, nvSec) = Bench.time {
      val r = graft.kg.Walks.node2vecWalks(
        nvEdges
          .where(col("src") =!= col("dst"))
          .select(col("src").as("concept_a"), col("dst").as("concept_b")),
        nWalks = 1,
        len = nvLen)
      r.count(); r
    }
    val nvWalkNodes = nvEdges
      .where(col("src") =!= col("dst"))
      .select(explode(array(col("src"), col("dst"))))
      .distinct()
      .count()
    val nvRows = nv.count()
    require(
      nvRows == nvWalkNodes * (nvLen + 1),
      s"no sinks, every node2vec walk must run full length: $nvRows vs ${nvWalkNodes * (nvLen + 1)}")

    // ---- Betweenness on a star-of-stars ----------------------------------
    // centre S — k satellites — t leaves per satellite. Shortest paths are
    // UNIQUE (sigma = 1 everywhere) and at maxHops 3 the pairs through S
    // (leaf→other-satellite ≈ k·t·(k−1), sat→sat ≈ k²/2) outnumber the
    // pairs through any one satellite (≈ t·(t+2k)) by ~k·t/(t+2k) ≈ 200×
    // at (400, 50) — so "S tops the ranking" is a provable truth, not a
    // statistical hope. Betweenness is a DICTIONARY-scale op (the level
    // relations are sources × reach); 20k nodes at full 3-hop reach drives
    // level relations in the tens of millions of rows.
    val sats = (400 * scale).toLong.max(20L)
    val leaves = 50L
    val satEdges = spark
      .range(sats)
      .select(lit("S").as("concept_a"), concat(lit("sat"), col("id").cast("string")).as("concept_b"))
    val leafEdges = spark
      .range(sats * leaves)
      .select(
        concat(lit("sat"), (col("id") % sats).cast("string")).as("concept_a"),
        concat(lit("leaf"), col("id").cast("string")).as("concept_b"))
    val star = satEdges.union(leafEdges).withColumn("n_convs", lit(1L))
    val (bc, bcSec) = Bench.time {
      val r = graft.kg.Centrality.betweenness(star, maxHops = 3)
      r.count(); r
    }
    val topBc = bc.orderBy(col("bc_q").desc).limit(1).collect()(0)
    require(topBc.getString(0) == "S", s"the centre must top betweenness: got ${topBc.getString(0)}")
    val bcNodes = bc.count()

    // ---- SCC: planted directed 4-cycles under a 3-layer bridge DAG -------
    // 500k disjoint directed 4-cycles (nodes 4c..4c+3, edges i → i+1 mod 4)
    // in three layers; cycle c bridges one-way to cycle c + nCyc/3 (layers
    // 0→1→2). Truth is fully provable: every SCC is exactly one planted
    // cycle (4 members, one cycle index), component count == nCyc, and the
    // condensation has exactly one DAG edge per bridge. The layered chain
    // forces the forward-backward peel to run MULTIPLE outer rounds (an
    // upstream cycle's min label colors its whole downstream chain, so only
    // the chain-head SCC settles per round) — the peel loop itself is what
    // this leg proves at 2M nodes / 2.3M edges, not just one coloring pass.
    val nCyc = (500000 * scale).toLong.max(3000L)
    val third = nCyc / 3
    val cyc4 = spark
      .range(nCyc * 4)
      .select(
        col("id").cast("string").as("src"),
        ((col("id") - col("id") % 4) + (col("id") + 1) % 4).cast("string").as("dst"))
    val bridges = spark
      .range(third * 2)
      .select(
        (col("id") * 4).cast("string").as("src"),
        ((col("id") + third) * 4).cast("string").as("dst"))
    val (scc, sccSec) = Bench.time {
      val r = graft.kg.Scc.run(spark, cyc4.union(bridges))
      r.count(); r
    }
    val sccStats = scc
      .groupBy("scc_id")
      .agg(
        count(lit(1)).as("n_members"),
        countDistinct(expr("cast(node as long) div 4")).as("n_cycles"))
      .agg(
        count(lit(1)),
        min(col("n_members")),
        max(col("n_members")),
        max(col("n_cycles")))
      .collect()(0)
    require(sccStats.getLong(0) == nCyc, s"component count: ${sccStats.getLong(0)} vs $nCyc")
    require(
      sccStats.getLong(1) == 4L && sccStats.getLong(2) == 4L,
      s"every SCC must be one 4-cycle: sizes [${sccStats.getLong(1)}, ${sccStats.getLong(2)}]")
    require(sccStats.getLong(3) == 1L, "an SCC must never span two planted cycles")
    val (cond, condSec) = Bench.time {
      val r = graft.kg.Scc.condensation(spark, cyc4.union(bridges))
      r.count(); r
    }
    val condEdges = cond.count()
    require(condEdges == third * 2, s"condensation must be one edge per bridge: $condEdges vs ${third * 2}")
    val sccNodes = nCyc * 4
    val sccEdges = nCyc * 4 + third * 2

    // ---- Landmark distance oracle: artifact build + batch pair queries ----
    // 1M-node ring+3-hash-chord graph (degree ~8, connected). 16 landmarks,
    // maxHops 6 — reach saturates the graph, so the persisted artifact is a
    // genuine (landmarks × nodes) ≈ 16M-row relation and the BFS rounds
    // push ~128M join rows each: the scale story is that traversal cost
    // follows the SEED set while the pair-query join follows the QUERY
    // batch (1M pairs here), never nodes². Truths: (1) every estimate lies
    // in [1, 2·maxHops]; (2) TRIANGLE EQUALITY — for a queried pair whose
    // endpoint IS a landmark, the estimate must equal that landmark's own
    // BFS distance exactly (every other landmark's d(l,a)+d(l,b) ≥ d(a,b),
    // and the l=a term achieves it) — a silently-wrong min or join
    // orientation cannot pass it.
    val lmN = (1000000 * scale).toLong.max(10000L)
    val lmGraphPath = s"/tmp/graft_lm_bench_$lmN"
    if (!Bench.parquetComplete(lmGraphPath)) {
      val ids = spark.range(lmN)
      val ring = ids.select(nid(col("id")).as("src"), nid((col("id") + 1) % lmN).as("dst"))
      val chords = (1 to 3)
        .map(j =>
          ids.select(
            nid(col("id")).as("src"),
            nid(pmod(xxhash64(col("id"), lit(j)), lit(lmN))).as("dst")))
        .reduce(_ union _)
        .where(col("src") =!= col("dst"))
      ring.union(chords).repartition(cpus * 4).write.mode("overwrite").parquet(lmGraphPath)
    }
    val lmEdges = spark.read.parquet(lmGraphPath)
      .select(col("src").as("concept_a"), col("dst").as("concept_b"))
    val lmEdgeCount = lmEdges.count()
    val (lmDist, lmBfsSec) = Bench.time {
      val d = graft.kg.Centrality.landmarkBfs(lmEdges, landmarks = 16, maxHops = 6)
      d.count(); d
    }
    val lmArtifactRows = lmDist.count()
    val lmPairs = spark
      .range(lmN)
      .select(nid(col("id")).as("a"), nid(pmod(xxhash64(col("id"), lit(77)), lit(lmN))).as("b"))
      .where(col("a") =!= col("b"))
    val (lmEst, lmQuerySec) = Bench.time {
      val e = graft.kg.Centrality.landmarkDistanceQueries(lmDist, lmPairs).localCheckpoint()
      e.count(); e
    }
    val lmAnswered = lmEst.count()
    require(lmAnswered > 0, "landmark batch answered no pairs")
    val lmBad = lmEst.where(col("est_hops") < 1 || col("est_hops") > 12).count()
    require(lmBad == 0, s"estimates out of [1, 2*maxHops]: $lmBad")
    val lmMismatch = lmEst
      .join(
        lmDist.select(col("s").as("a"), col("v").as("b"), col("hops").as("true_hops")),
        Seq("a", "b"))
      .where(col("est_hops") =!= col("true_hops"))
      .count()
    require(lmMismatch == 0, s"triangle equality violated on $lmMismatch landmark-endpoint pairs")

    println(
      f"""{"metric":"graph_analytics_bench","scale":$scale,"hits":{"n_edges":$hitsEdges,"iters":4,"sec":$hitsSec%.3f,"edge_traversals_per_sec":${8L * hitsEdges / hitsSec}%.1f,"planted_top":true},"ppr":{"n_edges":$pprEdges,"iters":5,"sec":$pprSec%.3f,"edge_traversals_per_sec":${5L * pprEdges / pprSec}%.1f,"seed_top":true},"walks":{"n_edges":$wEdgeCount,"n_nodes":$wNodes,"corpus_rows":$walkRows,"sec":$walksSec%.3f,"walk_steps_per_sec":${walkRows / walksSec}%.1f,"full_length":true},"harmonic":{"n_nodes":$harmNodes,"max_hops":3,"sec":$harmSec%.3f,"sources_per_sec":${harmNodes / harmSec}%.1f,"bounds_ok":true},"betweenness":{"n_nodes":$bcNodes,"max_hops":3,"sec":$bcSec%.3f,"centre_top":true},"ktruss":{"n_edges":$trussEdgesN,"k":6,"sec":$trussSec%.3f,"edges_per_sec":${trussEdgesN / trussSec}%.1f,"exact_cliques":true},"node2vec":{"n_walks":$nvWalkNodes,"len":$nvLen,"corpus_rows":$nvRows,"sec":$nvSec%.3f,"walk_steps_per_sec":${nvRows / nvSec}%.1f,"full_length":true},"scc":{"n_nodes":$sccNodes,"n_edges":$sccEdges,"sec":$sccSec%.3f,"nodes_per_sec":${sccNodes / sccSec}%.1f,"condensation_sec":$condSec%.3f,"planted_exact":true},"landmark":{"n_nodes":$lmN,"n_edges":$lmEdgeCount,"landmarks":16,"max_hops":6,"artifact_rows":$lmArtifactRows,"bfs_sec":$lmBfsSec%.3f,"query_pairs_answered":$lmAnswered,"query_sec":$lmQuerySec%.3f,"pairs_per_sec":${lmAnswered / lmQuerySec}%.1f,"triangle_equality":true}}""")
    spark.stop()
  }
}
