package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.kg.ConnectedComponents

/** Connected-components at scale: star-contraction CC over a synthetic graph
  * large enough that iteration cost, not fixed overhead, dominates (the
  * sf-scale kg_canonical runs a ~350-node graph — ~2.5s of pure round fixed
  * cost).
  *
  * Graph: three deterministic edge families over n nodes partitioned into
  * 1000-node blocks (so the expected result is one component per block, a
  * NON-degenerate structure — a graph-wide random family would collapse
  * everything into one giant component and verify nothing) —
  *   chains of length `chainLen` inside each block (diameter stress: naive
  *   label propagation needs O(chainLen) rounds, star contraction O(log)),
  *   one random intra-block hash edge per node (merges the block's chains),
  *   a hub fan-in to node 0 inside block 0 only (hot-key skew stress).
  * Verifies the result is a fixpoint (component of a component is itself)
  * and counts components. Prints one JSON line; recorded in
  * BENCH/BASELINE.md.
  *
  * Env: SPARK_GRAFT_CC_NODES (default 2000000), SPARK_GRAFT_CPUS (32).
  */
object CcBench {

  val BlockSize = 1000L

  def synthesize(spark: SparkSession, n: Long, chainLen: Int = 100): DataFrame = {
    val ids = spark.range(n)
    def nid(c: org.apache.spark.sql.Column) = concat(lit("n"), c.cast("string"))
    val block = col("id") - (col("id") % BlockSize)
    val chain = ids
      .where(col("id") % chainLen =!= (chainLen - 1))
      .select(nid(col("id")).as("src"), nid(col("id") + 1).as("dst"))
    val random = ids.select(
      nid(col("id")).as("src"),
      nid(block + pmod(xxhash64(col("id")), lit(BlockSize))).as("dst")
    )
    val hub = ids
      .where(col("id") < BlockSize && col("id") % 20 === 0)
      .select(nid(col("id")).as("src"), lit("n0").as("dst"))
    chain.union(random).union(hub)
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_CC_NODES", "2000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // a ragged tail block would emit a chain edge to a node outside the id
    // range (phantom node) and break the one-component-per-block structure
    require(n % BlockSize == 0, s"n must be a multiple of $BlockSize")
    val spark = Bench.session(cpus)

    val path = s"/tmp/graft_cc_bench_$n"
    if (!Bench.parquetComplete(path))
      synthesize(spark, n).repartition(cpus * 4).write.mode("overwrite").parquet(path)
    val edges = spark.read.parquet(path)
    val nEdges = edges.count() // warm page cache

    val (components, sec) = Bench.time {
      val c = ConnectedComponents.run(spark, edges).localCheckpoint()
      c.count()
      c
    }
    val nNodes = components.count()
    val nComponents = components.select("component").distinct().count()

    // fixpoint invariant: every component label is itself labeled by itself
    val c1 = components
    val c2 = components.select(col("node").as("component"), col("component").as("root"))
    val broken = c1.join(c2, Seq("component")).where(col("root") =!= col("component")).count()
    require(broken == 0, s"$broken nodes point at non-root components")
    // structural truth: the block design makes the answer known — a CC
    // regression that over-merges or under-merges must fail here, not just
    // satisfy the fixpoint vacuously
    require(
      nComponents == n / BlockSize,
      s"expected ${n / BlockSize} per-block components, got $nComponents"
    )

    // ---- incremental leg: a batch folds into the existing assignment ------
    // shapes: every 20th block-pair MERGED by one edge (known component-count
    // delta), 1000 new nodes attached to the hub component (no delta), one
    // brand-new two-node component (+1). Cost should be O(batch), not
    // O(nEdges) — the contracted delta graph has ~nBlocks/20 + 1001 edges.
    def nid2(c: org.apache.spark.sql.Column) = concat(lit("n"), c.cast("string"))
    val nBlocks = n / BlockSize
    val mergers = spark
      .range(nBlocks)
      .where(col("id") % 20 === 0 && col("id") + 1 < nBlocks)
      .select(nid2(col("id") * BlockSize).as("src"), nid2((col("id") + 1) * BlockSize).as("dst"))
    val nMerge = mergers.count()
    val attach = spark
      .range(1000)
      .select(concat(lit("new"), col("id").cast("string")).as("src"), lit("n0").as("dst"))
    val fresh = spark.range(1).select(lit("fresh-a").as("src"), lit("fresh-b").as("dst"))
    val batch = mergers.union(attach).union(fresh)
    val (incr, incrSec) = Bench.time {
      val c = ConnectedComponents.runIncremental(spark, components, batch).localCheckpoint()
      c.count()
      c
    }
    val nComponentsIncr = incr.select("component").distinct().count()
    require(
      nComponentsIncr == nComponents - nMerge + 1,
      s"expected ${nComponents - nMerge + 1} components after batch, got $nComponentsIncr"
    )
    val i2 = incr.select(col("node").as("component"), col("component").as("root"))
    val brokenIncr = incr.join(i2, Seq("component")).where(col("root") =!= col("component")).count()
    require(brokenIncr == 0, s"$brokenIncr incremental nodes point at non-root components")

    // ---- PageRank leg: fixed-point analytics over the same block graph ----
    // 5 iterations of rank⋈edges + sum-by-dst. Structural truth: total rank
    // mass stays within [N*teleport, N*scale] (floor decay only — a
    // double-count or dropped-contribution bug breaks the bounds).
    val prIters = 5
    val (pr, prSec) = Bench.time {
      val r = graft.kg.PageRank
        .run(
          edges
            .where(col("src") =!= col("dst"))
            .select(col("src").as("concept_a"), col("dst").as("concept_b"), lit(1L).as("n_convs")),
          prIters)
        .localCheckpoint()
      r.count(); r
    }
    val prAgg = pr.agg(sum(col("rank_q")), count(lit(1))).collect()(0)
    val prMass = prAgg.getLong(0)
    val prNodes = prAgg.getLong(1)
    require(prMass <= prNodes * graft.kg.PageRank.Scale, "rank mass exceeds initial mass")
    require(prMass >= prNodes * graft.kg.PageRank.Teleport, "rank mass below the teleport floor")

    // ---- skewed-hub leg: one hub holds ~50% of ALL edges ------------------
    // north-rule stress ("skew salting on hot concepts"): every node fans
    // into n0 on top of the per-block chains, so the hub's degree is n and
    // hub edges are ~50% of the corpus. Expected structure: ONE component.
    // The hot key hits both shuffle stages of every star round — the groupBy
    // is absorbed by map-side partial MIN aggregation; the und-join's skewed
    // partition is split by AQE skew-join (thresholds tuned to this corpus
    // size; at 100 TB the defaults fire on their own).
    var skewJson = "null"
    if (sys.env.getOrElse("SPARK_GRAFT_CC_SKEW", "1") == "1") {
      val skewPath = s"/tmp/graft_cc_bench_skew_$n"
      if (!Bench.parquetComplete(skewPath)) {
        val ids = spark.range(n)
        val chain = ids
          .where(col("id") % 100 =!= 99L)
          .select(nid2(col("id")).as("src"), nid2(col("id") + 1).as("dst"))
        val hub = ids.where(col("id") > 0).select(nid2(col("id")).as("src"), lit("n0").as("dst"))
        chain.union(hub).repartition(cpus * 4).write.mode("overwrite").parquet(skewPath)
      }
      val sEdges = spark.read.parquet(skewPath)
      val sCount = sEdges.count() // warm page cache
      val hubDegree = sEdges.where(col("dst") === "n0" || col("src") === "n0").count()
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4MB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2MB")
      // plain vs skew-hardened full CC over the same hub graph
      val (sCompPlain, sSecPlain) = Bench.time {
        val c = ConnectedComponents.run(spark, sEdges).localCheckpoint()
        c.count()
        c
      }
      val (sComp, sSec) = Bench.time {
        val c = ConnectedComponents.run(spark, sEdges, skewHardened = true).localCheckpoint()
        c.count()
        c
      }
      val sComponents = sComp.select("component").distinct().count()
      require(sComponents == 1, s"skew graph must collapse to one component, got $sComponents")
      require(sCompPlain.select("component").distinct().count() == 1, "plain variant disagrees")
      val s2 = sComp.select(col("node").as("component"), col("component").as("root"))
      val sBroken = sComp.join(s2, Seq("component")).where(col("root") =!= col("component")).count()
      require(sBroken == 0, s"$sBroken skew-leg nodes point at non-root components")

      // skew-split evidence: one standalone hardened large-star round; the
      // executed adaptive plan must show the hub partition split
      // (SortMergeJoin(skew=true) / AQEShuffleRead coalesced and skewed).
      // Full plan text goes to /tmp for the PERF.md excerpt.
      val ce = sEdges
        .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
        .where(col("a") =!= col("b"))
        .distinct()
      val und = ce.union(ce.select(col("b").as("a"), col("a").as("b")))
      val mins = und
        .groupBy(col("a").as("u")).agg(least(min(col("b")), first(col("a"))).as("m"))
        .localCheckpoint()
      val oneRound = und
        .join(mins, und("a") === mins("u"))
        .where(col("b") > col("a"))
        .select(col("m").as("a"), col("b"))
        .where(col("a") =!= col("b"))
      // execute THIS queryExecution (df.count() would plan a separate
      // aggregate query and leave this adaptive plan unexecuted/initial)
      val qe = oneRound.queryExecution
      qe.toRdd.count()
      val plan = qe.executedPlan.toString
      java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/graft_cc_skew_plan.txt"), plan)
      val skewSplit = plan.contains("skew=true")

      // hub-graph PageRank: the analytics twin of the skew stress. The hub's
      // incoming contribution sum concentrates on one aggregation key, but
      // sum-by-dst partial-aggregates map-side, so the hot key costs one
      // long per upstream partition per round. Structural truth: the hub
      // must dominate the ranking.
      val (hubPr, hubPrSec) = Bench.time {
        val r = graft.kg.PageRank
          .run(
            sEdges
              .where(col("src") =!= col("dst"))
              .select(col("src").as("concept_a"), col("dst").as("concept_b"), lit(1L).as("n_convs")),
            iterations = 5)
          .localCheckpoint()
        r.count(); r
      }
      val top = hubPr.orderBy(col("rank_q").desc).limit(1).collect()(0)
      require(top.getString(0) == "n0", s"hub must top the ranking, got ${top.getString(0)}")
      skewJson =
        f"""{"n_edges":$sCount,"hub_degree":$hubDegree,"hub_edge_fraction":${hubDegree.toDouble / sCount}%.3f,"n_components":$sComponents,"sec_plain":$sSecPlain%.3f,"sec_skew_hardened":$sSec%.3f,"edges_per_sec_hardened":${sCount / sSec}%.1f,"fixpoint_ok":true,"aqe_skew_split_observed":$skewSplit,"pagerank_5iter_sec":$hubPrSec%.3f,"pagerank_edge_traversals_per_sec":${5L * sCount / hubPrSec}%.1f,"pagerank_hub_top":true}"""
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }

    val json =
      f"""{"metric":"cc_edges_per_sec","n_nodes":$nNodes,"n_edges":$nEdges,"n_components":$nComponents,"sec":$sec%.3f,"edges_per_sec":${nEdges / sec}%.1f,"fixpoint_ok":true,"incr_batch_edges":${nMerge + 1001},"incr_sec":$incrSec%.3f,"incr_components":$nComponentsIncr,"incr_structure_ok":true,"pagerank":{"iters":$prIters,"sec":$prSec%.3f,"edge_traversals_per_sec":${prIters * nEdges / prSec}%.1f,"mass_bounds_ok":true},"skew_hub":$skewJson}"""
    println(json)
    spark.stop()
  }
}
