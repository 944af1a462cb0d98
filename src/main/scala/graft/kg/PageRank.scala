package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Weighted PageRank over the concept co-occurrence graph — the standard
  * "which entities matter" analytic over the extracted KG (the corpus-level
  * sibling of the reference's per-document concept counts,
  * /root/reference/flows/aggregate.py:672-718, which rank concepts only
  * within one document).
  *
  * All rank arithmetic is FIXED-POINT (longs, scale 2^32) so every sum is
  * exact and order-free and a second engine (the DuckDB oracle) reproduces
  * the ranks bit-for-bit — the same determinism device as the IVF codebook's
  * quantized-integer Lloyd means. With damping d = 85/100 and per-node
  * initial mass 2^32:
  *
  *   r_{t+1}(v) = T + (85 * sum_{(u,v) in E} floor(r_t(u) * w_uv / W_u)) div 100
  *
  * where W_u is u's total incident weight and the teleport term
  * T = (15 * 2^32) div 100 is a CONSTANT: total initial mass is N * 2^32,
  * so (1-d)/N of it is per-node independent of N — no driver-side count
  * needed. Floor losses make total mass decay by < N*2 per iteration (one
  * ulp per edge + one per node); rankings are unaffected and both engines
  * lose identically.
  *
  * Scale posture (re-derived from stage metrics at 32M directed edges):
  *
  *   - The static weighted edge list is cached COLUMNAR (`persist`, not
  *     `localCheckpoint`): the row-object cache behind localCheckpoint holds
  *     two JVM objects per row, and at 32M rows the resulting old-gen
  *     churn made GC >50% of executor runtime (measured: 1938s GC of 3729s
  *     task time in the materialization stage). The compressed columnar
  *     cache stores a handful of buffers per batch instead.
  *   - The edge list is hash-REPARTITIONED on src before caching, and the
  *     columnar cache preserves that partitioning, so the per-iteration
  *     contrib join exchanges only the rank vector (one long per node) —
  *     the 32M-row edge relation never moves after the one-time build.
  *     The rank-update join is exchange-free on both sides: contrib comes
  *     out of its aggregation hash-partitioned on dst, and the cached node
  *     list is partitioned on the same attribute lineage.
  *   - Iterations build ONE lazy DAG — no per-iteration materialization.
  *     Shuffle files are the natural inter-iteration checkpoint; nothing
  *     rank-sized is cached until the single final localCheckpoint (which
  *     also lets the static caches be dropped before returning). Plan
  *     depth is bounded for deep runs by checkpointing every 8 iterations.
  *   - SHUFFLE_HASH on the rank side keeps the streamed edge relation
  *     unsorted (a sort-merge join would re-sort it every iteration).
  *   - A hot hub node concentrates its *incoming* contribution sum into
  *     one aggregation key; the sum is a partial-agg (map-side combine) so
  *     the skew cost is one long per upstream partition, not one row per
  *     edge.
  */
object PageRank {

  val Scale: Long = 1L << 32
  /** (15 * 2^32) div 100 — the constant teleport term. */
  val Teleport: Long = (15L * Scale) / 100L

  /** @param edges undirected weighted edges (concept_a, concept_b, n_convs);
    *              each pair listed once with concept_a < concept_b.
    * @return (concept_id, rank_q) — fixed-point rank, scale 2^32; eagerly
    *         materialized (localCheckpoint) so the static edge/node caches
    *         can be released before returning. */
  /** @param numParts static-edge-cache partition count — derive from the
    *   edge count (~500k edges per partition; see SparkEntry.partsFor) so a
    *   dictionary-sized graph is 1 partition and a corpus-epoch graph fans
    *   out; 0 = the session shuffle-partition constant (legacy callers). */
  def run(edges: DataFrame, iterations: Int = 5, numParts: Int = 0): DataFrame = {
    val nP =
      if (numParts > 0) numParts
      else edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val symRaw = edges
      .select(col("concept_a").as("src"), col("concept_b").as("dst"), col("n_convs").as("w"))
      .union(
        edges.select(col("concept_b").as("src"), col("concept_a").as("dst"), col("n_convs").as("w")))
    val outw = symRaw.groupBy("src").agg(sum(col("w")).as("wtot"))
    // wtot is static — join it into the edge list ONCE, not once per
    // iteration (at 32M directed edges that join dominated the loop)
    val sym = symRaw
      .join(outw, Seq("src"))
      .repartition(nP, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = sym.select(col("src").as("node")).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    nodes.count() // materialize both static caches in one action

    var rank = nodes.select(col("node"), lit(Scale).as("r"))
    for (i <- 1 to iterations) {
      val contrib = sym
        .join(rank.hint("SHUFFLE_HASH"), sym("src") === rank("node"))
        .selectExpr("dst", "(r * w) div wtot AS c")
        .groupBy("dst")
        .agg(sum(col("c")).as("csum"))
      rank = nodes
        .join(contrib.hint("SHUFFLE_HASH"), nodes("node") === contrib("dst"), "left")
        .selectExpr("node", s"$Teleport + (85 * coalesce(csum, 0L)) div 100 AS r")
      if (i % 8 == 0 && i < iterations) rank = rank.localCheckpoint()
    }
    val out = rank.select(col("node").as("concept_id"), col("r").as("rank_q")).localCheckpoint()
    sym.unpersist(false)
    nodes.unpersist(false)
    out
  }

  /** Personalized PageRank (random walk with restart): the teleport mass
    * returns to ONE seed node instead of spreading uniformly, so ranks
    * measure proximity to the seed — the "related entities" query over the
    * KG (the reference's related-concepts view is a one-hop neighbour list,
    * knowledge_graph/concept.py's related_concepts; PPR is its multi-hop
    * walk generalization).
    *
    * Same fixed-point device as [[run]] (longs, scale 2^32, floor
    * divisions identical in both engines):
    *
    *   r_0(v)     = [v = seed] * 2^32
    *   r_{t+1}(v) = [v = seed] * T + (85 * sum_{(u,v)} floor(r_t(u) * w / W_u)) div 100
    *
    * with T = (15 * 2^32) div 100. The seed is DATA-DERIVED but
    * deterministic and scale-free: argmax total incident weight, tie -> min
    * id (one 1-row aggregate broadcast — the [[ShortestPaths]] device; no
    * driver-side collect). Nodes the walk hasn't reached carry rank 0 —
    * kept as rows so the output grain is the node set, same as [[run]].
    *
    * Scale posture identical to [[run]]: static cached columnar edges
    * partitioned on src, per-iteration exchange is the rank vector only,
    * map-side-combined sums absorb hub fan-in, one lazy DAG. The extra
    * seed comparison is a broadcast of one row. */
  def personalized(edges: DataFrame, iterations: Int = 5, numParts: Int = 0): DataFrame = {
    val nP =
      if (numParts > 0) numParts
      else edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val symRaw = edges
      .select(col("concept_a").as("src"), col("concept_b").as("dst"), col("n_convs").as("w"))
      .union(
        edges.select(col("concept_b").as("src"), col("concept_a").as("dst"), col("n_convs").as("w")))
    val outw = symRaw.groupBy("src").agg(sum(col("w")).as("wtot"))
    val sym = symRaw
      .join(outw, Seq("src"))
      .repartition(nP, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = sym.select(col("src").as("node")).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    nodes.count()

    // seed = argmax total incident weight, tie -> min id; 1-row broadcast
    val seed = symRaw
      .groupBy("src")
      .agg(sum(col("w")).as("wtot"))
      .agg(min(struct((lit(0L) - col("wtot")).as("nw"), col("src"))).as("m"))
      .select(col("m.src").as("seed_node"))

    var rank = nodes
      .crossJoin(broadcast(seed))
      .selectExpr("node", s"IF(node = seed_node, ${Scale}L, 0L) AS r")
    for (i <- 1 to iterations) {
      val contrib = sym
        .join(rank.hint("SHUFFLE_HASH"), sym("src") === rank("node"))
        .selectExpr("dst", "(r * w) div wtot AS c")
        .groupBy("dst")
        .agg(sum(col("c")).as("csum"))
      rank = nodes
        .join(contrib.hint("SHUFFLE_HASH"), nodes("node") === contrib("dst"), "left")
        .crossJoin(broadcast(seed))
        .selectExpr(
          "node",
          s"IF(node = seed_node, ${Teleport}L, 0L) + (85 * coalesce(csum, 0L)) div 100 AS r")
      if (i % 8 == 0 && i < iterations) rank = rank.localCheckpoint()
    }
    val out = rank.select(col("node").as("concept_id"), col("r").as("rank_q")).localCheckpoint()
    sym.unpersist(false)
    nodes.unpersist(false)
    out
  }
}
