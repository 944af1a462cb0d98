package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * Scale posture: each iteration is one join of the rank vector against the
  * weighted edge list plus one sum-by-dst — the canonical distributed
  * PageRank shape. The rank vector is one long per node (tiny next to the
  * edges); edges are localCheckpoint-ed once so the co-occurrence subtree
  * (which re-derives mentions) executes exactly once, and each iteration's
  * rank vector is localCheckpoint-ed to truncate lineage — without it the
  * plan nests `iterations` shuffles of the full edge subtree (the CC loop
  * learned the same lesson). A hot hub node concentrates its *incoming*
  * contribution sum into one aggregation key; the sum is a partial-agg
  * (map-side combine) so the skew cost is one long per upstream partition,
  * not one row per edge.
  */
object PageRank {

  val Scale: Long = 1L << 32
  /** (15 * 2^32) div 100 — the constant teleport term. */
  val Teleport: Long = (15L * Scale) / 100L

  /** @param edges undirected weighted edges (concept_a, concept_b, n_convs);
    *              each pair listed once with concept_a < concept_b.
    * @return (concept_id, rank_q) — fixed-point rank, scale 2^32. */
  def run(edges: DataFrame, iterations: Int = 5): DataFrame = {
    val symRaw = edges
      .select(col("concept_a").as("src"), col("concept_b").as("dst"), col("n_convs").as("w"))
      .union(
        edges.select(col("concept_b").as("src"), col("concept_a").as("dst"), col("n_convs").as("w")))
      .localCheckpoint()
    val outw = symRaw.groupBy("src").agg(sum(col("w")).as("wtot"))
    // wtot is static — join it into the edge list ONCE, not once per
    // iteration (at 32M directed edges that join dominated the loop)
    val sym = symRaw.join(outw, Seq("src")).localCheckpoint()
    val nodes = sym.select(col("src").as("node")).distinct().localCheckpoint()

    var rank = nodes.select(col("node"), lit(Scale).as("r"))
    for (_ <- 1 to iterations) {
      val contrib = sym
        .join(rank, sym("src") === rank("node"))
        .selectExpr("dst", "(r * w) div wtot AS c")
        .groupBy("dst")
        .agg(sum(col("c")).as("csum"))
      rank = nodes
        .join(contrib, nodes("node") === contrib("dst"), "left")
        .selectExpr("node", s"$Teleport + (85 * coalesce(csum, 0L)) div 100 AS r")
        .localCheckpoint()
    }
    rank.select(col("node").as("concept_id"), col("r").as("rank_q"))
  }
}
