package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Bounded weighted shortest paths over the concept co-occurrence graph —
  * the weighted sibling of [[KgPipeline.kHopNeighborhood]]'s min-hop BFS:
  * "how strongly is every concept connected to the corpus's central
  * concept", where traversing a strong edge is cheap and a weak one
  * expensive.
  *
  * Edge cost is the exact integer 10^6 div weight (strong co-occurrence →
  * low cost), and the algorithm is Bellman-Ford bounded to `maxHops`
  * relaxation rounds: after round r, dist(v) is EXACTLY the minimum cost
  * over all walks from the seed using ≤ r edges — a closed-form the DuckDB
  * oracle reproduces independently with a recursive-CTE walk enumeration
  * (bounded by hops, so it terminates despite cycles) + a MIN rollup. All
  * arithmetic is long adds/mins: order-free, hash-comparable.
  *
  * The seed is DATA-DERIVED but deterministic and scale-free: the node with
  * the maximum total incident weight (tie → min id) — a one-row aggregate,
  * no driver-side collect, same device as the link-prediction backbone
  * threshold.
  *
  * Scale posture: the static cost-edge list is cached columnar and
  * hash-partitioned on src (only the frontier-sized dist vector moves per
  * round); each relaxation is join → map-side-combined min aggregation;
  * the dist merge is a union + min groupBy (partial-agg, no full outer
  * join); the loop is one lazy DAG, checkpointed every 8 rounds for deep
  * traversals. Unreached nodes carry no row (dist would be +inf).
  */
object ShortestPaths {

  val CostScale: Long = 1000000L

  /** @param edges undirected weighted edges (concept_a, concept_b, n_convs),
    *              each pair once with concept_a < concept_b.
    * @return (concept_id, dist_q) for every node reachable from the
    *         max-strength seed within `maxHops` edges. */
  def fromStrongestNode(edges: DataFrame, maxHops: Int = 3, numParts: Int = 0): DataFrame = {
    val nP =
      if (numParts > 0) numParts
      else edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sym = edges
      .select(col("concept_a").as("src"), col("concept_b").as("dst"), col("n_convs").as("w"))
      .union(
        edges.select(col("concept_b").as("src"), col("concept_a").as("dst"), col("n_convs").as("w")))
      .select(col("src"), col("dst"), expr(s"$CostScale div w").as("cost"))
      .repartition(nP, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    sym.count()

    // seed = argmax total incident weight, tie min id — a 1-row aggregate
    val seed = edges
      .select(col("concept_a").as("node"), col("n_convs").as("w"))
      .union(edges.select(col("concept_b").as("node"), col("n_convs").as("w")))
      .groupBy("node")
      .agg(sum(col("w")).as("wtot"))
      .agg(min(struct((lit(0L) - col("wtot")).as("nw"), col("node"))).as("m"))
      .select(col("m.node").as("node"), lit(0L).as("d"))

    var dist = seed
    for (r <- 1 to maxHops) {
      val relaxed = sym
        .join(dist.hint("SHUFFLE_HASH"), sym("src") === dist("node"))
        .select(col("dst").as("node"), (col("d") + col("cost")).as("d"))
      dist = dist
        .union(relaxed)
        .groupBy("node")
        .agg(min(col("d")).as("d"))
      if (r % 8 == 0 && r < maxHops) dist = dist.localCheckpoint()
    }
    val out = dist.select(col("node").as("concept_id"), col("d").as("dist_q")).localCheckpoint()
    sym.unpersist(false)
    out
  }
}
