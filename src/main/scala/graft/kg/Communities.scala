package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Community detection over the concept co-occurrence graph via weighted
  * label propagation (Raghavan et al. 2007) — "which concepts form a topic
  * cluster", the mesoscale analytic between PageRank's global centrality
  * and the per-node triangle counts. The reference ranks concepts only
  * within one document (/root/reference/flows/aggregate.py:672-718); this
  * is the corpus-level grouping its KG consumers ask for next.
  *
  * Determinism contract (the whole point of this formulation): SYNCHRONOUS
  * updates, a FIXED iteration count, and an exact tie rule — node v adopts
  * the label maximizing the total incident edge weight held by its
  * neighbours, ties broken by MINIMUM label string. Every quantity is a
  * long sum or a string min, so the DuckDB oracle (the same recurrence
  * unrolled into per-iteration CTEs) reproduces the assignment bit-for-bit.
  * Classic async/randomized LPA converges faster but is seed-dependent —
  * useless for a hash-checked oracle and for reproducible production runs.
  *
  * Scale posture (same discipline as [[PageRank.run]], measured there at
  * 32M directed edges): the static weighted edge list lives in the
  * compressed COLUMNAR cache hash-partitioned on src, so per iteration only
  * the node-sized label vector moves; the (dst, label) weight aggregation
  * partial-aggregates map-side (a hub's incoming votes cost one row per
  * upstream partition per candidate label); the argmax is a single
  * min(struct(-weight, label)) aggregate — no window, no second join; the
  * loop is ONE lazy DAG with shuffle files as the inter-iteration
  * checkpoint (plan depth bounded by checkpointing every 8 rounds).
  */
object Communities {

  /** @param edges undirected weighted edges (concept_a, concept_b, n_convs),
    *              each pair once with concept_a < concept_b.
    * @return (concept_id, community) after `iterations` synchronous rounds;
    *         community = the adopted label (a concept id). */
  def labelPropagation(edges: DataFrame, iterations: Int = 4): DataFrame = {
    val sym = edges
      .select(col("concept_a").as("src"), col("concept_b").as("dst"), col("n_convs").as("w"))
      .union(
        edges.select(col("concept_b").as("src"), col("concept_a").as("dst"), col("n_convs").as("w")))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    sym.count() // materialize the static cache in one action

    // every node appears as dst (sym holds both directions), so each round's
    // aggregation re-derives the full node set — no left join needed
    var labels = sym.select(col("src").as("node"), col("src").as("label")).distinct()
    for (i <- 1 to iterations) {
      val votes = sym
        .join(labels.hint("SHUFFLE_HASH"), sym("src") === labels("node"))
        .groupBy(col("dst"), col("label"))
        .agg(sum(col("w")).as("ws"))
      labels = votes
        .groupBy(col("dst"))
        .agg(min(struct((lit(0L) - col("ws")).as("nws"), col("label"))).as("m"))
        .select(col("dst").as("node"), col("m.label").as("label"))
      if (i % 8 == 0 && i < iterations) labels = labels.localCheckpoint()
    }
    val out = labels.select(col("node").as("concept_id"), col("label").as("community"))
      .localCheckpoint()
    sym.unpersist(false)
    out
  }
}
