package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge DataFrame — the
  * canonicalization primitive (J7 in SURVEY.md §2.6). GraphFrames-style
  * iterative DataFrame joins, no RDDs:
  *
  *   labels(node) <- node
  *   repeat: labels(node) <- min(labels(node), min over neighbours)
  *
  * Min-label propagation converges in O(graph diameter) rounds; entity-link
  * graphs (mention surface <-> concept bipartite plus concept hierarchy) have
  * tiny diameters, so this beats the constant-factor-heavy large-star/
  * small-star alternative while staying shuffle-bounded: each round is one
  * shuffle join keyed by node id. Skew (hot concepts like a "climate policy"
  * hub linked from millions of surfaces) is handled by AQE skew-join splitting
  * plus an optional salt that splits a hot node's neighbour aggregation into
  * `salt` partial mins before the final combine. `localCheckpoint` truncates
  * the lineage each round so plans don't grow with iteration count.
  */
object ConnectedComponents {

  /** edges: DataFrame with string columns (src, dst). Returns (node,
    * component) where component = lexicographically smallest reachable node
    * id. */
  def run(
      spark: SparkSession,
      edges: DataFrame,
      maxIterations: Int = 25,
      salt: Int = 8
  ): DataFrame = {
    val und = edges
      .select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = und
      .select(col("src").as("node"))
      .distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()

    var iteration = 0
    var converged = false
    while (!converged && iteration < maxIterations) {
      // neighbour min: two-level aggregation — salted partial min then final
      // min — so a hub node's updates don't all land in one reducer.
      val neighbourMin = und
        .join(labels.hint("shuffle_hash"), und("src") === labels("node"))
        .select(col("dst").as("node"), col("component"), (crc32(col("dst")) % salt).as("s"))
        .groupBy(col("node"), col("s"))
        .agg(min("component").as("component"))
        .groupBy("node")
        .agg(min("component").as("component"))

      val updated = labels
        .union(neighbourMin)
        .groupBy("node")
        .agg(min("component").as("component"))
        .localCheckpoint()

      val changed = updated
        .join(labels.withColumnRenamed("component", "old"), "node")
        .where(col("component") =!= col("old"))
        .limit(1)
        .count()

      labels = updated
      converged = changed == 0
      iteration += 1
    }
    labels
  }
}
