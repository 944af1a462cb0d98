package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Strongly connected components of a DIRECTED concept graph — the cyclic
  * sibling of [[ConnectedComponents]]: nodes are in one SCC iff each
  * reaches the other along directed edges. Directedness enters this engine
  * through the implication digraph ([[implicationDigraph]]): a
  * co-occurrence edge points from the RARER concept to the more frequent
  * one (the association-rule confidence direction, conf(a→b) = n_ab/n_a >
  * conf(b→a) iff n_a < n_b — specific implies general), with
  * equal-frequency pairs mutual. SCCs of that digraph are clusters of
  * mutually-implicative concepts; the condensation is the
  * specific-to-general DAG.
  *
  * Algorithm: forward-backward coloring (Orzan 2004; the standard
  * label-propagation SCC shape for bulk-synchronous engines — Slota et
  * al.'s trim-FWBW and Pregel SCC are the same skeleton):
  *
  *   1. forward phase — propagate the MINIMUM reaching node id along
  *      edges to fixpoint: c(v) = min id with c-source →* v. A root r has
  *      c(r) = r. If w ∈ SCC(r) then c(w) = r (any smaller id reaching w
  *      would reach r through w — contradiction), so each color class
  *      contains its root's whole SCC.
  *   2. backward phase — BFS from the roots along REVERSED edges,
  *      restricted to the root's own color class: the reached set is
  *      exactly {v : c(v) = r ∧ v →* r} = SCC(r).
  *   3. peel the settled SCCs, repeat on the remainder (each round
  *      settles ≥ 1 SCC per color class; acyclic regions settle in one).
  *
  * Every phase is the audited iterate-join shape: static edge relation
  * filtered to the active set per outer round, per inner round ONE
  * SHUFFLE_HASH join exchanging only the (node, label) vector + a
  * min/exists partial-agg, serialized localCheckpoint lineage truncation.
  * Inner fixpoints are detected by a 1-row change count; the outer loop
  * raises LOUDLY on maxRounds exhaustion ([[KCore]]'s posture) instead of
  * returning a partial assignment.
  *
  * Scale posture: label relations are node-grain (dictionary-sized here —
  * the corpus enters only through pre-aggregated co-occurrence counts),
  * edges are scanned once per inner round. Worst-case outer rounds is the
  * longest chain of SCCs sharing one color class; the published mitigation
  * (trim degree-0 nodes first, multi-pivot) drops in as a pre-filter
  * without changing the loop body.
  */
object Scc {

  /** The implication digraph over the strong-edge backbone: each
    * undirected co-occurrence pair (a, b) emits a→b when n_a ≤ n_b and
    * b→a when n_b ≤ n_a (both — a mutual pair — on equal marginals), with
    * n_x = the number of conversations mentioning x. Marginals join the
    * dictionary-grain pair relation; nothing corpus-grain moves. */
  def implicationDigraph(pairs: DataFrame, marginals: DataFrame): DataFrame = {
    val withN = pairs
      .join(marginals.select(col("concept_id").as("concept_a"), col("n").as("n_a")), Seq("concept_a"))
      .join(marginals.select(col("concept_id").as("concept_b"), col("n").as("n_b")), Seq("concept_b"))
    val ab = withN.where(col("n_a") <= col("n_b"))
      .select(col("concept_a").as("src"), col("concept_b").as("dst"))
    val ba = withN.where(col("n_b") <= col("n_a"))
      .select(col("concept_b").as("src"), col("concept_a").as("dst"))
    ab.union(ba)
  }

  /** Condensation of the digraph: the DAG whose nodes are the SCCs —
    * one row per distinct (scc_src, scc_dst) pair with an edge between
    * members of different components. Over the implication digraph this
    * is the specific-to-general concept hierarchy the cycle clusters roll
    * up into. Cost on top of [[run]]: two dictionary-grain joins + one
    * distinct. */
  def condensation(spark: SparkSession, edges: DataFrame): DataFrame = {
    // one lazy checkpoint of the input: `run` materializes it while building
    // its own edge relation, and the two endpoint joins below then read the
    // cache instead of re-running the (possibly expensive) digraph plan —
    // the kg_condensation query recomputed the marginals joins post-SCC
    val ein = edges.localCheckpoint(false)
    val scc = run(spark, ein)
    ein
      .join(scc.select(col("node").as("src"), col("scc_id").as("scc_src")), Seq("src"))
      .join(scc.select(col("node").as("dst"), col("scc_id").as("scc_dst")), Seq("dst"))
      .where(col("scc_src") =!= col("scc_dst"))
      .select("scc_src", "scc_dst")
      .distinct()
  }

  /** @param edges directed edges (src, dst); self-loops ignored.
    * @return (node, scc_id) for every node appearing in `edges`,
    *         scc_id = min node id of the component. */
  def run(
      spark: SparkSession,
      edges: DataFrame,
      maxOuterRounds: Int = 50,
      maxInnerRounds: Int = 200
  ): DataFrame = {
    // Spark 4.1's UnionBase.rewriteConstraints throws NoSuchElementException
    // ("key not found: node#N") when a union child is a projected join whose
    // inherited constraints mention pruned attributes — exactly the
    // frontier-union shape every round here builds. Constraint propagation
    // buys nothing in these equi-join loops (no derivable filters), so it is
    // disabled for the duration of the run and restored after.
    val cpKey = "spark.sql.constraintPropagation.enabled"
    val cpPrev = spark.conf.get(cpKey, "true")
    spark.conf.set(cpKey, "false")
    try runInner(spark, edges, maxOuterRounds, maxInnerRounds)
    finally spark.conf.set(cpKey, cpPrev)
  }

  private def runInner(
      spark: SparkSession,
      edges: DataFrame,
      maxOuterRounds: Int,
      maxInnerRounds: Int
  ): DataFrame = {
    import spark.implicits._
    // Job-count discipline (r6): every fixpoint round below runs exactly ONE
    // Spark job — each round's relation is LAZILY localCheckpointed (logical
    // plan truncated immediately, physical planning done here under the
    // constraint-propagation override) and the round's loop-control count is
    // the action that materializes it. The r5 shape ran 2-3 jobs per round
    // (eager checkpoint + separate convergence count) — at dictionary grain
    // that was 175+ driver-bound jobs per SCC run (~10 ms planning gap each,
    // half the query's wall clock); at production grain the fusion saves the
    // same per-round scheduling latency without changing any shuffle.
    val e0 = edges
      .select(col("src").cast("string").as("src"), col("dst").cast("string").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint() // eager: the input subtree (digraph build) runs once
    val allNodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(false)

    var active = allNodes // nodes not yet assigned
    var activeEdges = e0
    var settled: DataFrame = Seq.empty[(String, String)].toDF("node", "scc_id")
    var outer = 0
    var activeCount = active.count()

    while (activeCount > 0) {
      outer += 1
      require(
        outer <= maxOuterRounds,
        s"SCC coloring did not settle within $maxOuterRounds outer rounds ($activeCount nodes left)")

      // ---- trim phase: a node with no incoming or no outgoing ACTIVE edge
      // is a singleton SCC (scc_id = itself) — peel those iteratively
      // before coloring. FW-BW coloring settles only each color root's SCC
      // per outer round, which degenerates to one-node-per-round on
      // DAG-like regions (and the implication digraph is mostly acyclic);
      // trim settles those regions at ONE cheap job per round, eating the
      // graph from both ends at once, and leaves only the cyclic cores to
      // the coloring — the published trim-FWBW composition (Slota et al.),
      // here enacted rather than only cited as the drop-in mitigation.
      var trimmed = 1L
      var trimRounds = 0
      while (trimmed > 0 && activeCount > 0) {
        trimRounds += 1
        require(trimRounds <= maxInnerRounds, s"SCC trim phase exceeded $maxInnerRounds rounds")
        val keep = active
          .join(activeEdges.select(col("dst").as("node")), Seq("node"), "left_semi")
          .join(activeEdges.select(col("src").as("node")), Seq("node"), "left_semi")
          .localCheckpoint(false)
        val keepCount = keep.count() // materializes the round — its one job
        trimmed = activeCount - keepCount
        if (trimmed > 0) {
          val singles = active
            .join(keep, Seq("node"), "left_anti")
            .select(col("node"), col("node").as("scc_id"))
          settled = settled.union(singles).localCheckpoint(false)
          active = keep
          activeEdges = activeEdges
            .join(active.select(col("node").as("src")), Seq("src"), "left_semi")
            .join(active.select(col("node").as("dst")), Seq("dst"), "left_semi")
            .select("src", "dst")
            .localCheckpoint(false)
          activeCount = keepCount
        }
      }
      if (activeCount > 0) {

      // ---- forward phase: min reaching id to fixpoint --------------------
      // color starts as a projection of the materialized active set (cheap
      // on every re-read — no checkpoint needed)
      // the carry-forward rows are tagged 0, neighbour contributions 1, so
      // ONE aggregation yields both the new color (min over all) and the
      // old color (min over tag-0 rows) — the convergence test is then a
      // filter over the materialized round, not a join back to the
      // previous color (one fewer join + broadcast build per round)
      var color = active.select(col("node"), col("node").as("c"))
      var changed = 1L
      var inner = 0
      while (changed > 0) {
        inner += 1
        require(inner <= maxInnerRounds, s"SCC forward phase exceeded $maxInnerRounds rounds")
        val next = color
          .join(activeEdges, col("node") === col("src"))
          .select(col("dst").as("node"), col("c"), lit(1).as("tag"))
          .union(color.select(col("node"), col("c"), lit(0).as("tag")))
          .groupBy("node")
          .agg(min(col("c")).as("c"), min(when(col("tag") === 0, col("c"))).as("c_old"))
          .localCheckpoint(false)
        // this count materializes `next` — the round's one job
        changed = next.where(col("c") =!= col("c_old")).count()
        color = next.select(col("node"), col("c"))
      }

      // ---- backward phase: reverse-BFS from roots inside their color ----
      // seed: the roots themselves (c(r) = r); frontier carries the color,
      // expansion stays within it, so each reached node's SCC id is its c.
      // `reached` accumulates as a lazy union of the materialized frontier
      // checkpoints — recomputing it is a cached-block scan, never a join.
      val roots = color.where(col("node") === col("c"))
      var reached = roots
      var frontier = roots
      var frontierCount = frontier.count()
      while (frontierCount > 0) {
        val step = frontier
          .join(activeEdges, col("node") === col("dst"))
          .select(col("src").as("node"), col("c"))
          .join(color.withColumnRenamed("c", "c_node"), Seq("node"))
          .where(col("c") === col("c_node")) // stay inside the color class
          .select("node", "c")
          .distinct()
        frontier = step.join(reached, Seq("node", "c"), "left_anti").localCheckpoint(false)
        frontierCount = frontier.count() // materializes the frontier — one job
        if (frontierCount > 0) reached = reached.union(frontier).localCheckpoint(false)
      }

      val newlySettled = reached.select(col("node"), col("c").as("scc_id"))
      settled = settled.union(newlySettled).localCheckpoint(false)
      active = active.join(newlySettled, Seq("node"), "left_anti").localCheckpoint(false)
      activeEdges = activeEdges
        .join(active.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(active.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .select("src", "dst")
        .localCheckpoint(false)
      activeCount = active.count() // materializes the new active set
      } // end cyclic-core FW-BW (skipped when trim finished the graph)
    }
    // consumers (condensation) reference the assignment twice — hand back a
    // truncated plan whose first action materializes it once
    settled.localCheckpoint(false)
  }
}
