package graft

import org.apache.spark.sql.functions._

/** Triangle-counting bench with ANALYTIC ground truth: a planted-clique
  * graph — `nBlocks` disjoint 10-cliques (every node closes exactly
  * C(9,2) = 36 triangles), consecutive cliques joined by one chain edge
  * and a hub node fanned into every clique's first node. The chain and
  * hub edges close exactly ONE extra triangle in the whole graph (the
  * n0-n9-n10 seam, because the hub sits inside block 0), so the truth is
  * fully analytic: all nodes at 36 except that seam's three corners at
  * 37. The hub stresses the degree-ordered orientation: its 200k
  * in-degree must cost nothing at wedge time. Prints one JSON line.
  *
  * Env: SPARK_GRAFT_TRI_BLOCKS (default 200000 -> 2M nodes, ~9.2M edges),
  * SPARK_GRAFT_CPUS (32).
  */
object TriangleBench {

  val CliqueSize = 10

  def main(args: Array[String]): Unit = {
    val nBlocks = sys.env.getOrElse("SPARK_GRAFT_TRI_BLOCKS", "200000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus)

    val path = s"/tmp/graft_tri_bench_$nBlocks"
    if (!Bench.parquetComplete(path)) {
      def nid(c: org.apache.spark.sql.Column) = concat(lit("n"), c.cast("string"))
      val cliquePairs = typedLit(
        for { i <- 0 until CliqueSize; j <- (i + 1) until CliqueSize } yield (i, j))
      val within = spark
        .range(nBlocks)
        .select(col("id").as("b"), explode(cliquePairs).as("p"))
        .select(
          nid(col("b") * CliqueSize + col("p._1")).as("concept_a"),
          nid(col("b") * CliqueSize + col("p._2")).as("concept_b"))
      // chain: last node of block b -> first node of block b+1
      val chain = spark
        .range(nBlocks - 1)
        .select(
          nid(col("id") * CliqueSize + (CliqueSize - 1)).as("concept_a"),
          nid((col("id") + 1) * CliqueSize).as("concept_b"))
      // hub: node 0 -> first node of every other block
      val hub = spark
        .range(1, nBlocks)
        .select(lit("n0").as("concept_a"), nid(col("id") * CliqueSize).as("concept_b"))
      within.union(chain).union(hub).repartition(cpus * 4).write.mode("overwrite").parquet(path)
    }

    val edges = spark.read.parquet(path)
    val nEdges = edges.count() // warm page cache

    val (tri, sec) = Bench.time {
      val t = graft.kg.Triangles.triangleCounts(edges).localCheckpoint()
      t.count(); t
    }
    val counts =
      tri.groupBy("n_triangles").agg(count(lit(1)).as("n")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exactly one extra triangle exists: n0-n9-n10 (clique edge n0-n9 +
    // chain edge n9-n10 + hub edge n0-n10) — the hub lives in block 0, so
    // only the block0->block1 seam closes; its three corners count 37
    require(
      counts == Map(36L -> (nBlocks * CliqueSize - 3), 37L -> 3L),
      s"expected all nodes at 36 except the n0-n9-n10 seam at 37, got $counts")

    println(
      f"""{"metric":"triangle_edges_per_sec","n_nodes":${nBlocks * CliqueSize},"n_edges":$nEdges,"sec":$sec%.3f,"edges_per_sec":${nEdges / sec}%.1f,"analytic_counts_ok":true}""")
    spark.stop()
  }
}
