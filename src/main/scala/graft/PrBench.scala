package graft

import org.apache.spark.sql.functions._

/** PageRank-only bench: 5 fixed-point iterations over the two CcBench
  * graphs (uniform 1000-node blocks; one-hub-holds-50%-of-edges skew), so
  * the analytics leg can be measured and iterated on without re-running
  * the ~15-minute CC legs. Same structural truths as CcBench's PageRank
  * legs: rank-mass bounds on the block graph, hub-tops-ranking on the skew
  * graph. Prints one JSON line.
  *
  * Env: SPARK_GRAFT_CC_NODES (default 8000000), SPARK_GRAFT_CPUS (32).
  */
object PrBench {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_CC_NODES", "8000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus)

    val path = s"/tmp/graft_cc_bench_$n"
    if (!Bench.parquetComplete(path))
      CcBench.synthesize(spark, n).repartition(cpus * 4).write.mode("overwrite").parquet(path)
    val skewPath = s"/tmp/graft_cc_bench_skew_$n"
    if (!Bench.parquetComplete(skewPath)) {
      def nid(c: org.apache.spark.sql.Column) = concat(lit("n"), c.cast("string"))
      val ids = spark.range(n)
      val chain = ids
        .where(col("id") % 100 =!= 99L)
        .select(nid(col("id")).as("src"), nid(col("id") + 1).as("dst"))
      val hub = ids.where(col("id") > 0).select(nid(col("id")).as("src"), lit("n0").as("dst"))
      chain.union(hub).repartition(cpus * 4).write.mode("overwrite").parquet(skewPath)
    }

    def leg(p: String): (org.apache.spark.sql.DataFrame, Long, Double) = {
      val edges = spark.read.parquet(p)
      val nEdges = edges.count() // warm page cache
      val (pr, sec) = Bench.time {
        val r = graft.kg.PageRank
          .run(
            edges
              .where(col("src") =!= col("dst"))
              .select(col("src").as("concept_a"), col("dst").as("concept_b"), lit(1L).as("n_convs")),
            iterations = 5)
          .localCheckpoint()
        r.count(); r
      }
      (pr, nEdges, sec)
    }

    val (pr, nEdges, sec) = leg(path)
    val agg = pr.agg(sum(col("rank_q")), count(lit(1))).collect()(0)
    require(agg.getLong(0) <= agg.getLong(1) * graft.kg.PageRank.Scale, "mass above initial")
    require(agg.getLong(0) >= agg.getLong(1) * graft.kg.PageRank.Teleport, "mass below teleport floor")

    val (hubPr, sEdges, hubSec) = leg(skewPath)
    val top = hubPr.orderBy(col("rank_q").desc).limit(1).collect()(0)
    require(top.getString(0) == "n0", s"hub must top the ranking, got ${top.getString(0)}")

    println(
      f"""{"metric":"pagerank_edge_traversals_per_sec","iters":5,"block":{"n_edges":$nEdges,"sec":$sec%.3f,"edge_traversals_per_sec":${5L * nEdges / sec}%.1f,"mass_bounds_ok":true},"skew_hub":{"n_edges":$sEdges,"sec":$hubSec%.3f,"edge_traversals_per_sec":${5L * sEdges / hubSec}%.1f,"hub_top":true}}""")
    spark.stop()
  }
}
