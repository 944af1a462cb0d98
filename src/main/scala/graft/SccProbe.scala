package graft

import org.apache.spark.sql.functions._

/** One-off diagnostic: the implication digraph's size and SCC round
  * structure at a given sf (not part of any frozen bench). */
object SccProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    SparkEntry.warmSharedCaches(spark, sfDir)
    val q = SparkEntry.queries
    val m = q("kg_mentions")(spark, sfDir)
    val marginals = m
      .select("conv_id", "concept_id")
      .distinct()
      .groupBy("concept_id")
      .agg(count(lit(1)).as("n"))
    val co = q("kg_cooccurrence")(spark, sfDir)
    val mx = co.agg(max(col("n_convs")).as("mx"))
    val strong = co
      .join(broadcast(mx))
      .where(col("n_convs") * 100 >= col("mx") * 85)
      .select("concept_a", "concept_b")
    val dig = graft.kg.Scc.implicationDigraph(strong, marginals)
    println(s"[probe] backbone edges=${strong.count()}, digraph edges=${dig.count()}")
    val e0 = dig
      .select(col("src").cast("string").as("src"), col("dst").cast("string").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
    println(s"[probe] distinct directed edges=${e0.count()}")
    e0.orderBy("src", "dst").show(100, false)
    val scc = graft.kg.Scc.run(spark, dig)
    scc.groupBy("scc_id").agg(count(lit(1)).as("n")).orderBy(desc("n")).show(30, false)
    spark.stop()
  }
}
