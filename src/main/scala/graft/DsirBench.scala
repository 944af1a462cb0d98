package graft

import org.apache.spark.sql.functions._

/** DSIR importance-weighting bench over the 1M-doc LSH corpus (reused from
  * DedupBench — 50-word docs, two planted near-dup tiers per base doc).
  * Target = every doc_id % 1000 == 0 base doc (1k exemplars); raw = the
  * rest. The planted SIGNAL: the near-dup siblings of target bases
  * (doc_id % 1000 in {8, 9}) share 44-48 of their 49 bigrams with a
  * target doc, so their per-bigram importance must beat the corpus
  * baseline by a clear margin — checked as a require, so the throughput
  * number can't be bought by a discrimination-free configuration.
  * 65536 buckets (the corpus carries ~49M bigram occurrences; bucket
  * occupancy ~750, target grams ~1 per bucket — ratios stay readable).
  * Prints one JSON line.
  *
  * Env: SPARK_GRAFT_DEDUP_N (default 1000000), SPARK_GRAFT_CPUS (32).
  */
object DsirBench {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_DEDUP_N", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus)

    val corpusPath = s"/tmp/graft_dedup_bench_$n"
    if (!Bench.parquetComplete(corpusPath))
      DedupBench.synthesize(spark, n).repartition(cpus * 4).write.mode("overwrite").parquet(corpusPath)
    val docs = spark.read.parquet(corpusPath)
    docs.count() // warm page cache

    val raw = docs.where(col("doc_id") % 1000 =!= 0)
    val target = docs.where(col("doc_id") % 1000 === 0)
    val (w, sec) = Bench.time {
      val r = graft.data.TextAnalysis
        .importanceWeights(raw, target, nBuckets = 65536)
        .localCheckpoint()
      r.count(); r
    }

    val perBigram = w.select(
      col("doc_id"),
      (col("score_q") / col("n_bigrams")).as("pb"),
      (col("doc_id") % 1000).isin(8, 9).as("sib"))
    val means = perBigram
      .groupBy("sib")
      .agg(avg(col("pb")).as("m"))
      .collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1))
      .toMap
    val ratio = means(true) / means(false)
    require(ratio > 1.2, f"sibling/baseline importance ratio $ratio%.3f too weak — no discrimination")

    println(
      f"""{"metric":"dsir_docs_per_sec","n_raw":${n - n / 1000},"n_target":${n / 1000},"sec":$sec%.3f,"docs_per_sec":${(n - n / 1000) / sec}%.1f,"sibling_baseline_ratio":$ratio%.3f}""")
    spark.stop()
  }
}
