package graft

import org.apache.spark.sql.functions._

import graft.kg.KgPipeline

/** Dev micro-bench: decompose kgJob cost by stage at two parallelism levels. */
object Probe {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/graft_bench_transcripts_v2_8000000"
    if (!new java.io.File(path).exists()) {
      val s = Bench.session(32)
      graft.kg.Transcripts
        .synthesize(s, 8000000L, 40000L)
        .repartition(256)
        .write.mode("overwrite").parquet(path)
      s.stop()
    }
    Seq(8, 32).foreach { cpus =>
      val spark = Bench.session(cpus)
      def t(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] p$cpus $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      }
      val transcripts = spark.read.parquet(path)
      t("scan_count")(transcripts.count())
      t("scan_count_warm")(transcripts.count())
      val turns = KgPipeline.eligibleTurns(transcripts)
      t("eligible_turns")(turns.count())
      t("eligible_turns_warm")(turns.count())
      val mentions = KgPipeline.extractMentions(spark, turns, KgPipeline.defaultConcepts)
      t("mentions")(mentions.count())
      t("mentions_warm")(mentions.count())
      val mdf = KgPipeline.extractMentions(spark, turns, KgPipeline.defaultConcepts).toDF()
      t("mentions_distinct")(
        mdf.select(concat(col("conv_id"), lit("_"), col("turn_idx")).as("s"), col("concept_id"))
          .distinct()
          .count()
      )
      t("full_triples")(
        KgPipeline.triplesFromTurns(spark, turns, KgPipeline.defaultConcepts).count()
      )
      t("full_triples_warm")(
        KgPipeline.triplesFromTurns(spark, turns, KgPipeline.defaultConcepts).count()
      )
      spark.stop()
    }
  }
}
