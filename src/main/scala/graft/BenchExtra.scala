package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.kg.KgPipeline

/** Extra benchmarks for the r6 optimization round (guide §1.4): noop-sink /
  * count isolation of the KG job's component passes, so the fusion work on
  * `tripleUnion` is driven by measurements instead of plan guesses. NOT part
  * of the frozen bench contract — the comparable record stays `graft.Bench`.
  *
  * Usage: sbt "runMain graft.BenchExtra [synthPath]"
  */
object BenchExtra {

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val synthPath =
      if (args.nonEmpty) args(0)
      else s"/tmp/graft_bench_transcripts_v2_${sys.env.getOrElse("SPARK_GRAFT_SYNTH_TURNS", "16000000")}"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def timeBoth(name: String)(mk: => DataFrame): Unit = {
      // warm-up + min-of-2, count AND noop actions
      val (_, w) = Bench.time(mk.count())
      val c = (1 to 2).map(_ => Bench.time(mk.count())._2).min
      val n = (1 to 2).map(_ => Bench.time(noop(mk))._2).min
      println(f"[extra] $name%-28s count=$c%7.3f s  noop=$n%7.3f s  (warm $w%.3f)")
    }

    val transcripts = spark.read.parquet(synthPath)
    val turns = KgPipeline.eligibleTurns(transcripts)

    timeBoth("scan+filter only") {
      turns.select(col("conv_id"), col("turn_idx"))
    }
    timeBoth("has_passage branch") {
      turns.select(
        col("conv_id").as("subj"),
        lit("HAS_PASSAGE").as("pred"),
        concat(col("conv_id"), lit("_"), col("turn_idx").cast("string")).as("obj"))
    }
    timeBoth("mention-edge branch") {
      val gaz = new graft.extract.Gazetteer(KgPipeline.defaultConcepts)
      turns.select(
        col("conv_id"),
        col("turn_idx").cast("int").as("turn_idx"),
        explode(graft.extract.expressions.extractConceptsPresent(col("text"), gaz)).as("concept_id"))
    }
    timeBoth("full tripleUnion") {
      KgPipeline.triplesFromTurns(spark, turns, KgPipeline.defaultConcepts)
    }
    spark.stop()
  }
}
