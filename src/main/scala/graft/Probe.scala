package graft

import org.apache.spark.sql.functions._

import graft.kg.KgPipeline

/** Dev micro-bench: decompose kgJob cost by stage at two parallelism levels. */
object Probe {
  /** Single-threaded extraction micro-bench on the same workload shape as
    * tools' reference-throughput script (20k 24-token texts, 13 concepts) —
    * the apples-to-apples single-core comparison recorded in
    * BENCH/BASELINE.md. */
  def micro(): Unit = {
    val rng = new java.util.Random(42)
    val conceptWords =
      "the fast key order sort table scan merge part window small hash join batch stream spark group query row data slow filter customer line value agg column big a vector"
        .split(" ")
    val vocab = conceptWords ++ (0 until 170).map(i => s"w${i}x")
    val texts = Array.fill(20000)(
      (0 until 24).map(_ => vocab(rng.nextInt(vocab.length))).mkString(" ")
    )
    val gaz = new graft.extract.Gazetteer(graft.kg.KgPipeline.defaultConcepts)
    // warm-up
    texts.take(2000).foreach(gaz.findAll)
    var spans = 0L
    val t0 = System.nanoTime()
    texts.foreach { t =>
      val all = gaz.findAll(t)
      var i = 0
      while (i < all.length) { spans += all(i).length; i += 1 }
    }
    val dt = (System.nanoTime() - t0) / 1e9
    // presence-only path
    texts.take(2000).foreach(gaz.findPresent)
    var edges = 0L
    val t1 = System.nanoTime()
    texts.foreach { t =>
      val p = gaz.findPresent(t)
      var i = 0
      while (i < p.length) { if (p(i)) edges += 1; i += 1 }
    }
    val dt1 = (System.nanoTime() - t1) / 1e9
    println(
      f"""[micro] {"texts":20000,"concepts":13,"spans":$spans,"span_grain_sec":$dt%.3f,"span_grain_turns_per_sec":${20000 / dt}%.1f,"edges":$edges,"presence_sec":$dt1%.3f,"presence_turns_per_sec":${20000 / dt1}%.1f}"""
    )
  }

  /** Bench-scale resumability demonstration: run the checkpointed mentions
    * stage over the synthetic transcripts, "kill" it after half the buckets,
    * resume, and compare cost + completeness. */
  def resumeDemo(path: String): Unit = {
    import org.apache.spark.sql.functions._
    val spark = Bench.session(32)
    val dir = "/tmp/graft_resume_demo_" + System.nanoTime()
    val turns = graft.kg.KgPipeline.eligibleTurns(spark.read.parquet(path))
    def stage(df: org.apache.spark.sql.DataFrame) =
      graft.kg.KgPipeline
        .extractMentionEdges(spark, df, graft.kg.KgPipeline.defaultConcepts)
        .join(df.select("conv_id", "bucket").distinct(), Seq("conv_id"))
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // simulated kill: only the first half of the buckets completes
    val firstHalf = turns
      .withColumn("bucket", graft.kg.Checkpoint.bucketCol("conv_id"))
      .where(col("bucket") < 32)
      .drop("bucket")
    val (n1, sec1) = t(graft.kg.Checkpoint.runResumable(spark, firstHalf, "conv_id", dir, "edges", "run1")(stage))
    val (n2, sec2) = t(graft.kg.Checkpoint.runResumable(spark, turns, "conv_id", dir, "edges", "run2")(stage))
    val (n3, sec3) = t(graft.kg.Checkpoint.runResumable(spark, turns, "conv_id", dir, "edges", "run3")(stage))
    val rows = spark.read.parquet(graft.kg.Checkpoint.dataPath(dir)).count()
    val direct = graft.kg.KgPipeline
      .extractMentionEdges(spark, turns, graft.kg.KgPipeline.defaultConcepts).count()
    println(
      f"[resume] run1(kill@50%%): $n1 buckets in $sec1%.1fs; resume: $n2 buckets in $sec2%.1fs; " +
        f"noop rerun: $n3 buckets in $sec3%.1fs; rows=$rows direct=$direct match=${rows == direct}"
    )
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("micro")) { micro(); return }
    if (args.headOption.contains("mh_ab")) {
      import org.apache.spark.sql.functions._
      val sfDir = args(1)
      val spark = Bench.session(32)
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      docs.count()
      def timeN(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          val n = df.count()
          println(f"[ab] $name%-14s run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
        }
      val expl = docs.select(col("doc_id"), explode(graft.data.Dedup.shingles("text")).as("shingle"))
      timeN("explode_only")(expl)
      timeN("sig_str32") {
        val aggs = (0 until 32).map(i => min(xxhash64(col("shingle"), lit(i))).as(s"mh_$i"))
        expl.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      }
      timeN("sig_base32")(graft.data.Dedup.minhashSignatures(docs, 32))
      spark.stop()
      return
    }
    if (args.headOption.contains("query")) {
      // time named SparkEntry queries: Probe query <sfDir> <name> [name...]
      val sfDir = args(1)
      val spark = Bench.session(32)
      spark.read.parquet(s"$sfDir/documents.parquet").count() // warm-up
      args.drop(2).foreach { name =>
        val fn = SparkEntry.queries(name)
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          println(f"[probe] $name%-24s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
        }
      }
      spark.stop()
      return
    }
    if (args.headOption.contains("resume")) {
      resumeDemo(if (args.length > 1) args(1) else "/tmp/graft_bench_transcripts_v2_16000000")
      return
    }
    val path = if (args.nonEmpty) args(0) else "/tmp/graft_bench_transcripts_v2_8000000"
    if (!Bench.parquetComplete(path)) {
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
