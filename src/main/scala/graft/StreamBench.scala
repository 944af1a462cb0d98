package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.kg.{KgPipeline, Transcripts}
import graft.streaming.StreamingIngest

/** Streaming-path throughput: the stateful incremental-mention-edge operator
  * (flatMapGroupsWithState dedup state per conversation) driven by a bounded
  * file stream over the same synthetic transcripts parquet the batch bench
  * uses. Reports turns/sec through the full stateful pipeline — the number
  * to compare against the batch path's triples/sec (state-store maintenance
  * is the expected gap). Prints one JSON line.
  *
  * Env: SPARK_GRAFT_STREAM_TURNS (default 4000000),
  *      SPARK_GRAFT_CPUS (default 32),
  *      SPARK_GRAFT_FILES_PER_TRIGGER (default 32).
  */
object StreamBench {

  val schema: StructType = StructType(
    Seq(
      StructField("conv_id", StringType),
      StructField("turn_idx", IntegerType),
      StructField("role", StringType),
      StructField("text", StringType),
      StructField("tool", StringType),
      StructField("ts", TimestampType)
    )
  )

  private def deleteRecursively(path: String): Unit = {
    val root = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverseIterator
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  def main(args: Array[String]): Unit = {
    val nTurns = sys.env.getOrElse("SPARK_GRAFT_STREAM_TURNS", "4000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val filesPerTrigger = sys.env.getOrElse("SPARK_GRAFT_FILES_PER_TRIGGER", "32").toInt
    val spark: SparkSession = Bench.session(cpus)
    // many-micro-batch runs would otherwise rotate numInputRows out of
    // recentProgress (default cap 100) and under-count throughput
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
    // SPARK_GRAFT_ROCKSDB=1: the production state-store backend (bounded
    // executor memory at 10^9-conversation state; rocksdbjni ships with
    // Spark) — the operator code is identical, only this conf changes
    // SPARK_GRAFT_TWS=1: the transformWithState operator (MapState point
    // lookups instead of whole-value state rows) — requires RocksDB
    val tws = sys.env.getOrElse("SPARK_GRAFT_TWS", "0") == "1"
    val rocksdb = tws || sys.env.getOrElse("SPARK_GRAFT_ROCKSDB", "0") == "1"
    if (rocksdb)
      spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      )

    // turns per conversation sizes the per-key accumulated state — the lever
    // that decides flatMapGroupsWithState (whole-value) vs transformWithState
    // (point-lookup) economics
    val turnsPerConv = sys.env.getOrElse("SPARK_GRAFT_TURNS_PER_CONV", "200").toLong
    val inputPath = s"/tmp/graft_stream_bench_${nTurns}_tpc$turnsPerConv"
    if (!Bench.parquetComplete(inputPath)) {
      Transcripts
        .synthesize(spark, nTurns, nConvs = nTurns / turnsPerConv)
        .repartition(128)
        .write
        .mode("overwrite")
        .parquet(inputPath)
    }

    // one state-store shard per core: the batch bench's 4x-cores shuffle
    // sizing is wrong for streaming — every extra partition is an extra
    // state-store instance paying per-batch commit (delta file + fsync)
    // overhead, and 128 shards for 20k conversations quadruples the commit
    // wall time without adding parallelism
    spark.conf.set("spark.sql.shuffle.partitions", cpus.toString)
    // state-store commits are many small delta files — tmpfs if available
    val ckptBase = {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) java.nio.file.Paths.get("/dev/shm")
      else java.nio.file.Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    }
    val ckpt = java.nio.file.Files.createTempDirectory(ckptBase, "graft_stream_ckpt").toString
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(inputPath)

    // warm-up: run the identical pipeline over a small slice with its own
    // checkpoint and discard it — the first micro-batch otherwise pays the
    // whole pipeline's JIT + codegen + state-store class-loading (~5s) and
    // the bench under-reports steady-state throughput (same discipline as
    // the batch bench's warm-up run)
    locally {
      val warmCkpt = java.nio.file.Files.createTempDirectory(ckptBase, "graft_stream_warm").toString
      val warmStream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "8").parquet(inputPath)
      val op: (org.apache.spark.sql.SparkSession, org.apache.spark.sql.DataFrame, Vector[graft.core.Concept], String) => org.apache.spark.sql.Dataset[graft.streaming.TripleEdge] =
        if (tws) StreamingIngest.incrementalMentionEdgesTws(_, _, _, _)
        else StreamingIngest.incrementalMentionEdges(_, _, _, _)
      val warmEdges = op(spark, warmStream.limit(200000), KgPipeline.defaultConcepts, "30 days")
      val wq = warmEdges.writeStream
        .format("noop")
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", warmCkpt)
        .start()
      // one trigger is enough to JIT the whole path
      var waited = 0
      while (wq.recentProgress.isEmpty && waited < 600) { Thread.sleep(100); waited += 1 }
      wq.stop()
      deleteRecursively(warmCkpt)
    }
    // the synthetic event times span ~10 days and files arrive in random
    // event-time order, so the watermark delay must cover the WHOLE span:
    // a short delay would silently drop most rows as late before they ever
    // reach the state store, and the bench would measure the filter, not
    // the stateful operator
    val edges =
      if (tws)
        StreamingIngest.incrementalMentionEdgesTws(spark, stream, KgPipeline.defaultConcepts, "30 days")
      else StreamingIngest.incrementalMentionEdges(spark, stream, KgPipeline.defaultConcepts, "30 days")
    val query = edges.writeStream
      .format("noop")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .start()

    val t0 = System.nanoTime()
    query.processAllAvailable()
    val sec = (System.nanoTime() - t0) / 1e9
    val progress = query.recentProgress
    val inputRows = progress.map(_.numInputRows).sum
    val batches = progress.length
    query.stop()

    // checkpoints live on tmpfs (RAM): clean up or repeated bench runs fill /dev/shm
    deleteRecursively(ckpt)
    if (sys.env.getOrElse("SPARK_GRAFT_STREAM_DEBUG", "0") == "1")
      progress.foreach(p => println(s"[stream-progress] ${p.json}"))
    val json =
      f"""{"metric":"stream_turns_per_sec","turns":$nTurns,"input_rows":$inputRows,"batches":$batches,"sec":$sec%.3f,"turns_per_sec":${inputRows / sec}%.1f,"files_per_trigger":$filesPerTrigger,"state_store":"${if (rocksdb) "rocksdb" else "hdfs"}","operator":"${if (tws) "transformWithState" else "flatMapGroupsWithState"}","turns_per_conv":$turnsPerConv}"""
    println(json)
    spark.stop()
  }
}
