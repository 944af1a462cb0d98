package graft.kg

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Resumable execution with per-partition lineage — the Spark answer to the
  * reference's S3-existence incremental skip (F3,
  * /root/reference/flows/inference.py:305-358) and run-metadata files (S12,
  * inference.py:1195-1256).
  *
  * Work is keyed into `nBuckets` stable buckets by xxhash64(conv_id). A stage
  * run writes its output partitioned by bucket and appends one lineage row
  * per bucket (row counts + key range + run id) to `<dir>/lineage`. A
  * re-run anti-joins the input against already-completed buckets, so a killed
  * run resumes at bucket granularity and completed buckets are never
  * recomputed. Bucket ids are content-derived (not partition indices), so
  * resume is stable across different parallelism levels and cluster sizes.
  */
object Checkpoint {

  val DefaultBuckets = 64

  def bucketCol(keyCol: String, nBuckets: Int = DefaultBuckets) =
    pmod(xxhash64(col(keyCol)), lit(nBuckets.toLong)).cast("int").as("bucket")

  def lineagePath(dir: String) = s"$dir/lineage"
  def dataPath(dir: String) = s"$dir/data"

  /** Buckets already completed in a previous (possibly killed) run. */
  def completedBuckets(spark: SparkSession, dir: String, stage: String): Set[Int] = {
    val path = new org.apache.hadoop.fs.Path(lineagePath(dir))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Set.empty
    else
      spark.read
        .parquet(lineagePath(dir))
        .where(col("stage") === stage && col("status") === "ok")
        .select("bucket")
        .distinct()
        .collect()
        .map(_.getInt(0))
        .toSet
  }

  /** Completed buckets that are also FRESH w.r.t. the source: the reference
    * reprocesses a document whose result predates its text extraction
    * (`inference_date < text_extraction_date`, flows/inference.py:305-358).
    * The bucket-grain equivalent compares the max source `lastModified` the
    * completing run RECORDED (`max_src_ts` on its lineage row) with the
    * current per-bucket max — no wall clocks, pure source-data timestamps. A
    * completed bucket whose source has since gained a newer row is stale and
    * drops out of the skip set. The current-max aggregation is
    * metadata-scale work (one map-side-combined agg; the statistics an
    * Iceberg snapshot would serve for free — the reference pays the same
    * cost as an S3 list of every source key's LastModified). */
  def freshBuckets(
      spark: SparkSession,
      dir: String,
      stage: String,
      bucketedInput: DataFrame,
      lastModifiedCol: String
  ): Set[Int] = {
    val path = new org.apache.hadoop.fs.Path(lineagePath(dir))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return Set.empty
    val seen = spark.read
      .parquet(lineagePath(dir))
      .where(col("stage") === stage && col("status") === "ok")
      .groupBy("bucket")
      .agg(max(col("max_src_ts")).as("seen_ts"))
    val cur = bucketedInput
      .groupBy("bucket")
      .agg(max(unix_timestamp(col(lastModifiedCol))).as("cur_ts"))
    seen
      .join(cur, Seq("bucket"))
      .where(col("seen_ts").isNotNull && col("seen_ts") >= col("cur_ts"))
      .select("bucket")
      .collect()
      .map(_.getInt(0))
      .toSet
  }

  /** Run `stage` over the not-yet-completed buckets of `input`, appending
    * bucket-partitioned output plus lineage rows. Returns the number of
    * buckets processed this run. The stage function must preserve the
    * `bucket` column (it is derived from the key, so any per-key transform
    * keeps it). When `lastModifiedCol` is given (a timestamp column on the
    * input), completed-but-STALE buckets — source rows newer than what the
    * completing run saw — are reprocessed too (F3's timestamp predicate). */
  def runResumable(
      spark: SparkSession,
      input: DataFrame,
      keyCol: String,
      dir: String,
      stage: String,
      runId: String,
      nBuckets: Int = DefaultBuckets,
      lastModifiedCol: Option[String] = None
  )(transform: DataFrame => DataFrame): Int = {
    val t0 = System.nanoTime()
    val bucketed = input.withColumn("bucket", bucketCol(keyCol, nBuckets))
    val done = lastModifiedCol match {
      case None     => completedBuckets(spark, dir, stage)
      case Some(ts) => freshBuckets(spark, dir, stage, bucketed, ts)
    }
    val todo =
      if (done.isEmpty) bucketed
      else bucketed.where(!col("bucket").isin(done.toSeq: _*))

    if (todo.isEmpty) return 0

    val out = transform(todo)
    require(out.columns.contains("bucket"), s"stage $stage dropped the bucket column")

    // dynamic partition OVERWRITE, not append: if a run dies after the data
    // commit but before the lineage write, the bucket has no 'ok' row and
    // will be reprocessed — overwrite makes that reprocessing idempotent
    // (the rewritten bucket partitions replace the orphaned ones) instead of
    // silently duplicating rows
    out.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(dataPath(dir))

    // lineage: one row per processed bucket, written AFTER the data commit so
    // a bucket is only marked ok once its output is durable. The read-back is
    // partition-PRUNED to the literal set of buckets processed this run (<=
    // nBuckets ints on the driver) — a resume run re-reads only its own
    // increment, never the accumulated output of every earlier run.
    val ids = todo.select("bucket").distinct().collect().map(_.getInt(0)).sorted
    val written = spark.read
      .parquet(dataPath(dir))
      .where(col("bucket").isin(ids.toSeq: _*))
    // the max source timestamp each processed bucket was derived from — what
    // freshBuckets compares against on the next run (null when staleness
    // tracking is off; the column is always present so lineage appends from
    // both modes share one schema)
    val srcTs = lastModifiedCol match {
      case Some(ts) => todo.groupBy("bucket").agg(max(unix_timestamp(col(ts))).as("max_src_ts"))
      case None     => todo.select("bucket").distinct().withColumn("max_src_ts", lit(null).cast("long"))
    }
    val lineage = written
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(keyCol)).cast("string").as("min_key"),
        max(col(keyCol)).cast("string").as("max_key")
      )
      .join(srcTs, Seq("bucket"), "left")
      .withColumn("stage", lit(stage))
      .withColumn("run_id", lit(runId))
      .withColumn("status", lit("ok"))
      // run-level METRICS ride on every bucket row (S12: the reference's
      // run-metadata files carry wall time + batch counts,
      // inference.py:1195-1256): how long this run took up to the data
      // commit and how many buckets it processed — enough to reconstruct
      // per-run throughput from the lineage table alone
      .withColumn("run_wall_sec", lit((System.nanoTime() - t0) / 1e9))
      .withColumn("n_buckets_in_run", lit(ids.length))

    lineage.write.mode(SaveMode.Append).parquet(lineagePath(dir))
    ids.length
  }
}
