package graft.data

import org.apache.spark.sql.DataFrame

/** Parallelism repair for CPU-dense, byte-light stages (r6 guide §2).
  *
  * Byte-based input splitting undercounts per-row transform work by orders
  * of magnitude: a compact parquet corpus whose rows fan out into n-gram /
  * hash / signature construction arrives as one 128 MB-split and the whole
  * build runs single-core (profiled at sf0.1: 0.4-0.8 s single-task stages
  * in the sketch/signature family). `fanOut` round-robins such an input to
  * the session parallelism ONLY when it arrives narrower — at corpus scale
  * the scan is already wide and no extra shuffle is paid, so the device is
  * scale-adaptive rather than a local-mode constant (the conditional twin
  * of the pinned repartition verifyJaccard documents).
  */
object Par {

  /** Repartition `df` for CPU-dense work iff it currently has fewer
    * partitions than the input's own size warrants. The target is derived
    * from the optimizer's size estimate (~32 KB of input bytes per
    * partition — transform work per input byte runs ~100x a plain scan's),
    * clamped to the session shuffle parallelism: a 1.5 MB sf0.1 corpus
    * fans out to ~20 tasks (not 128 overhead-only ones — measured: conf-
    * wide fan-out cost more in task scheduling and downstream cached-scan
    * width than the parallelism won back), a production corpus hits the
    * clamp, and an already-wide scan is untouched. Call on a narrow
    * projection so the conditional shuffle moves only the needed bytes.
    * Results are partitioning-independent for every consumer in this repo
    * (aggregations / joins / sketches). */
  def fanOut(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val target =
      if (bytes > BigInt(conf.toLong * 32768L)) conf
      else math.max(1, (bytes / 32768).toInt + 1)
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
