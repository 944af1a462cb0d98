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

  /** Repartition `df` to the session shuffle parallelism iff it currently
    * has fewer partitions. Call on a narrow projection (the columns the
    * downstream transform needs), so the conditional shuffle moves only
    * those bytes. Results are partitioning-independent for every consumer
    * in this repo (aggregations / joins / sketches). */
  def fanOut(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions < conf) df.repartition(conf) else df
  }
}
