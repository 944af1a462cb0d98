package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.data.Similarity

/** ANN-at-scale benchmark: sim_ann_ivf vs sim_topk on a corpus large enough
  * for the scan-fraction win to dominate fixed costs (the sf0.1 embeddings
  * table has 2k vectors — both paths are setup-bound there).
  *
  * Synthesizes a deterministic CLUSTERED corpus (nCells cluster centers from
  * integer arithmetic, vector i = center(i % nCells) + small per-coordinate
  * noise; vec_id < nCells are near-pure centers, so the engine's
  * deterministic centroid seeding picks one per cluster). Measures wall-clock
  * for exact brute-force top-k vs IVF top-k and the IVF recall vs the exact
  * result. Prints one JSON line and appends nothing — numbers are recorded in
  * BENCH/BASELINE.md.
  *
  * Env: SPARK_GRAFT_ANN_N (corpus size, default 200000),
  *      SPARK_GRAFT_ANN_QUERIES (default 100), SPARK_GRAFT_CPUS (default 32),
  *      SPARK_GRAFT_ANN_CELLS (default 256; >Similarity.LiteralCellCap
  *      exercises the two-level broadcast-codebook regime),
  *      SPARK_GRAFT_ANN_PROBE (default 16).
  */
object AnnBench {

  val Dim = 64

  /** Clustered synthetic embeddings: (vec_id, embedding: array<double>). */
  def synthesize(spark: SparkSession, n: Long, nCells: Int): DataFrame = {
    val cluster = col("id") % nCells
    val center = (j: org.apache.spark.sql.Column) =>
      ((cluster * 73 + j * 37) % 997).cast("double") / 997.0
    val noise = (j: org.apache.spark.sql.Column) =>
      ((col("id") * 31 + j * 17) % 1000).cast("double") / 1000.0 * 0.05
    spark
      .range(n)
      .select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(Dim - 1)), j => center(j) + noise(j)).as("embedding")
      )
  }

  import Bench.time

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_ANN_N", "200000").toLong
    val nQueries = sys.env.getOrElse("SPARK_GRAFT_ANN_QUERIES", "100").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nCells = sys.env.getOrElse("SPARK_GRAFT_ANN_CELLS", "256").toInt
    val nProbe = sys.env.getOrElse("SPARK_GRAFT_ANN_PROBE", "16").toInt
    val spark = Bench.session(cpus)

    // corpus keyed by (n, nCells): the planted cluster structure follows the
    // cell count, so different cell configs must not share a corpus
    val path = if (nCells == 256) s"/tmp/graft_ann_bench_$n" else s"/tmp/graft_ann_bench_${n}_c$nCells"
    if (!Bench.parquetComplete(path))
      synthesize(spark, n, nCells).repartition(cpus * 2).write.mode("overwrite").parquet(path)
    val emb = spark.read.parquet(path)
    emb.count() // warm page cache

    def best3(f: => Long): (Long, Double) = {
      var rows = 0L
      val times = (1 to 3).map { _ => val (r, s) = time(f); rows = r; s }
      (rows, times.min)
    }

    // index build = one-time ingest cost: the Lloyd-refined codebook (one
    // assignment pass + quantized cell means) plus the cell assignment
    // (nCells cosines per vector), persisted like any real ANN index; the
    // query path reads back BOTH artifacts (codebook as plan literals)
    val indexPath = s"/tmp/graft_ann_index_${n}_$nCells"
    val (cents, indexSec) = time {
      val c = Similarity.ivfCentroids(emb, nCells)
      // repartition ON the partition column before the dynamic-partition
      // write: without it every task holds writer state for every cell it
      // sees, so file count is tasks*nCells (131k files at 32x4096 — and the
      // per-task partition sort OOMed an 8g heap at that width); with it the
      // shuffle routes whole cells to tasks, file count is ~nCells, and each
      // task sorts only its own cells. Same shape a real ingest wants.
      Similarity
        .ivfAssign(emb, nCells, Some(c))
        .repartition(col("cell"))
        .write
        .mode("overwrite")
        .partitionBy("cell")
        .parquet(indexPath)
      c
    }
    val index = spark.read.parquet(indexPath).select("vec_id", "cell", "v")

    val (exactRows, exactSec) = best3(Similarity.bruteForceTopK(emb, nQueries, 10).count())
    val (ivfRows, ivfSec) =
      best3(Similarity.ivfTopK(emb, nQueries, 10, nCells, nProbe, Some(index), Some(cents)).count())

    // recall: fraction of exact (query, neighbor) pairs the IVF path returns
    val exact = Similarity
      .bruteForceTopK(emb, nQueries, 10)
      .select(col("query_id"), col("neighbor_id"))
    val ivf = Similarity
      .ivfTopK(emb, nQueries, 10, nCells, nProbe, Some(index), Some(cents))
      .select(col("query_id"), col("neighbor_id"))
    val hit = exact.intersect(ivf).count()
    val recall = hit.toDouble / exactRows

    // SemDeDup leg on the same codebook: the within-cell pair space is
    // (n/nCells)^2 per cell, so nCells directly bounds the quadratic —
    // this measures that claim at bench scale
    val (semDropped, semSec) = best3(
      Similarity.semanticDedup(emb, cents, threshold = 0.9).where(col("kept") === 0).count())

    // SQ8 legs: the scale build (one corpus aggregate — the quantizer's
    // whole model state), the quantized brute scan vs the float scan (same
    // O(n·d) work shape; at 100 TB the win is the 4x-smaller persisted
    // index, which a single-host page-cached bench can only hint at), the
    // IVF×SQ8 composition, and both recalls vs the float exact ranking
    val (scales, sq8ScalesSec) = time(Similarity.sq8Scales(emb))
    val (sq8Rows, sq8Sec) = best3(Similarity.sq8TopK(emb, scales, nQueries, 10).count())
    val (_, sq8IvfSec) = best3(
      Similarity.sq8IvfTopK(emb, scales, nQueries, 10, nCells, nProbe, Some(index), Some(cents)).count())
    val sq8 = Similarity.sq8TopK(emb, scales, nQueries, 10).select(col("query_id"), col("neighbor_id"))
    val sq8Recall = exact.intersect(sq8).count().toDouble / exactRows
    val sq8Ivf = Similarity
      .sq8IvfTopK(emb, scales, nQueries, 10, nCells, nProbe, Some(index), Some(cents))
      .select(col("query_id"), col("neighbor_id"))
    val sq8IvfRecall = exact.intersect(sq8Ivf).count().toDouble / exactRows

    // PQ legs: train on a 1/50 sample (standard practice — the books are a
    // statistic of the distribution, not the corpus), encode the FULL
    // corpus once (= the 32x-compressed persisted index; the heavy
    // corpus×m×kCents assignment join is an index-build cost), then the
    // ADC query path reads only the code table
    val (pqBooks, pqTrainSec) = time(
      Similarity.pqCodebooks(emb.where(col("vec_id") % 50 === 0), m = 8, kCents = 16))
    val (pqCodes, pqEncodeSec) = time {
      val c = Similarity.pqEncode(emb, pqBooks).localCheckpoint()
      c.count()
      c
    }
    // ADC scoring joins the code table against the per-query LUT relation
    // (m·kCents rows per query), so the intermediate is corpus×m×queries —
    // 20 queries keeps that at ~320M rows (production would pivot the LUT
    // to a broadcast map and score map-side; the relation form is the
    // oracle-checkable shape)
    val pqQ = 20
    val (_, pqSec) = best3(
      Similarity.pqTopK(emb, pqBooks, pqQ, 10, preCodes = Some(pqCodes)).count())
    val pqTop = Similarity
      .pqTopK(emb, pqBooks, pqQ, 10, preCodes = Some(pqCodes))
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint()
    // exact recall is resolution-limited BY DESIGN on this corpus: cluster
    // noise (±0.05) is far below the 4-bit/subspace quantization cell, so
    // every same-cluster vector shares one code and ADC cannot rank WITHIN
    // a cluster (ties break by id — exact-recall reads ~0). The meaningful
    // truth at this resolution is CLUSTER recall: a PQ neighbor must come
    // from the query's planted cluster (id ≡ query mod nCells)
    val pqRecall =
      exact.where(col("query_id") < pqQ).intersect(pqTop).count().toDouble / (pqQ * 10)
    val pqClusterRecall = pqTop
      .where(pmod(col("query_id"), lit(nCells)) === pmod(col("neighbor_id"), lit(nCells)))
      .count()
      .toDouble / (pqQ * 10)

    val json =
      f"""{"metric":"ann_speedup","n":$n,"dim":$Dim,"queries":$nQueries,"n_cells":$nCells,"n_probe":$nProbe,"index_build_sec":$indexSec%.3f,"exact_sec":$exactSec%.3f,"ivf_sec":$ivfSec%.3f,"speedup":${exactSec / ivfSec}%.2f,"recall":$recall%.4f,"exact_rows":$exactRows,"ivf_rows":$ivfRows,"semdedup_sec":$semSec%.3f,"semdedup_dropped":$semDropped,"sq8_scales_sec":$sq8ScalesSec%.3f,"sq8_sec":$sq8Sec%.3f,"sq8_rows":$sq8Rows,"sq8_recall":$sq8Recall%.4f,"sq8_ivf_sec":$sq8IvfSec%.3f,"sq8_ivf_recall":$sq8IvfRecall%.4f,"pq_train_sec":$pqTrainSec%.3f,"pq_encode_sec":$pqEncodeSec%.3f,"pq_queries":$pqQ,"pq_sec":$pqSec%.3f,"pq_recall":$pqRecall%.4f,"pq_cluster_recall":$pqClusterRecall%.4f}"""
    println(json)
    spark.stop()
  }
}
