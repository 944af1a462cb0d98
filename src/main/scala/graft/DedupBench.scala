package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.data.Dedup

/** Dedup-at-scale benchmark: MinHash-LSH over a corpus where all-pairs
  * comparison is physically off the table (10^6 docs = 5x10^11 pairs).
  *
  * Synthesizes a deterministic corpus of 50-word documents (words from
  * integer arithmetic, no RNG); every id with id % 10 == 9 is a planted
  * near-duplicate of id-9 — identical except the last word, true word-3-gram
  * Jaccard 46/50 = 0.92. Measures: signature-index build (one-time, persisted
  * parquet — the LSH twin of AnnBench's IVF cell index), candidate+verify
  * wall-clock from the persisted index, recall on the planted pairs, and
  * docs/sec end-to-end. Prints one JSON line; numbers are recorded in
  * BENCH/BASELINE.md.
  *
  * Env: SPARK_GRAFT_DEDUP_N (default 1000000), SPARK_GRAFT_CPUS (default 32).
  */
object DedupBench {

  val WordsPerDoc = 50
  val Vocab = 5000

  /** Deterministic corpus with planted near-dups at (i, i+9) for i%10==0. */
  def synthesize(spark: SparkSession, n: Long): DataFrame = {
    // murmur3 mixing per (doc, position): affine id arithmetic would make
    // ids congruent mod Vocab byte-identical (collapsing the corpus into
    // exact-dup clusters that are quadratic INSIDE each LSH bucket — real
    // pipelines run exact dedup first for the same reason)
    def words(idCol: org.apache.spark.sql.Column) =
      transform(
        sequence(lit(0), lit(WordsPerDoc - 1)),
        j => concat(lit("w"), pmod(hash(idCol, j), lit(Vocab)).cast("string"))
      )
    val isDup = col("id") % 10 === 9
    val baseId = when(isDup, col("id") - 9).otherwise(col("id"))
    val baseWords = words(baseId)
    val text = when(
      isDup,
      // near-dup: words 0..48 of the base doc + a changed last word
      concat_ws(" ", concat(slice(baseWords, 1, WordsPerDoc - 1), array(concat(lit("x"), col("id").cast("string")))))
    ).otherwise(concat_ws(" ", baseWords))
    spark.range(n).select(col("id").as("doc_id"), text.as("text"))
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_DEDUP_N", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val (bands, rowsPerBand, threshold) = (8, 4, 0.5)
    val spark = Bench.session(cpus)

    val corpusPath = s"/tmp/graft_dedup_bench_$n"
    if (!new java.io.File(corpusPath).exists())
      synthesize(spark, n).repartition(cpus * 4).write.mode("overwrite").parquet(corpusPath)
    val docs = spark.read.parquet(corpusPath)
    docs.count() // warm page cache

    // one-time signature-index build, persisted like any real LSH index
    val indexPath = s"/tmp/graft_dedup_index_$n"
    val (_, sigSec) = time {
      Dedup
        .minhashSignatures(docs, bands * rowsPerBand)
        .write
        .mode("overwrite")
        .parquet(indexPath)
    }
    val sigs = spark.read.parquet(indexPath)

    // candidate generation + exact verification from the persisted index
    val (nPairs, pairSec) = time {
      Dedup.minhashPairs(docs, threshold, bands, rowsPerBand, Some(sigs)).count()
    }

    // recall on the planted (i, i+9) truth pairs
    val found = Dedup
      .minhashPairs(docs, threshold, bands, rowsPerBand, Some(sigs))
      .select("doc_a", "doc_b")
    val planted = spark
      .range(n)
      .where(col("id") % 10 === 0 && col("id") + 9 < n)
      .select(col("id").as("doc_a"), (col("id") + 9).as("doc_b"))
    val nPlanted = planted.count()
    val hit = found.join(planted, Seq("doc_a", "doc_b"), "left_semi").count()
    val recall = hit.toDouble / nPlanted

    val totalSec = sigSec + pairSec
    val json =
      f"""{"metric":"dedup_lsh_docs_per_sec","n_docs":$n,"bands":$bands,"rows_per_band":$rowsPerBand,"threshold":$threshold,"sig_index_sec":$sigSec%.3f,"pairs_sec":$pairSec%.3f,"total_sec":$totalSec%.3f,"docs_per_sec":${n / totalSec}%.1f,"pairs_found":$nPairs,"planted":$nPlanted,"recall":$recall%.4f}"""
    println(json)
    spark.stop()
  }
}
