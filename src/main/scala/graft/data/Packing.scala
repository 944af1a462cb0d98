package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-example packing: concatenate each source's token stream in
  * stable (doc_id) order and cut it into fixed-length training examples —
  * the standard "document concatenation + chunking" used to build LLM
  * pretraining batches. Output maps every document to its token offset and
  * the example (bin) range it lands in:
  * (doc_id, source, begin_offset, first_bin, last_bin).
  *
  * Scale shape — a distributed prefix sum, NOT one global window: a naive
  * `sum over (partition by source order by doc_id)` sorts each source's
  * ENTIRE stream in one task, which is exactly the single-task bottleneck
  * a 100 TB corpus cannot afford. Instead the cumsum is computed at two
  * levels:
  *   1. per (source, doc_id-range bucket) token sums — one hash aggregate,
  *      output rows = #buckets (bounded, ~corpus/bucketSize);
  *   2. a window cumsum over those bucket sums per source — the only sort,
  *      over the SMALL bucket table;
  *   3. a within-bucket window cumsum — partitions bounded by bucketSize
  *      regardless of corpus size.
  * begin = bucket base + intra-bucket prefix. Values are identical to the
  * one-window formulation (integer sums are associative), which is what
  * the DuckDB oracle runs.
  */
object Packing {

  def packExamples(docs: DataFrame, seqLen: Int = 64, bucketSize: Long = 1024L): DataFrame = {
    val t = docs.select(
      col("doc_id"),
      col("source"),
      expr(s"doc_id DIV $bucketSize").as("bucket"),
      size(split(col("text"), " ")).cast("long").as("n")
    )
    // level 1: bounded bucket sums
    val bucketSums = t.groupBy("source", "bucket").agg(sum("n").as("bsum"))
    // level 2: the only full sort runs over the small bucket table
    val wB = Window.partitionBy("source").orderBy("bucket")
    val bucketBases = bucketSums
      .withColumn("base", sum(col("bsum")).over(wB) - col("bsum"))
      .drop("bsum")
    // level 3: within-bucket prefix — partition size bounded by bucketSize
    val wD = Window.partitionBy("source", "bucket").orderBy("doc_id")
    t.join(bucketBases, Seq("source", "bucket"))
      .withColumn("intra", sum(col("n")).over(wD) - col("n"))
      .withColumn("begin_offset", col("base") + col("intra"))
      .select(
        col("doc_id"),
        col("source"),
        col("begin_offset"),
        expr(s"begin_offset DIV $seqLen").as("first_bin"),
        expr(s"(begin_offset + n - 1) DIV $seqLen").as("last_bin")
      )
  }
}
