package graft.data

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over `embeddings(vec_id, embedding, label)`.
  *
  * All dot products are computed with codegen'd higher-order array functions
  * (`zip_with` + `aggregate`) in double precision with strict left-to-right
  * accumulation — deterministic bit-for-bit, which the correctness oracle
  * relies on. No UDFs.
  *
  * Scale path: brute-force top-k is O(queries × corpus) with a broadcast
  * query side — fine when the query set is small. The IVF variant clusters
  * the corpus once (assignment = argmin over broadcast centroids) and probes
  * only `nProbe` cells per query, cutting the scanned fraction to
  * ~nProbe/nCells at a small recall cost (measured in the test suite).
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k cosine neighbours for each query vector (vec_id < nQueries).
    * Output: (query_id, rank, neighbor_id) — scores are compared exactly
    * during ranking but not emitted (floating-point display stability). */
  def bruteForceTopK(emb: DataFrame, nQueries: Int = 50, k: Int = 10): DataFrame = {
    val corpus = emb.select(col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("v"))
    val queries = emb
      .where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("q"))
    val scored = corpus
      .join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("q"), col("v")).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** IVF cell assignment: centroid c = embedding of vec_id c (deterministic
    * seeding — no kmeans iterations needed for a recall-measured ANN index).
    * Returns (vec_id, cell, v). */
  def ivfAssign(emb: DataFrame, nCells: Int = 16): DataFrame = {
    val centroids = emb
      .where(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), asDouble(col("embedding")).as("c"))
    val vecs = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    // argmin via max_by (partial-aggregating) rather than a full-corpus
    // window: key = (similarity, -cell) so ties break toward the lowest cell
    vecs
      .join(broadcast(centroids))
      .select(col("vec_id"), col("cell"), col("v"), cosine(col("v"), col("c")).as("d"))
      .groupBy("vec_id")
      .agg(
        max_by(struct(col("cell"), col("v")), struct(col("d"), -col("cell"))).as("best")
      )
      .select(col("vec_id"), col("best.cell").as("cell"), col("best.v").as("v"))
  }

  /** IVF-probed ANN top-k: each query scans only its nProbe nearest cells. */
  def ivfTopK(emb: DataFrame, nQueries: Int = 50, k: Int = 10, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val assigned = ivfAssign(emb, nCells)
    val centroids = emb
      .where(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), asDouble(col("embedding")).as("c"))
    val queries = emb
      .where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("q"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("d").desc, col("cell").asc)
    val probes = queries
      .join(broadcast(centroids))
      .select(col("query_id"), col("q"), col("cell"), cosine(col("q"), col("c")).as("d"))
      .withColumn("rn", row_number().over(wProbe))
      .where(col("rn") <= nProbe)
      .select("query_id", "q", "cell")
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id").asc)
    probes
      .join(assigned, "cell")
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cosine(col("q"), col("v")).as("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** Embedding-cosine near-duplicate pairs among a bounded probe set
    * (query_ids) vs the whole corpus. */
  def embeddingNearDups(emb: DataFrame, nQueries: Int = 200, threshold: Double = 0.95): DataFrame = {
    val corpus = emb.select(col("vec_id").as("doc_b"), asDouble(col("embedding")).as("v"))
    val queries = emb
      .where(col("vec_id") < nQueries)
      .select(col("vec_id").as("doc_a"), asDouble(col("embedding")).as("q"))
    corpus
      .join(broadcast(queries), col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), cosine(col("q"), col("v")).as("score"))
      .where(col("score") >= threshold)
      .select("doc_a", "doc_b")
  }
}
