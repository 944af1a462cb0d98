package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword retrieval over the corpus — the "find the passages about X"
  * query a KG/curation engine's users run constantly (the reference drives
  * its Vespa index for this; here it is a first-class distributed query).
  *
  * Scoring is tf × inverse-document-frequency with an ALL-INTEGER weight:
  *
  *   w(t)        = (1e6 * (N + 1)) div (df(t) + 1)     (exact long division)
  *   score(d, q) = Σ_{t ∈ q} tf(t, d) * w(t)
  *
  * — the linear-idf cousin of BM25's log-idf. log() is deliberately absent:
  * ln is not guaranteed bit-identical across engines (unlike IEEE sqrt), so
  * a log-idf score could not be hash-compared against the DuckDB oracle;
  * the linear weight preserves the df ordering exactly and keeps every
  * aggregate a long.
  *
  * Scale: the query term set is tiny and broadcast; term frequencies are
  * computed by filtering the token explode TO QUERY TERMS FIRST (the corpus
  * never shuffles its full token stream — only (doc, query-term) hits
  * move, partial-agg combined map-side). df and N are query-term-bounded
  * aggregates broadcast back. Top-k is TakeOrderedAndProject (per-partition
  * heads, no global sort).
  */
object Search {

  def searchTopK(docs: DataFrame, query: Seq[String], k: Int = 10): DataFrame = {
    val terms = query.distinct
    val termArr: Column = array(terms.map(lit): _*)
    val hits = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .where(array_contains(termArr, col("t")))
    val tf = hits.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    // df per query term and the corpus size N: two tiny aggregates
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val weighted = tf
      .join(broadcast(df), Seq("t"))
      .crossJoin(broadcast(n))
      .selectExpr("doc_id", "tf * ((1000000 * (n_docs + 1)) div (df + 1)) AS s")
    weighted
      .groupBy("doc_id")
      .agg(sum(col("s")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
