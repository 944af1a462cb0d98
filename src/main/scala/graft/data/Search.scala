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

  /** BM25-shaped ranked retrieval in EXACT fixed-point arithmetic — adds the
    * two things [[searchTopK]]'s linear tf·idf lacks: term-frequency
    * saturation (a doc repeating "merge" 50× is not 50× more relevant) and
    * document-length normalization (long docs stop winning by volume alone).
    * With k1 = 1.2 and b = 0.75 held as the rationals 1200/1000 and 750/1000:
    *
    *   lnorm_q = (1000 · dl · N) div Σdl                 (dl/avgdl, scale 10^3)
    *   K_q     = (1200 · (250 + (750 · lnorm_q) div 1000)) div 1000
    *   tfp_q   = (tf · 2200 · 1000) div (tf · 1000 + K_q) (< 2200, scale 10^3)
    *   idf_w   = (10^6 · (N + 1)) div (df + 1)            (same linear idf as
    *                                                       searchTopK — ln is
    *                                                       not cross-engine
    *                                                       bit-stable)
    *   score   = Σ_t idf_w(t) · tfp_q(t, d)
    *
    * Every step is a long floor-division, so the DuckDB oracle replays the
    * score bit-for-bit. Overflow headroom: idf_w·tfp_q ≤ 2.2·10^9·(N+1),
    * in-long up to N ≈ 4·10^9 documents.
    *
    * Scale: same shape as searchTopK — the token explode is filtered to the
    * broadcast query terms before any shuffle; df/N/Σdl are tiny broadcast
    * aggregates. The one addition is the per-doc length join, which keys the
    * hit-bounded tf table against the map-only (doc_id, dl) projection —
    * the shuffle carries one 16-byte row per doc, not tokens. Top-k is
    * TakeOrderedAndProject with a deterministic (score desc, doc_id) boundary.
    */
  def searchBm25(docs: DataFrame, query: Seq[String], k: Int = 10): DataFrame = {
    val terms = query.distinct
    val termArr: Column = array(terms.map(lit): _*)
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
    val dl = toks.select(col("doc_id"), size(col("ts")).cast("long").as("dl"))
    val hits = toks
      .select(col("doc_id"), explode(col("ts")).as("t"))
      .where(array_contains(termArr, col("t")))
    val tf = hits.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
    tf
      .join(dl, Seq("doc_id"))
      .join(broadcast(df), Seq("t"))
      .crossJoin(broadcast(stats))
      .selectExpr(
        "doc_id",
        """((1000000 * (n_docs + 1)) div (df + 1))
          | * ((tf * 2200 * 1000) div
          |    (tf * 1000 + (1200 * (250 + (750 * ((1000 * dl * n_docs) div tot)) div 1000)) div 1000))
          | AS s""".stripMargin)
      .groupBy("doc_id")
      .agg(sum(col("s")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

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

  /** tf-idf keyword extraction: the top-k most characteristic terms PER
    * DOCUMENT — the query-free inverse of [[searchTopK]] (there a query
    * ranks documents; here each document ranks its own vocabulary). This is
    * the per-doc topic-tag / weak-label generator of a curation pipeline
    * (and the bag-of-words seed for clustering).
    *
    * Same all-integer weight as the retrieval family (ln is not
    * cross-engine bit-stable; the linear idf preserves the df ordering
    * exactly):
    *
    *   w(t)          = (10^6 * (N + 1)) div (df(t) + 1)
    *   score_q(d, t) = tf(t, d) * w(t)
    *
    * Terms in more than half the corpus (df * 2 > N) are cut — the
    * df-derived stopword rule, so no language-specific stoplist ships.
    * Ties break by term ascending; every quantity is a long, so the DuckDB
    * oracle hash-matches.
    *
    * Scale: tf is one map-side-combined aggregate over the token explode;
    * df aggregates the (doc, term)-distinct tf table, and joins back by
    * term (vocabulary-sized — broadcast-able for real vocabularies, and
    * Zipf guarantees the df table is far smaller than the token stream).
    * The top-k window partitions BY DOCUMENT — per-doc term sets are
    * doc-length-bounded, so no global sort and no skew beyond the longest
    * single document. */
  def keywordExtract(docs: DataFrame, k: Int = 3): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .where(col("df") * 2 <= col("n_docs"))
      .selectExpr("doc_id", "term", "tf * ((1000000 * (n_docs + 1)) div (df + 1)) AS score_q")
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("score_q").desc, col("term"))))
      .where(col("rn") <= k)
      .select("doc_id", "term", "score_q")
  }
}
