package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantile gating — "keep the top p% of the corpus by a
  * quality score", the threshold-selection step every curation recipe needs
  * between scoring (quality/repetition/novelty metrics) and filtering.
  * `approxQuantile`/`percentile_approx` give sketch answers that differ
  * run-to-run and engine-to-engine; a training-data gate wants an exact,
  * reproducible cut.
  *
  * Semantics (all exact integer arithmetic):
  *   score_q(d)  = (10^6 · stopword_tokens) div tokens   (quality ppm)
  *   k           = max(1, (N · keepPct) div 100)          (target rank)
  *   threshold   = the k-th largest score                 (ties inclusive)
  *   kept        = every doc with score_q ≥ threshold     (≥ k docs)
  *
  * Scale posture: the quantile is computed on the SCORE HISTOGRAM, not the
  * corpus — one map-side-combined groupBy(score) over the docs, then a
  * running-sum window over the histogram table, whose row count is bounded
  * by the quantization domain (≤ 10^6 + 1 rows at any corpus size), so the
  * single-partition window is a driver-scale step by construction — the
  * same bounded-domain device as the packing operator's two-level prefix
  * sum, needing only one level here. The threshold comes back as a 1-row
  * broadcast; the corpus itself is touched by exactly two map-only passes
  * (score, filter) and one histogram shuffle.
  */
object Quantiles {

  val ScoreScale: Long = 1000000L

  /** Integer quality score: stopword occupancy in ppm (the Gopher-style
    * "too few stopwords → junk" signal, quantized so the gate is exact). */
  private[data] def scoreColumns(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), "\\s+")
    val stopArr = array(TextAnalysis.stopwords.map(lit): _*)
    docs
      .select(
        col("doc_id"),
        size(filter(toks, t => array_contains(stopArr, t))).cast("long").as("sh"),
        size(toks).cast("long").as("nt"))
      .selectExpr("doc_id", s"($ScoreScale * sh) div nt AS score_q")
  }

  /** Exact multi-percentile summary of the quality-score distribution —
    * the "where should I put the gate" diagnostic run before committing to
    * a keepPct. Percentile p = the k-th SMALLEST score with
    * k = max(1, (N·p) div 100) — the classic nearest-rank definition, all
    * integer. Same histogram-grain trick as the gate: one corpus groupBy,
    * then an ascending running sum over ≤ 10^6+1 histogram rows, and the
    * per-percentile selection is a tiny join of that table against the
    * literal percentile list.
    *
    * @return (pct, value) — one row per requested percentile. */
  def scorePercentiles(docs: DataFrame, pcts: Seq[Int] = Seq(25, 50, 75, 90, 99)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100), s"bad percentiles: $pcts")
    val hist = scoreColumns(docs).groupBy("score_q").agg(count(lit(1)).as("c"))
    val cum = hist.select(
      col("score_q"),
      sum(col("c")).over(Window.orderBy(col("score_q").asc)).as("cum"),
      sum(col("c")).over(Window.partitionBy()).as("n"))
    val pctDf = cum.sparkSession.createDataFrame(pcts.distinct.map(Tuple1(_))).toDF("pct")
    broadcast(pctDf)
      .crossJoin(cum)
      .where(col("cum") >= greatest(lit(1L), expr("(n * pct) div 100")))
      .groupBy("pct")
      .agg(min(col("score_q")).as("value"))
  }

  /** @return (doc_id, score_q) for the kept top-`keepPct`% documents. */
  def qualityGate(docs: DataFrame, keepPct: Int = 60): DataFrame = {
    require(keepPct >= 1 && keepPct <= 100, s"keepPct out of range: $keepPct")
    val scored = scoreColumns(docs)
    val hist = scored.groupBy("score_q").agg(count(lit(1)).as("c"))
    // histogram-sized window (≤ ScoreScale+1 rows) — never over documents
    val cum = hist.select(
      col("score_q"),
      sum(col("c")).over(Window.orderBy(col("score_q").desc)).as("cum"),
      sum(col("c")).over(Window.partitionBy()).as("n"))
    val thr = cum
      .where(col("cum") >= greatest(lit(1L), expr(s"(n * $keepPct) div 100")))
      .agg(max(col("score_q")).as("thr"))
    scored
      .join(broadcast(thr))
      .where(col("score_q") >= col("thr"))
      .select("doc_id", "score_q")
  }
}
