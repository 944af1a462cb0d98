package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation over `documents`:
  * token counting, quality scoring, fingerprinting, language id. Everything
  * except language id is a pure Catalyst column plan (whole-stage codegen).
  */
object TextAnalysis {

  private val stopwords = Seq("the", "a", "an", "and", "of", "to", "in")

  /** Per-document quality features: token/char counts, average token length,
    * stopword ratio, punctuation ratio, uppercase ratio — the usual cheap
    * quality-filter signals (length/punct/stopword heuristics). */
  def quality(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), "\\s+")
    val stopArr = array(stopwords.map(lit): _*)
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(toks).as("n_tokens"),
      (length(col("text")).cast("double") / size(toks)).as("avg_token_len"),
      (size(filter(toks, t => array_contains(stopArr, t))).cast("double") / size(toks)).as("stopword_ratio"),
      (length(regexp_replace(col("text"), "[^.,;:!?]", "")).cast("double") / length(col("text"))).as("punct_ratio"),
      (length(regexp_replace(col("text"), "[^A-Z]", "")).cast("double") / length(col("text"))).as("upper_ratio")
    )
  }

  /** Token counts per source: whitespace tokens plus a BPE-ish subword count
    * (each letter-run counted as ceil(len/4) subwords plus one token per
    * non-alphanumeric, non-space char — a deterministic proxy for tokenizer
    * cost). */
  def tokenStats(docs: DataFrame): DataFrame = {
    val wsTokens = size(split(col("text"), "\\s+"))
    val letterChars = length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
    val punctChars = length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", ""))
    val bpeish = ceil(letterChars.cast("double") / 4).cast("long") + punctChars
    docs
      .select(col("source"), wsTokens.as("ws_tokens"), bpeish.cast("long").as("bpeish_tokens"))
      .groupBy("source")
      .agg(
        sum(col("ws_tokens")).as("total_ws_tokens"),
        sum(col("bpeish_tokens")).as("total_bpeish_tokens"),
        count(lit(1)).as("n_docs")
      )
  }

  /** Content-defined document fingerprint: md5 of the sorted token multiset —
    * invariant to token reordering, the cheap "same bag of words" signature. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(concat_ws(" ", array_sort(split(col("text"), " ")))).as("fingerprint")
    )

  /** Heuristic language id via stopword-profile voting (pure column plan:
    * per-language distinctive-word hit counts, argmax). A real n-gram model
    * would be a broadcast lookup table; the plumbing is identical. */
  def langId(docs: DataFrame): DataFrame = {
    val profiles: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "is", "was", "with"),
      "de" -> Seq("der", "und", "die", "ist", "mit", "das"),
      "fr" -> Seq("le", "et", "la", "est", "avec", "les"),
      "es" -> Seq("el", "y", "la", "es", "con", "los")
    )
    val toks = split(lower(col("text")), "\\s+")
    val scores = profiles.map { case (lang, words) =>
      val wordArr = array(words.map(lit): _*)
      struct(size(filter(toks, t => array_contains(wordArr, t))).as("hits"), lit(lang).as("lang"))
    }
    docs.select(
      col("doc_id"),
      greatest(scores: _*).getField("lang").as("predicted_lang"),
      col("lang").as("declared_lang")
    )
  }
}
