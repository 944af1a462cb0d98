package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.data.Similarity

/** C2 EmbeddingClassifier shape
  * (/root/reference/knowledge_graph/classifier/embedding.py:173-401): cosine
  * similarity between a passage embedding and the broadcast concept
  * embedding; above-threshold passages get ONE whole-text span with
  * probability = similarity (embedding.py:334-348).
  *
  * The reference's SQLite embedding cache (embedding.py:22-170) becomes a
  * precomputed embeddings table joined by passage id — embeddings are data,
  * not a memoized side effect, so the operator is a pure column plan.
  *
  * Input: passages(passage_id, text_len int, embedding array<float>).
  * Output: (passage_id, start=0, end=text_len, concept_id, probability) for
  * passages with cosine >= threshold.
  */
object EmbeddingClassifier {

  def predict(
      passages: DataFrame,
      conceptId: String,
      conceptEmbedding: Array[Double],
      threshold: Double = 0.65
  ): DataFrame = {
    passages
      .select(
        col("passage_id"),
        col("text_len"),
        Similarity
          .cosineToConst(col("embedding").cast("array<double>"), conceptEmbedding)
          .as("probability")
      )
      .where(col("probability") >= threshold)
      .select(
        col("passage_id"),
        lit(0).as("start"),
        col("text_len").as("end"),
        lit(conceptId).as("concept_id"),
        col("probability")
      )
  }
}
