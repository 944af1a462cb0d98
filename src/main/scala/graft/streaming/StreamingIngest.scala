package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Concept
import graft.extract.Gazetteer

/** Streaming ingest mode (optional — the reference is batch-only, SURVEY.md
  * §2.9; its incremental behavior is the checkpoint anti-join). When
  * transcripts arrive as a stream, the same extraction expression runs
  * unchanged under Structured Streaming: readStream -> watermark -> explode
  * (extraction) -> windowed aggregation, giving per-window concept counts
  * with late-data handling. The gazetteer expression is stateless, so the
  * only state is the windowed aggregation — bounded by the watermark.
  */
object StreamingIngest {

  /** transcripts stream -> per (window, concept) mention-edge counts.
    * Append-mode compatible (watermarked tumbling window). */
  def conceptCountsStream(
      spark: SparkSession,
      transcripts: DataFrame,
      concepts: Vector[Concept],
      windowDuration: String = "1 minute",
      watermarkDelay: String = "2 minutes"
  ): DataFrame = {
    val gaz = new Gazetteer(concepts)
    transcripts
      .where(col("role") =!= "tool" && length(trim(col("text"))) > 0)
      .withWatermark("ts", watermarkDelay)
      .select(
        col("ts"),
        col("conv_id"),
        explode(graft.extract.expressions.extractConceptsPresent(col("text"), gaz)).as("concept_id")
      )
      .groupBy(window(col("ts"), windowDuration), col("concept_id"))
      .agg(count(lit(1)).as("n_mentions"), approx_count_distinct(col("conv_id")).as("approx_convs"))
  }

  /** Streaming triple emission: stateless transform — every micro-batch
    * appends its MENTIONS_CONCEPT edges (the batch path's exactly-once
    * bucket checkpointing is replaced by the streaming sink's own
    * checkpoint). */
  def mentionEdgesStream(spark: SparkSession, transcripts: DataFrame, concepts: Vector[Concept]): DataFrame = {
    val gaz = new Gazetteer(concepts)
    transcripts
      .where(col("role") =!= "tool" && length(trim(col("text"))) > 0)
      .select(
        concat(col("conv_id"), lit("_"), col("turn_idx").cast("string")).as("subj"),
        lit("MENTIONS_CONCEPT").as("pred"),
        explode(graft.extract.expressions.extractConceptsPresent(col("text"), gaz)).as("obj")
      )
  }
}
