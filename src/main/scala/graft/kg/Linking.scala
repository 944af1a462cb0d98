package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Concept

/** Entity-linking score pass (J7's dictionary step): link mention surfaces
  * to concepts via the broadcast concept-store dictionary, with the
  * reference linker's priority (/root/reference/scripts/wikidata_linker.py:
  * 55-98): an exact preferred-label match wins; otherwise any-label matches
  * are ranked by corpus frequency and the most common wins (O4
  * most_common(1) -> max_by). */
object Linking {

  /** mentions: DataFrame with a `surface` column. Returns one row per
    * distinct surface: (surface, concept_id, link_kind) where link_kind is
    * 'preferred' or 'alternative'. Dictionary side is broadcast. */
  def linkSurfaces(spark: SparkSession, mentions: DataFrame, concepts: Vector[Concept]): DataFrame = {
    import spark.implicits._
    val dict = concepts
      .flatMap { c =>
        (c.preferredLabel.toLowerCase, c.wikibaseId, "preferred") +:
          c.alternativeLabels.map(l => (l.toLowerCase, c.wikibaseId, "alternative"))
      }
      .toDF("label", "dict_concept_id", "link_kind")

    val surfaceFreq = mentions
      .select(lower(col("surface")).as("label"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_occurrences"))

    // per-(surface, concept) corpus frequency — the most_common(1) signal
    val freqByConcept = mentions
      .select(lower(col("surface")).as("label"), col("concept_id").as("dict_concept_id"))
      .groupBy("label", "dict_concept_id")
      .agg(count(lit(1)).as("concept_freq"))

    // rank candidates: preferred beats alternative, then most-common concept
    val candidates = surfaceFreq
      .join(broadcast(dict), Seq("label"))
      .join(freqByConcept, Seq("label", "dict_concept_id"), "left")
      .na.fill(0L, Seq("concept_freq"))

    candidates
      .groupBy(col("label").as("surface"))
      .agg(
        max_by(
          struct(col("dict_concept_id"), col("link_kind")),
          struct(
            when(col("link_kind") === "preferred", 1).otherwise(0),
            col("concept_freq"),
            col("dict_concept_id")
          )
        ).as("best"),
        max(col("n_occurrences")).as("n_occurrences")
      )
      .select(
        col("surface"),
        col("best.dict_concept_id").as("concept_id"),
        col("best.link_kind").as("link_kind"),
        col("n_occurrences")
      )
  }
}
