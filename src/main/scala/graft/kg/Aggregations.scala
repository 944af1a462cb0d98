package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Identifier8, WikibaseId}

/** The remaining aggregation shapes from SURVEY.md §2.5. */
object Aggregations {

  /** G1/S5: per-turn concept arrays — the {text_block_id: [VespaConcept...]}
    * map the reference writes per document (flows/aggregate.py:301-408),
    * long-formatted as one row per turn with a sorted array of span structs.
    * Spans sorted by start (labelled_passage.py:70, O2). */
  def mentionsPerTurn(mentions: DataFrame): DataFrame =
    mentions
      .groupBy("conv_id", "turn_idx")
      .agg(
        sort_array(
          collect_list(struct(col("start"), col("end"), col("concept_id"), col("span_id")))
        ).as("concepts"),
        count(lit(1)).as("n_spans")
      )

  /** G1 alignment invariant (aggregate.py:225-237, :351-365): the reference
    * requires every classifier's output for one document to contain the same
    * passages in the same order. Keyed by (conv_id, turn_idx) instead of
    * position, the invariant becomes: every classifier saw the same turn set
    * per conversation. Returns violating conversations (empty == aligned).
    * Input: (classifier_id, conv_id, turn_idx) coverage rows. */
  def alignmentViolations(coverage: DataFrame): DataFrame = {
    // per (conv, classifier): an order-independent SET signature of the turn
    // ids (count + xor-fold of hashes), so same-count-different-set
    // misalignments are caught, not just length mismatches
    val perClf = coverage
      .select("conv_id", "classifier_id", "turn_idx")
      .distinct()
      .groupBy("conv_id", "classifier_id")
      .agg(
        count(lit(1)).as("n_turns"),
        bit_xor(xxhash64(col("turn_idx"))).as("turn_set_sig")
      )
    // total classifier count as a broadcast scalar subquery (1-row cross
    // join), NOT a driver-side .count(): building this plan must not run a job
    val totalClassifiers = coverage
      .agg(countDistinct(col("classifier_id")).as("total_classifiers"))
    perClf
      .groupBy("conv_id")
      .agg(
        countDistinct(struct(col("n_turns"), col("turn_set_sig"))).as("n_signatures"),
        count(lit(1)).as("n_classifiers")
      )
      .crossJoin(broadcast(totalClassifiers))
      .where(col("n_signatures") > 1 || col("n_classifiers") < col("total_classifiers"))
      .select("conv_id")
  }

  /** G4 model-field parse (flows/aggregate.py:141-171): new format
    * "wikibase_id:concept_id:classifier_id"; anything else (old labeller
    * strings, "None" parts, invalid ids) -> None. */
  def parseModelField(model: String): Option[(String, String, String)] = {
    val parts = model.split(":", -1)
    if (parts.length != 3) None
    else if (parts.exists(_ == "None")) None
    else if (!WikibaseId.isValid(parts(0))) None
    else if (!Identifier8.isValid(parts(1)) || !Identifier8.isValid(parts(2))) None
    else Some((parts(0), parts(1), parts(2)))
  }

  /** G5 v2 passage spans (flows/index.py:508-573): group a turn's concept
    * records by identical (start, end) into one span row carrying all
    * models that labelled that exact interval. */
  def spansV2(mentions: DataFrame, modelCol: String = "concept_id"): DataFrame =
    mentions
      .groupBy("conv_id", "turn_idx", "start", "end")
      .agg(sort_array(collect_set(col(modelCol))).as("concepts_v2"))
}
