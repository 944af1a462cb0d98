package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** G9 balanced sampling (/root/reference/knowledge_graph/sampling.py:12-106):
  * drop rows with null/"None" strata, take an equal quota from every valid
  * stratum, then top up the shortfall from the leftovers at random. Seeded
  * `rand` makes a run reproducible; the oracle-checked query variant
  * (g9_balanced_sample) orders by a content hash instead so a second engine
  * can reproduce it exactly. */
object Sampling {

  def balancedSample(
      df: DataFrame,
      strataCols: Seq[String],
      sampleSize: Int,
      seed: Long = 42L
  ): DataFrame = {
    val valid = strataCols.foldLeft(df) { (d, c) =>
      d.where(col(c).isNotNull && col(c) =!= "None")
    }
    val key = concat_ws("", strataCols.map(col): _*)
    val withKey = valid.withColumn("__stratum", key).withColumn("__r", rand(seed))

    val nStrata = withKey.select("__stratum").distinct().count()
    if (nStrata == 0) return df.limit(0)
    val quota = (sampleSize / nStrata).toInt

    val w = Window.partitionBy(col("__stratum")).orderBy(col("__r"))
    val ranked = withKey.withColumn("__rn", row_number().over(w)).cache()
    val base = ranked.where(col("__rn") <= quota)

    // shortfall from the ACTUAL base size (sampling.py:86-101 computes
    // missing_rows from len(result)): undersized strata contribute fewer
    // than quota rows, and the top-up must make up for that too
    val shortfall = sampleSize - base.count()
    val result =
      if (shortfall <= 0) base
      else {
        // top-up: random rows from the remainder, global random order
        val leftovers = ranked
          .where(col("__rn") > quota)
          .orderBy(col("__r"), col("__rn"))
          .limit(shortfall.toInt)
        base.unionByName(leftovers)
      }
    result.drop("__stratum", "__r", "__rn")
  }

  /** G10 eval-set exclusion (operations/train.py:101-120): drop training
    * passages whose TEXT appears in the evaluation set — a broadcast-able
    * anti-join on text (the reference's set-membership filter). */
  def deduplicateAgainstEval(training: DataFrame, evaluation: DataFrame): DataFrame =
    training.join(evaluation.select("text").distinct(), Seq("text"), "left_anti")

  /** G10 train balancing (operations/train.py:122-178): cap at `maxSamples`
    * aiming for a half/half positive/negative split; if a perfect split
    * isn't possible, take all of the smaller group and fill the remainder
    * from the larger one (positives first, like the reference). The
    * reference takes "the first k" in list order; a distributed engine must
    * NAME that order — `orderCol` (the quota arithmetic is identical). The
    * two group counts are a bounded model artifact collected to the driver;
    * the selection itself is a per-group row_number window. */
  def limitAndBalance(
      passages: DataFrame,
      isPositive: org.apache.spark.sql.Column,
      maxSamples: Long,
      orderCol: String
  ): DataFrame = {
    // the reference's positivity test (p.spans non-empty) can never be null;
    // an arbitrary caller predicate can — treat null as negative rather than
    // NPE-ing on the collected group key / silently dropping the rows
    val flagged = passages.withColumn("is_positive", coalesce(isPositive, lit(false)))
    val counts = flagged
      .groupBy("is_positive")
      .count()
      .collect()
      .map(r => r.getBoolean(0) -> r.getLong(1))
      .toMap
    val nPos = counts.getOrElse(true, 0L)
    val nNeg = counts.getOrElse(false, 0L)
    val half = maxSamples / 2
    var posQ = math.min(nPos, half)
    var negQ = math.min(nNeg, half)
    var rem = maxSamples - posQ - negQ
    if (rem > 0 && posQ < nPos) { val e = math.min(rem, nPos - posQ); posQ += e; rem -= e }
    if (rem > 0 && negQ < nNeg) negQ += math.min(rem, nNeg - negQ)
    val w = Window.partitionBy(col("is_positive")).orderBy(col(orderCol))
    flagged
      .withColumn("__rn", row_number().over(w))
      .where(
        (col("is_positive") && col("__rn") <= posQ) ||
          (!col("is_positive") && col("__rn") <= negQ))
      .drop("__rn")
  }
}
