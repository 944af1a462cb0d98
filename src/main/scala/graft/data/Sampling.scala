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
}
