package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.extract.MisraGriesAggregate

/** EXACT heavy hitters over an unbounded item domain without ever shuffling
  * the domain — the two-pass sketch-then-verify pattern every large-corpus
  * boilerplate/hot-token audit needs at 100 TB:
  *
  *  1. CANDIDATES: one pass computing a global Misra-Gries summary (bounded
  *     ≤ k counters per partition, O(partitions·k) shuffle — see
  *     [[graft.extract.MisraGriesAggregate]]) plus the total item count n.
  *     The MG bound (undercount ≤ n/(k+1)) guarantees every item with true
  *     count ≥ ceil(phi·n) is among the ≤ k survivors whenever k ≥ 1/phi:
  *     true ≥ ceil(phi·n) ≥ phi·n = n/(1/phi) > n/(k+1) ⇒ estimate > 0.
  *  2. VERIFY: a second pass counting ONLY the ≤ k candidates exactly — the
  *     candidate set broadcasts as a left-semi hash join (never an O(k)
  *     plan literal, the IVF-codebook lesson), so the big side's group-by
  *     shuffles at most k distinct keys. False positives from pass 1 fall
  *     to the exact `cnt >= threshold` filter.
  *
  * The output is therefore EXACT and order-independent (the MG summary's
  * estimates are order-dependent; the final counts are not), which is what
  * lets a DuckDB `GROUP BY ... HAVING count >= T` oracle hash-match it.
  *
  * Scale posture: two corpus scans, no domain-sized shuffle, no domain-sized
  * state. The alternatives both fail at 100 TB: a straight group-by ships
  * every distinct item (billions) through the shuffle to find 30 rows, and a
  * sample-based cut gives no exactness guarantee. Driver-side state is the
  * one ≤ k-entry summary row — same bounded-artifact posture as the bloom
  * bitset and IVF codebook.
  */
object HeavyHitters {

  /** Items with exact count ≥ ceil(phi·n), n = total (non-null) item count.
    *
    * @param items one string column `itemCol` (pre-exploded item stream)
    * @param phi   heavy-hitter fraction; k must be ≥ 1/phi for the guarantee
    * @param k     MG summary size (counters); memory is O(k) per partition
    */
  def heavyHitters(items: DataFrame, itemCol: String, phi: Double, k: Int): DataFrame = {
    require(phi > 0.0 && phi <= 1.0, s"phi must be in (0,1]: $phi")
    require(k >= 1.0 / phi, s"k=$k too small for phi=$phi: need k >= ${1.0 / phi} for the superset guarantee")
    val item: Column = col(itemCol)
    // pass 1: bounded summary + total count in ONE aggregate (single scan)
    val row = items
      .agg(MisraGriesAggregate.mgSketch(item, k).as("sketch"), count(item).as("n"))
      .head()
    val n = row.getLong(1)
    val threshold = math.max(1L, math.ceil(phi * n).toLong)
    val candidates = row.getMap[String, Long](0).keysIterator.toArray // ≤ k, bounded by construction
    val spark = items.sparkSession
    import spark.implicits._
    val candDf = candidates.toSeq.toDF(itemCol)
    // pass 2: exact counts of candidates only; candidate set broadcasts
    items
      .join(broadcast(candDf), Seq(itemCol), "left_semi")
      .groupBy(item)
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= threshold)
  }
}
