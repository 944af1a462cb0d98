package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketching — "how many distinct tokens / URLs /
  * fingerprints does this 100 TB corpus hold", answered in one pass with a
  * fixed-size state. Spark's `approx_count_distinct` is exactly this sketch,
  * but its register state is opaque and its estimate float — useless for a
  * cross-engine parity check and for INCREMENTAL ingest (you cannot merge
  * yesterday's opaque estimate with tonight's batch). Here the register
  * TABLE is the first-class, oracle-checkable artifact:
  *
  *   h      = first 15 hex chars of md5(token), base-16      (portable 60-bit hash)
  *   bucket = h mod m
  *   rho    = trailing_zeros(h div m) + 1                    (Flajolet's bit-pattern observable)
  *   registers = per-bucket MAX(rho)                         (trivially mergeable)
  *
  * Every step is exact integer arithmetic on a hash both engines compute
  * identically (same device as the SimHash/DSIR portable hashes), so the
  * DuckDB oracle reproduces the registers row-for-row; trailing zeros is
  * `bit_count((v & -v) - 1)` — pure bit ops, no log2. Merging two corpora's
  * registers is a union + MAX — the incremental-ingest contract for free.
  *
  * The ESTIMATE (HyperLogLog, Flajolet et al. 2007) is a driver-side fold
  * over the ≤ m register rows ([[hllEstimate]]) — floats confined to the
  * last m-sized step, never in the distributed plan. Small-range correction
  * (linear counting below 2.5m) included.
  *
  * Scale posture: one map-only projection per token + a groupBy(bucket)
  * MAX that partial-aggregates to ≤ m rows per input partition — the
  * whole corpus reduces to m longs, no token ever shuffles beyond its
  * bucket row. m is the accuracy knob (rel. error ≈ 1.04/sqrt(m)).
  */
object Sketches {

  /** @return (bucket, rho_max) register table, ≤ m rows. */
  def hllRegisters(docs: DataFrame, m: Int = 256): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two: $m")
    docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long").as("h"))
      .selectExpr(s"h % $m AS bucket", s"h div $m AS v")
      .selectExpr("bucket", "bit_count((v & -v) - 1) + 1 AS rho")
      .groupBy("bucket")
      .agg(max(col("rho")).cast("long").as("rho_max"))
  }

  /** The HLL merge law — registers of a union = per-bucket MAX of the
    * parts' registers. This is the whole incremental-ingest story for
    * cardinality: persist yesterday's ≤ m register rows, sketch tonight's
    * batch alone, merge in O(m) — the 100 TB corpus is never re-read. The
    * driver row `sketch_distinct_incr` asserts the law against the
    * full-corpus oracle (equality with a from-scratch run IS the
    * incremental-correctness statement, same posture as the dedup/CC
    * incremental twins). */
  def mergeRegisters(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b).groupBy("bucket").agg(max(col("rho_max")).as("rho_max"))

  /** HyperLogLog estimate from a register table (present buckets only;
    * absent buckets are zero registers). Driver-side: the input is ≤ m
    * rows by construction. */
  def hllEstimate(registers: Seq[(Long, Long)], m: Int): Double = {
    val regMap = registers.toMap
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val sum = (0 until m).map(b => math.pow(2.0, -regMap.getOrElse(b.toLong, 0L).toDouble)).sum
    val raw = alpha * m * m / sum
    val zeros = m - regMap.count(_._2 > 0L)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }
}
