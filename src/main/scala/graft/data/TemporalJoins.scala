package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators a transcript/event corpus needs that Spark has no
  * built-in physical operator for — each expressed so Catalyst's existing
  * exchange/sort machinery does the work (no custom SparkPlan needed, and
  * crucially no row explosion):
  *
  *  - [[asofBackward]]: each left row matched to the LATEST right row at or
  *    before it per key ("as-of" join). The naive formulation is a range
  *    join (`l.key = r.key AND r.ts <= l.ts` + a per-row argmax) which Spark
  *    executes as an exploding equi-join + filter + window; this one is the
  *    union-and-carry-forward plan: tag both sides, union, ONE shuffle on
  *    the key, ONE sort by (ts, side, tie), then a running-frame
  *    `last(ignoreNulls)` carries the most recent right payload into every
  *    left row. Cost: sort-merge of |L|+|R| rows, zero intermediate blowup,
  *    AQE-splittable on skewed keys — the plan you want when both sides are
  *    billions of rows.
  *
  *  - [[bandJoin]]: all (left, right) pairs with the same key and
  *    |l.ts − r.ts| ≤ band. A direct inequality join degenerates to
  *    per-key cross products; here each side buckets ts into band-sized
  *    bins and the join runs as an EQUI-join on (key, bin) with the left
  *    side duplicated into its 3 adjacent bins (bin−1, bin, bin+1 — any
  *    in-band pair lands in one of them), then the exact |Δts| ≤ band
  *    filter. The 3× fan-out is fixed and tiny; the quadratic blowup is
  *    confined to single (key, bin) cells, i.e. bounded by true temporal
  *    density rather than key cardinality.
  *
  * Right-payload consistency in asofBackward: the matched right columns are
  * carried as ONE struct, so a legitimately-NULL right value column can
  * never mix payloads from different right rows (per-column
  * `last(ignoreNulls)` would skip to an older row for just that column).
  *
  * Tie semantics (asofBackward): right rows AT the left timestamp match
  * (≤, not <); among right rows sharing (key, ts) the one with the largest
  * `rightTie` wins — deterministic, and what the LATERAL
  * `ORDER BY ts DESC, tie DESC LIMIT 1` oracle computes.
  */
object TemporalJoins {

  /** Left rows + the latest right row with `right.ts <= left.ts` per key.
    * Output: every left column, plus `prefix + c` for c in rightVals (NULL
    * when no prior right row exists).
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightTie: String,
      rightVals: Seq[String],
      prefix: String = "matched_"): DataFrame = {
    val tieType = right.schema(rightTie).dataType
    require(
      Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(tieType),
      s"rightTie must be an integral column for a deterministic tie-break " +
        s"(a non-numeric column would cast to NULL and silently break determinism), " +
        s"got ${tieType.catalogString}")
    // SQL comparison semantics: a right row with NULL key or NULL ts matches
    // nothing (`r.key = l.key AND r.ts <= l.ts` is never true on NULL) — but
    // unioned in, a NULL ts would sort FIRST ascending and carry its payload
    // into every otherwise-unmatched left row. Filter them out up front.
    val rightClean = right.where(col(key).isNotNull && col(ts).isNotNull)
    val payload = struct(rightVals.map(col): _*)
    val payloadType = rightClean.select(payload).schema.head.dataType
    val leftCols = left.columns.toSeq
    val lPart = left.select(
      leftCols.map(col) ++ Seq(
        lit(1).as("_is_left"),
        lit(Long.MaxValue).as("_tie"), // left rows sort after right rows at equal ts
        lit(null).cast(payloadType).as("_rv")): _*)
    val rPart = rightClean.select(
      leftCols.map(c =>
        if (c == key || c == ts) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++ Seq(
        lit(0).as("_is_left"),
        col(rightTie).cast("long").as("_tie"),
        payload.as("_rv")): _*)
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(ts).asc, col("_is_left").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lPart
      .unionByName(rPart)
      .withColumn("_m", last(col("_rv"), ignoreNulls = true).over(w))
      .where(col("_is_left") === 1)
      .select(leftCols.map(col) ++ rightVals.map(c => col(s"_m.$c").as(prefix + c)): _*)
  }

  /** All same-key pairs within `bandSeconds` of each other, via band-bucket
    * equi-join. Output: (leftVals, prefix+rightVals, dt_s = l.ts − r.ts in
    * seconds, |dt_s| ≤ band).
    */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      bandSeconds: Long,
      leftVals: Seq[String],
      rightVals: Seq[String],
      prefix: String = "r_"): DataFrame = {
    require(bandSeconds > 0, s"band must be positive: $bandSeconds")
    val lBinned = left
      .select((Seq(col(key), unix_timestamp(col(ts)).as("_lts")) ++ leftVals.map(col)): _*)
      // a pair with |Δ| ≤ band spans at most one bin boundary of width band,
      // so duplicating the LEFT row into bins {b−1, b, b+1} covers every
      // in-band right row exactly once (the equi-join below is on the
      // RIGHT row's own bin, which is one of the three)
      .withColumn("_bin", explode(array((-1 to 1).map(d => (col("_lts") / bandSeconds).cast("long") + d): _*)))
    val rBinned = right
      .select((Seq(col(key).as("_rkey"), unix_timestamp(col(ts)).as("_rts")) ++
        rightVals.map(c => col(c).as(prefix + c))): _*)
      .withColumn("_bin", (col("_rts") / bandSeconds).cast("long"))
    lBinned
      .join(rBinned, lBinned(key) === rBinned("_rkey") && lBinned("_bin") === rBinned("_bin"))
      .where(abs(col("_lts") - col("_rts")) <= bandSeconds)
      .select(
        (Seq(col(key)) ++ leftVals.map(col) ++ rightVals.map(c => col(prefix + c)) :+
          (col("_lts") - col("_rts")).as("dt_s")): _*)
  }
}
