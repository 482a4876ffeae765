package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RANGE join — the second temporal/interval join the engine
  * composes (with AsOfJoin): left rows with a point value matched to
  * right rows with an interval [start, end), on `start <= v < end`.
  *
  * Spark's built-in answer to a non-equi join is a nested-loop —
  * fine when one side broadcasts, quadratic when both sides are big.
  * `bucketed` is the big-big plan: pick a bucket width, explode each
  * right interval to the buckets it covers, join on the EQUI bucket
  * key, and keep the residual range predicate — the same
  * blocking-key decomposition as d4's length-band join, so fan-out
  * is interval-length/width per right row (bounded, chosen), and the
  * join shuffles on a uniform bucket key instead of comparing
  * everything to everything. Matches are exact (the residual filter
  * re-checks the real predicate) and unique (a point lands in
  * exactly one bucket, and an interval covers each bucket at most
  * once — no dedup step needed).
  */
object RangeJoin {

  /** Big-big range join. `left` must carry a numeric point column
    * `vCol`; `right` an interval as `startCol` (inclusive) /
    * `endCol` (exclusive). Returns left columns + a `range` struct
    * of the matched right row (one output row per matching
    * interval). `width` trades right-side fan-out (len/width rows)
    * against bucket population — pick ≈ the typical interval
    * length so fan-out stays O(1). */
  def bucketed(left: DataFrame, right: DataFrame,
      vCol: String, startCol: String, endCol: String,
      width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val lB = left.withColumn("__b", floor(col(vCol) / width))
    // interval [s, e) covers buckets floor(s/w) .. floor(e/w): floor
    // is monotone, so every v in [s, e) lands inside that range for
    // ANY numeric bounds (not just integers — a tighter (e-1)/w last
    // bucket would silently DROP matches for fractional bounds, and
    // unlike over-coverage, under-coverage is not repaired by the
    // residual filter; the one possibly-extra bucket at floor(e/w)
    // is). Empty/inverted intervals (e <= s) are dropped up front —
    // sequence(start, stop) DESCENDS when start > stop, which would
    // fabricate junk bucket rows.
    val rB = right
      .filter(col(startCol) < col(endCol))
      .withColumn("__b", explode(sequence(
        floor(col(startCol) / width),
        floor(col(endCol) / width))))
    val rStruct = struct(right.columns.map(c => col(s"__r.$c")).toIndexedSeq: _*)
    lB.alias("__l")
      .join(rB.alias("__r"),
        col("__l.__b") === col("__r.__b") &&
        col(s"__l.$vCol") >= col(s"__r.$startCol") &&
        col(s"__l.$vCol") < col(s"__r.$endCol"))
      .select(left.columns.map(c => col(s"__l.$c")).toIndexedSeq
        :+ rStruct.as("range"): _*)
  }
}
