package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-stream joins (SURVEY.md §2.7): the one stateful streaming
  * shape the engine's surface had not yet exercised. Structured
  * Streaming buffers BOTH sides in keyed state; without time bounds
  * that state grows forever, so the engine's contract makes the
  * interval explicit and derives state retention from it — exactly
  * the discipline a 100 TB/day event stream needs (state per key is
  * bounded by the watermark horizon, and late rows beyond it are
  * dropped deterministically rather than joined sometimes).
  */
object StreamJoins {

  /** Interval inner join: rows match when keys are equal and the
    * right event lands within [leftTime, leftTime + maxDelay]. Both
    * sides carry a `maxDelay` watermark, which is what lets Spark
    * evict buffered state once the watermark passes the interval's
    * upper bound. Columns referenced by name so callers can join any
    * two conforming streams. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      maxDelay: String): DataFrame = {
    val l = left.withWatermark(leftTime, maxDelay)
    val r = right.withWatermark(rightTime, maxDelay)
    l.join(r, expr(
      s"$leftKey = $rightKey AND " +
      s"$rightTime >= $leftTime AND " +
      s"$rightTime <= $leftTime + interval '$maxDelay'"))
  }

  /** Stream-STATIC enrichment join — the dimension-lookup shape
    * (every streaming detection picks up its label row, the P10
    * operator running continuously): the static side is a bounded
    * relation, so the join is STATELESS — each micro-batch hash-joins
    * against the broadcast dim and nothing is buffered between
    * batches (no watermark required, no state store at all; compare
    * the interval joins below, which must buffer both sides). At
    * 100 TB/day the dim broadcast is per-executor-once and the
    * stream side never shuffles — the cheapest join Structured
    * Streaming offers, and the default way to attach reference data
    * to an event stream. */
  def enrichJoin(stream: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key))

  /** Interval LEFT OUTER join — the attribution shape ("every
    * impression, with its click if one came"): matches emit as they
    * arrive, and an unmatched left row emits with NULL right columns
    * only once the right-side watermark has passed its interval's
    * upper bound — the earliest moment "no match" is a fact rather
    * than "not yet". Same watermark-derived state eviction as the
    * inner join; the NULL-completion latency is the price of the
    * outer contract and is bounded by maxDelay + watermark lag. */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      maxDelay: String): DataFrame = {
    val l = left.withWatermark(leftTime, maxDelay)
    val r = right.withWatermark(rightTime, maxDelay)
    l.join(r, expr(
      s"$leftKey = $rightKey AND " +
      s"$rightTime >= $leftTime AND " +
      s"$rightTime <= $leftTime + interval '$maxDelay'"), "left_outer")
  }
}
