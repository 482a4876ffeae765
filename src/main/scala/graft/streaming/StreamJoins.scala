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
