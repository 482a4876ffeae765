package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** AS-OF join — the temporal join Spark has no built-in for (the
  * prompt's canonical "operator the engine must compose": for each
  * left row, the most recent right row with the same key and
  * rightTime <= leftTime; DuckDB ships it natively as ASOF JOIN,
  * which is the oracle).
  *
  * Implementation is the scalable union-tag plan, NOT a windowed
  * theta-join: both sides are tagged and unioned, shuffled ONCE on
  * the key, sorted within the partition by (time, side) with right
  * rows first on ties (= the `<=` bound), and a running
  * `last(right_payload, ignoreNulls)` carries the latest right row
  * forward onto every left row. Cost = one exchange + one
  * in-partition sort — the sort-merge-join shape, linear in
  * |left|+|right| per key, with no per-row range probe and no
  * quadratic fan-out on popular keys.
  *
  * Contract: right rows must be unique per (key, rightTime)
  * (pre-aggregate otherwise — ties there would make ANY as-of
  * nondeterministic, DuckDB's included); left/right time columns
  * must be union-compatible types. Inner semantics: left rows with
  * no preceding right row are dropped (keeps engine outputs
  * NULL-free per the parity invariant). Rows with a NULL key or
  * NULL time are dropped from BOTH sides up front: the as-of match
  * is an equality predicate, and equality never matches NULL —
  * without the filter, Window.partitionBy would group all NULL keys
  * into one partition and pair them, diverging from ASOF-join
  * semantics (DuckDB's included).
  *
  * Skew contract: the plan partitions by key alone, so one
  * pathological hot key (a power-law user owning a large fraction
  * of both sides) lands its entire history in a single task's sort.
  * The cost is LINEAR in that key's row count (one sort + one
  * running-last pass — never quadratic), so the operator degrades
  * gracefully; when a single key's history exceeds a task's memory
  * budget at extreme scale, pre-aggregate the right side per
  * (key, coarse-time-bucket) first (the r21 query does exactly
  * this: one right row per (custkey, date)), which bounds the
  * per-key right volume before the union-tag shuffle.
  */
object AsOfJoin {

  /** Returns every left column plus an `asof` struct holding the
    * matched right row (all right columns, including its time). */
  def asOf(left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String): DataFrame = {
    val lpayT = StructType(left.schema.fields)
    val rpayT = StructType(right.schema.fields)
    val lf = left.filter(col(key).isNotNull && col(leftTime).isNotNull)
    val rf = right.filter(col(key).isNotNull && col(rightTime).isNotNull)
    val lU = lf.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__lpay"),
      lit(null).cast(rpayT).as("__rpay"))
    val rU = rf.select(
      col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      lit(null).cast(lpayT).as("__lpay"),
      struct(right.columns.map(col).toIndexedSeq: _*).as("__rpay"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lU.unionByName(rU)
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__match").isNotNull)
      .select(col("__lpay.*") +: Seq(col("__match").as("asof")): _*)
  }

  /** LEFT as-of: identical plan to [[asOf]] (union-tag + one keyed
    * exchange + running last), but left rows WITHOUT any prior right
    * row survive with a NULL `asof` payload — the attribution /
    * enrichment contract ("every fact keeps its latest dimension
    * state, facts before the first state keep none"). Callers must
    * coalesce the NULL payload before the Verify gate. */
  def asOfLeft(left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String): DataFrame = {
    val lpayT = StructType(left.schema.fields)
    val rpayT = StructType(right.schema.fields)
    val lf = left.filter(col(key).isNotNull && col(leftTime).isNotNull)
    val rf = right.filter(col(key).isNotNull && col(rightTime).isNotNull)
    val lU = lf.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__lpay"),
      lit(null).cast(rpayT).as("__rpay"))
    val rU = rf.select(
      col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      lit(null).cast(lpayT).as("__lpay"),
      struct(right.columns.map(col).toIndexedSeq: _*).as("__rpay"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lU.unionByName(rU)
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__lpay.*") +: Seq(col("__match").as("asof")): _*)
  }

  /** FORWARD as-of: for each left row, the EARLIEST right row with
    * the same key and rightTime >= leftTime — the "next event after"
    * temporal join ([[asOf]] mirrored in time): next shipment after
    * an order, next error after a deploy, time-to-next-touch SLAs.
    * Identical single-exchange union-tag plan; the only changes are
    * the tie order (left rows sort BEFORE right rows at the same
    * instant, so an equal-time right row qualifies for the `>=`
    * bound) and the running aggregate (`first(right_payload,
    * ignoreNulls)` over [currentRow, unboundedFollowing] — the
    * time-reversed running last). Inner semantics: left rows with no
    * following right row are dropped; NULL keys/times are filtered
    * up front per the [[asOf]] equality contract. Same skew
    * contract as [[asOf]]. */
  def asOfForward(left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String): DataFrame = {
    val lpayT = StructType(left.schema.fields)
    val rpayT = StructType(right.schema.fields)
    val lf = left.filter(col(key).isNotNull && col(leftTime).isNotNull)
    val rf = right.filter(col(key).isNotNull && col(rightTime).isNotNull)
    val lU = lf.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(0).as("__side"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__lpay"),
      lit(null).cast(rpayT).as("__rpay"))
    val rU = rf.select(
      col(key).as("__k"), col(rightTime).as("__t"), lit(1).as("__side"),
      lit(null).cast(lpayT).as("__lpay"),
      struct(right.columns.map(col).toIndexedSeq: _*).as("__rpay"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    lU.unionByName(rU)
      .withColumn("__match", first(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0 && col("__match").isNotNull)
      .select(col("__lpay.*") +: Seq(col("__match").as("asof")): _*)
  }
}
