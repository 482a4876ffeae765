package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Round-9 relational additions: the two interval/dominance shapes
  * the r-family had not yet covered — interval-UNION coverage (r61:
  * how much wall-clock each event type actually occupies once
  * overlaps collapse, the complement of r57's max-concurrency) and
  * the 2-D SKYLINE / Pareto frontier (r62: the non-dominated set,
  * computed with a broadcast dominance prefilter instead of the
  * quadratic self-join).
  *
  * Oracle parity rules are Relational2's: timestamps leave the plan
  * as epoch micros (BIGINT) and every comparison is on exact
  * integers or parquet-identical doubles, so hashes are drift-free
  * across engines.
  */
object Relational5 {

  // ---- r61: interval-union coverage (sweep-line) -------------------

  /** r61: per event type, the UNION length of its activity
    * intervals — total covered micros once overlaps collapse — plus
    * the interval count and first-start→last-end span. r57 answers
    * "how many at once"; this answers "how much of the clock is
    * covered at all" (the duty-cycle number a capacity review reads
    * next to r57's peak).
    *
    * Sweep: per key, sort by (start, end) and take the running max
    * of END over all PRECEDING rows; a row's novel contribution is
    * `max(0, end − max(start, prev_max_end))`. The sum of
    * contributions is the union length, and it is order-invariant
    * under ties (equal starts split one covered segment between the
    * tied rows), so the hash is stable however the sort breaks ties.
    *
    * 100 TB shape: ONE shuffle — `partitionBy(event_type) orderBy
    * (s_us, e_us)`, i.e. a keyed sort whose running max is a single
    * streaming pass per partition; the closing agg is partial
    * (map-side) into |event_type| rows. A skewed key degrades to one
    * big sorted partition, the same contract as every windowed
    * r-query (r56/r57); range-splitting a key and stitching boundary
    * maxima is the documented escalation, not needed at this
    * cardinality. */
  def intervalCoverage(iv: DataFrame): DataFrame = {
    val ends = iv.select(col("event_type"), col("s_us"),
      (col("s_us") + col("dur_us")).as("e_us"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("s_us"), col("e_us"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ends
      .withColumn("prev_end", max(col("e_us")).over(w))
      .withColumn("contrib",
        greatest(lit(0L),
          col("e_us") - greatest(col("s_us"),
            coalesce(col("prev_end"), col("s_us")))))
      .groupBy(col("event_type"))
      .agg(sum(col("contrib")).as("covered_us"),
        count(lit(1)).as("n_intervals"),
        (max(col("e_us")) - min(col("s_us"))).as("span_us"))
  }

  def r61IntervalCoverage(spark: SparkSession, dir: String): DataFrame =
    intervalCoverage(Tables.events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("s_us"),
        greatest(floor(col("value") * 1000000).cast("long"), lit(0L))
          .as("dur_us")))

  val r61Sql: String =
    """WITH iv AS (SELECT event_type, epoch_us(ts) AS s_us,
      |    epoch_us(ts) + greatest(CAST(floor(value * 1000000) AS BIGINT), 0)
      |      AS e_us
      |  FROM events),
      |sw AS (SELECT event_type, s_us, e_us,
      |    max(e_us) OVER (PARTITION BY event_type ORDER BY s_us, e_us
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      |  FROM iv)
      |SELECT event_type,
      |  CAST(sum(greatest(0, e_us - greatest(s_us,
      |    coalesce(prev_end, s_us)))) AS BIGINT) AS covered_us,
      |  count(*) AS n_intervals,
      |  CAST(max(e_us) - min(s_us) AS BIGINT) AS span_us
      |FROM sw GROUP BY 1""".stripMargin

  // ---- r62: 2-D skyline / Pareto frontier --------------------------

  /** r62: the SKYLINE of `part` under (minimize p_size, maximize
    * p_retailprice) — every part for which no other part is at most
    * as large AND at least as expensive with one strict. The
    * catalog-curation question ("which parts are on the
    * size/price efficient frontier") and the canonical dominance
    * operator the r-family lacked.
    *
    * Two observations make this ONE tiny aggregate instead of the
    * textbook quadratic dominance self-join: a row survives iff
    * (a) its price strictly exceeds the best price at any STRICTLY
    * SMALLER size (else that part dominates on both axes), and
    * (b) its price equals the best price AT its own size (else a
    * same-size better-price part dominates). Both bests come from
    * one |distinct p_size|-row aggregate: a running max over the
    * per-size maxima (sizes are integers, ≤ a few dozen distinct).
    *
    * 100 TB shape: one partial-agg groupBy into a bounded-size
    * frame, a driver-free window over those few rows, and a
    * BROADCAST join back to the scan — the scan is the whole cost;
    * no shuffle of `part` at any scale. (For a continuous first
    * axis the per-size agg becomes a per-bucket agg feeding the same
    * prefilter plus an exact pass over the tiny candidate set —
    * same plan family.) */
  def skyline(partIn: DataFrame): DataFrame = {
    val perSize = partIn.groupBy(col("p_size"))
      .agg(max(col("p_retailprice")).as("mx"))
    val cw = Window.orderBy(col("p_size"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = perSize.withColumn("cum_mx", max(col("mx")).over(cw))
    partIn.join(broadcast(cum), Seq("p_size"))
      .filter((col("cum_mx").isNull ||
          col("p_retailprice") > col("cum_mx")) &&
        col("p_retailprice") === col("mx"))
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
  }

  def r62Skyline(spark: SparkSession, dir: String): DataFrame =
    skyline(Tables.part(spark, dir))

  val r62Sql: String =
    """WITH mx AS (SELECT p_size, max(p_retailprice) AS mx
      |  FROM part GROUP BY 1),
      |cm AS (SELECT p_size, mx,
      |    max(mx) OVER (ORDER BY p_size
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum_mx
      |  FROM mx)
      |SELECT p.p_partkey, p.p_size, p.p_retailprice
      |FROM part p JOIN cm ON p.p_size = cm.p_size
      |WHERE (cum_mx IS NULL OR p.p_retailprice > cum_mx)
      |  AND p.p_retailprice = mx""".stripMargin
}
