package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ---- r63: autocorrelation of the daily activity series ----------

  /** r63: per event type, the AUTOCORRELATION of its daily event-
    * count series at lags 1, 2 and 7 — the burstiness/weekly-
    * seasonality diagnostic a capacity model starts from. Exactness
    * discipline: the series is integer counts; linear moments (n, Σx,
    * Σy) are exact longs and the squared moments (Σxy, Σx², Σy²) are
    * exact decimal(38,0) (a ~1e9-events/day series wraps a long sum
    * of x·y within ten days — see autocorrDaily); the Pearson value
    * is formed once at the edge from those exact integers with the
    * identical left-associated (+,*,/,sqrt) tree on both engines —
    * the only FP ops in the plan are IEEE-exact, so the hash is
    * drift-free. Zero-variance windows emit 0.0 via the same guard
    * on both sides.
    *
    * The per-type calendar is DENSIFIED before the lag (every day in
    * [min, max] present, zero-count days as x = 0): lead(x, 7) over
    * present-days-only is a ROW offset, and a single silent day would
    * shift every "lag-7" pair off the weekly alignment the lag
    * promises. With the dense calendar the row lag IS the calendar
    * lag.
    *
    * 100 TB shape: ONE partial-agg groupBy collapses events to
    * |type|·|day| rows; densification is a per-type sequence()
    * explode over that tiny frame joined back to it (never touches
    * the fact table); the lag pairing is a lead() window over the
    * dense series (per-type ordered pass), and the closing agg is
    * |type|·|lags| rows. The raw table is touched once. */
  def autocorr(eventsIn: DataFrame, lags: Seq[Int]): DataFrame = {
    val dayUs = 86400000000L
    val sparseDaily = eventsIn
      .groupBy(col("event_type"),
        unix_micros(date_trunc("day", col("ts"))).as("day_us"))
      .agg(count(lit(1)).as("x"))
    val span = sparseDaily.groupBy(col("event_type"))
      .agg(min(col("day_us")).as("lo"), max(col("day_us")).as("hi"))
    val cal = span.select(col("event_type"),
      explode(sequence(col("lo"), col("hi"), lit(dayUs))).as("day_us"))
    val daily = cal.join(sparseDaily, Seq("event_type", "day_us"), "left")
      .select(col("event_type"), col("day_us"),
        coalesce(col("x"), lit(0L)).as("x"))
    autocorrDaily(daily, lags)
  }

  /** the lag-pair moment machinery over a dense (event_type, day_us,
    * x) daily series — split from `autocorr` so the overflow-boundary
    * spec can inject extreme counts directly. The SQUARED moments
    * (Σxy, Σx², Σy²) are carried in decimal(38,0): a day of ~1e9
    * events makes x·y ≈ 1e18 and a long sum wraps (or throws under
    * ANSI) within ten days, while decimal(38) holds ~1e20 days of
    * that load exactly. The Pearson edge keeps the one-expression
    * (+,*,/,sqrt) IEEE tree, with den formed as the DOUBLE product
    * of the two exactly-computed decimal factors (their exact
    * product can pass 1e38, so each factor converts once — the
    * identical two-conversion tree on both engines). */
  def autocorrDaily(daily: DataFrame, lags: Seq[Int]): DataFrame = {
    val dec = "decimal(38,0)"
    val lagged = lags.map { l =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("day_us"))
      daily
        .withColumn("y", lead(col("x"), l).over(w))
        .filter(col("y").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x").cast(dec) * col("y")).as("sxy"),
          sum(col("x").cast(dec) * col("x")).as("sx2"),
          sum(col("y").cast(dec) * col("y")).as("sy2"))
        .select(col("event_type"), lit(l).as("lag"), col("n").as("n_pairs"),
          col("sx"), col("sy"), col("sxy").cast(dec).as("sxy"),
          col("sx2").cast(dec).as("sx2"), col("sy2").cast(dec).as("sy2"))
    }
    val all = lagged.reduce(_ unionByName _)
    val num = (col("n_pairs").cast(dec) * col("sxy") -
      col("sx").cast(dec) * col("sy")).cast("double")
    val denA = (col("n_pairs").cast(dec) * col("sx2") -
      col("sx").cast(dec) * col("sx")).cast("double")
    val denB = (col("n_pairs").cast(dec) * col("sy2") -
      col("sy").cast(dec) * col("sy")).cast("double")
    val den = denA * denB
    all.select(col("event_type"), col("lag"), col("n_pairs"),
      when(den === 0.0, 0.0).otherwise(round(num / sqrt(den), 6)).as("acf"))
  }

  def r63Autocorr(spark: SparkSession, dir: String): DataFrame =
    autocorr(Tables.events(spark, dir), Seq(1, 2, 7))

  val r63Sql: String = {
    val lagBlocks = Seq(1, 2, 7).map { l =>
      s"""SELECT event_type, $l AS lag, count(*) AS n_pairs,
         |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |  sum(CAST(x AS HUGEINT) * y) AS sxy,
         |  sum(CAST(x AS HUGEINT) * x) AS sx2,
         |  sum(CAST(y AS HUGEINT) * y) AS sy2
         |FROM (SELECT event_type, x,
         |    lead(x, $l) OVER (PARTITION BY event_type ORDER BY day_us)
         |      AS y
         |  FROM daily)
         |WHERE y IS NOT NULL GROUP BY 1""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH sparse AS MATERIALIZED (SELECT event_type,
       |    epoch_us(date_trunc('day', ts)) AS day_us,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1, 2),
       |span AS (SELECT event_type, min(day_us) AS lo, max(day_us) AS hi
       |  FROM sparse GROUP BY 1),
       |cal AS (SELECT event_type,
       |    unnest(generate_series(lo, hi, 86400000000)) AS day_us
       |  FROM span),
       |daily AS MATERIALIZED (SELECT c.event_type, c.day_us,
       |    COALESCE(s.x, 0) AS x
       |  FROM cal c LEFT JOIN sparse s
       |    ON c.event_type = s.event_type AND c.day_us = s.day_us),
       |lg AS ($lagBlocks)
       |SELECT event_type, lag, n_pairs,
       |  CASE WHEN CAST(n_pairs * sx2 - CAST(sx AS HUGEINT) * sx AS DOUBLE)
       |      * CAST(n_pairs * sy2 - CAST(sy AS HUGEINT) * sy AS DOUBLE)
       |      = 0.0 THEN 0.0
       |    ELSE round(
       |      CAST(n_pairs * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) /
       |      sqrt(CAST(n_pairs * sx2 - CAST(sx AS HUGEINT) * sx AS DOUBLE)
       |        * CAST(n_pairs * sy2 - CAST(sy AS HUGEINT) * sy AS DOUBLE)),
       |      6) END AS acf
       |FROM lg""".stripMargin
  }

  // ---- r64: CUSUM changepoint detection ----------------------------

  /** r64: CUSUM changepoint per event type over the daily revenue
    * (cents) series — the day where the cumulative deviation from
    * the series mean peaks, i.e. where the level shifted. The
    * classic integer trick keeps it division-free: cusum_k of
    * (n·x_i − S) is n times the mean-centered CUSUM, so its argmax
    * is the same day and every value is an exact long. Ties break
    * to the earliest day; the emitted peak value is the scaled long
    * itself (callers divide by n once if they want cents).
    *
    * 100 TB shape: one partial-agg groupBy to |type|·|day| rows,
    * a broadcast-size per-type total join, one per-type ordered
    * window pass for the prefix sum, and a 1-row-per-type argmax
    * (row_number). The fact table is scanned once. */
  def cusumChangepoint(eventsIn: DataFrame): DataFrame = {
    val daily = eventsIn
      .groupBy(col("event_type"),
        unix_micros(date_trunc("day", col("ts"))).as("day_us"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("x"))
    val tot = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cs = daily.join(broadcast(tot), Seq("event_type"))
      .withColumn("cusum", sum(col("x") * col("n") - col("s")).over(w))
    val pick = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("cusum")).desc, col("day_us"))
    cs.withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day_us").as("cp_day_us"),
        col("cusum").as("cusum_peak_scaled"), col("n").as("n_days"))
  }

  def r64Cusum(spark: SparkSession, dir: String): DataFrame =
    cusumChangepoint(Tables.events(spark, dir))

  val r64Sql: String =
    """WITH daily AS (SELECT event_type,
      |    epoch_us(date_trunc('day', ts)) AS day_us,
      |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |tot AS (SELECT event_type, count(*) AS n, CAST(sum(x) AS BIGINT) AS s
      |  FROM daily GROUP BY 1),
      |cs AS (SELECT d.event_type, d.day_us, t.n,
      |    CAST(sum(d.x * t.n - t.s) OVER (PARTITION BY d.event_type
      |      ORDER BY d.day_us
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cusum
      |  FROM daily d JOIN tot t ON t.event_type = d.event_type),
      |rk AS (SELECT event_type, day_us, cusum, n,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY abs(cusum) DESC, day_us) AS rn
      |  FROM cs)
      |SELECT event_type, day_us AS cp_day_us,
      |  cusum AS cusum_peak_scaled, CAST(n AS BIGINT) AS n_days
      |FROM rk WHERE rn = 1""".stripMargin

  // ---- r65: top session paths (ordered event sequences) -----------

  /** r65: PATH MINING — the frequency table of each (user, day)
    * session's first three event types in arrival order, the
    * "how do journeys start" report between r55's 1-step Markov
    * transitions and r33's fixed-target funnel. Ordering is total
    * ((ts, event_id) — event_id breaks timestamp ties), and the
    * path string is assembled from RANKED SLOTS (max-of-case per
    * rank), never from collect_list, whose intra-group order Spark
    * does not define — the determinism discipline r55 set.
    *
    * 100 TB shape: one keyed exchange for the (user, day) window
    * sort; the slot pivot collapses each session to one row in the
    * same pass; the path frequency agg is two-level (path, user)
    * then path — both partial, no count-distinct Expand; the
    * session total is a one-row broadcast. */
  def topPaths(eventsIn: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"), col("day_us"))
      .orderBy(col("ts"), col("event_id"))
    val ranked = eventsIn
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"),
        unix_micros(date_trunc("day", col("ts"))).as("day_us"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    val sessions = ranked
      .groupBy(col("user_id"), col("day_us"))
      .agg(
        max(when(col("rn") === 1, col("event_type"))).as("e1"),
        max(when(col("rn") === 2, col("event_type"))).as("e2"),
        max(when(col("rn") === 3, col("event_type"))).as("e3"))
      .select(col("user_id"),
        concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
    val perUser = sessions.groupBy(col("path"), col("user_id"))
      .agg(count(lit(1)).as("c"))
    val tot = perUser.select(sum(col("c")).as("t"))
    perUser.groupBy(col("path"))
      .agg(sum(col("c")).as("n_sessions"),
        count(lit(1)).as("n_users"))
      .crossJoin(broadcast(tot))
      .select(col("path"), col("n_sessions"), col("n_users"),
        floor(col("n_sessions") * lit(1000000L) / col("t")).cast("long")
          .as("share_ppm"))
  }

  def r65TopPaths(spark: SparkSession, dir: String): DataFrame =
    topPaths(Tables.events(spark, dir))

  val r65Sql: String =
    """WITH ev AS (SELECT user_id, event_id, ts, event_type,
      |    epoch_us(date_trunc('day', ts)) AS day_us FROM events),
      |rk AS (SELECT user_id, day_us, event_type,
      |    row_number() OVER (PARTITION BY user_id, day_us
      |      ORDER BY ts, event_id) AS rn
      |  FROM ev),
      |sess AS (SELECT user_id,
      |    concat_ws('>',
      |      max(CASE WHEN rn = 1 THEN event_type END),
      |      max(CASE WHEN rn = 2 THEN event_type END),
      |      max(CASE WHEN rn = 3 THEN event_type END)) AS path
      |  FROM rk WHERE rn <= 3 GROUP BY user_id, day_us),
      |pu AS (SELECT path, user_id, count(*) AS c
      |  FROM sess GROUP BY 1, 2),
      |tt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM pu)
      |SELECT path, CAST(sum(c) AS BIGINT) AS n_sessions,
      |  count(*) AS n_users,
      |  CAST(floor(sum(c) * 1000000 / tt.t) AS BIGINT) AS share_ppm
      |FROM pu CROSS JOIN tt GROUP BY path, tt.t""".stripMargin

  // ---- r66: half-life-decayed leaderboard --------------------------

  /** r66: RECENCY-DECAYED leaderboard — per event type, the top-10
    * users by revenue where a contribution's weight halves every 7
    * days of age (age measured from the corpus' max event day, so
    * the query is deterministic). The classic trending-score shape,
    * made hash-exact by keeping the decay INTEGER: weight =
    * cents >> (age_days div 7) — an arithmetic right shift IS floor
    * division by 2^k for non-negative cents, identical on both
    * engines; no exp(), no float half-life. Shift amounts >= 63 are
    * clamped to weight 0 explicitly: Spark's shiftright follows Java
    * long-shift semantics and masks the amount to 6 bits (shift 64
    * would silently regain FULL weight), while DuckDB's >> yields 0 —
    * the clamp makes both engines agree with the documented decay on
    * a corpus spanning 64+ half-lives.
    *
    * 100 TB shape: the "now" anchor is a one-row broadcast max; the
    * decayed contribution is row-local; the (type, user) partial agg
    * collapses the fact table; top-10 is a WindowGroupLimit over the
    * aggregated relation (rank ties broken by user id). */
  def decayedLeaderboard(eventsIn: DataFrame, halfLifeDays: Int,
      topK: Int): DataFrame = {
    val ev = eventsIn.select(col("event_type"), col("user_id"),
      unix_micros(date_trunc("day", col("ts"))).as("day_us"),
      floor(col("value") * 100).cast("long").as("cents"))
    val anchor = ev.select(max(col("day_us")).as("now_us"))
    val hlUs = 86400000000L * halfLifeDays
    val scored = ev.crossJoin(broadcast(anchor))
      .withColumn("age_hl", expr(s"(now_us - day_us) div ${hlUs}L"))
      .withColumn("decayed",
        when(col("age_hl") >= 63, lit(0L))
          .otherwise(expr("shiftright(cents, cast(age_hl as int))")))
    val agg = scored.groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("decayed")).as("decayed_cents"),
        count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("decayed_cents").desc, col("user_id"))
    agg.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("event_type"), col("rank"), col("user_id"),
        col("decayed_cents"), col("n_events"))
  }

  def r66DecayedLeaderboard(spark: SparkSession, dir: String): DataFrame =
    decayedLeaderboard(Tables.events(spark, dir), halfLifeDays = 7,
      topK = 10)

  val r66Sql: String =
    """WITH ev AS (SELECT event_type, user_id,
      |    epoch_us(date_trunc('day', ts)) AS day_us,
      |    CAST(floor(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |an AS (SELECT max(day_us) AS now_us FROM ev),
      |sc AS (SELECT event_type, user_id,
      |    CASE WHEN (now_us - day_us) // 604800000000 >= 63 THEN 0
      |      ELSE cents >> CAST((now_us - day_us) // 604800000000 AS INT)
      |      END AS decayed
      |  FROM ev CROSS JOIN an),
      |ag AS (SELECT event_type, user_id,
      |    CAST(sum(decayed) AS BIGINT) AS decayed_cents,
      |    count(*) AS n_events
      |  FROM sc GROUP BY 1, 2),
      |rk AS (SELECT event_type, user_id, decayed_cents, n_events,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |      ORDER BY decayed_cents DESC, user_id) AS INT) AS rank
      |  FROM ag)
      |SELECT event_type, rank, user_id, decayed_cents, n_events
      |FROM rk WHERE rank <= 10""".stripMargin

  // ---- r67: week-over-week percent change --------------------------

  /** r67: WoW GROWTH — weekly revenue per event type with the
    * percent change against the previous week, the first derivative
    * every BI dashboard draws next to r43's levels. Division is
    * guarded (a zero-revenue previous week reports 0, the no-NULL
    * contract) and the change is floor-ppm over exact cents, so
    * negative weeks floor toward −∞ identically on both engines.
    *
    * 100 TB shape: one partial-agg groupBy to |type|·|week| rows;
    * the lag is a per-type ordered window over that tiny series;
    * the fact table is scanned once. */
  def weekOverWeek(eventsIn: DataFrame): DataFrame = {
    val weekly = eventsIn
      .groupBy(col("event_type"),
        unix_micros(date_trunc("week", col("ts"))).as("week_us"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("week_us"))
    weekly
      .withColumn("prev_cents", lag(col("cents"), 1).over(w))
      .select(col("event_type"), col("week_us"), col("cents"),
        coalesce(col("prev_cents"), lit(0L)).as("prev_cents"),
        when(coalesce(col("prev_cents"), lit(0L)) === 0, lit(0L))
          .otherwise(floor((col("cents") - col("prev_cents")) *
            lit(1000000L) / col("prev_cents")).cast("long"))
          .as("change_ppm"))
  }

  def r67WeekOverWeek(spark: SparkSession, dir: String): DataFrame =
    weekOverWeek(Tables.events(spark, dir))

  val r67Sql: String =
    """WITH wk AS (SELECT event_type,
      |    epoch_us(date_trunc('week', ts)) AS week_us,
      |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM events GROUP BY 1, 2),
      |lg AS (SELECT event_type, week_us, cents,
      |    lag(cents) OVER (PARTITION BY event_type ORDER BY week_us)
      |      AS prev_cents
      |  FROM wk)
      |SELECT event_type, week_us, cents,
      |  coalesce(prev_cents, 0) AS prev_cents,
      |  CASE WHEN coalesce(prev_cents, 0) = 0 THEN CAST(0 AS BIGINT)
      |    ELSE CAST(floor((cents - prev_cents) * 1000000
      |      / prev_cents) AS BIGINT) END AS change_ppm
      |FROM lg""".stripMargin

  // ---- r68: ABC / Pareto classification ----------------------------

  /** r68: ABC ANALYSIS — every part classified by its cumulative
    * share of total revenue when ranked richest-first: A carries the
    * first 70%, B to 90%, C the tail. The Pareto curve behind "which
    * 20% of the catalog earns 80%", emitted per part so downstream
    * joins can gate on the class. Shares stay integer (cum·10 vs
    * total·7/9 — no percentage division anywhere); ranking ties
    * break on part key.
    *
    * 100 TB shape: the per-part partial agg collapses the fact
    * table to the part DIMENSION before any ordering; the
    * cumulative window then sorts dimension-sized data (one
    * exchange; range-partitioned two-pass prefix sums are the
    * documented escalation when even the dimension is huge); the
    * grand total is a one-row broadcast. */
  def abcClassification(liIn: DataFrame): DataFrame = {
    val perPart = liIn
      .groupBy(col("l_partkey"))
      .agg(sum(floor(col("l_extendedprice") * 100).cast("long"))
        .as("revenue_cents"))
    val tot = perPart.select(sum(col("revenue_cents")).as("t"))
    val w = Window.orderBy(col("revenue_cents").desc, col("l_partkey"))
    perPart
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_cents", sum(col("revenue_cents")).over(
        Window.orderBy(col("revenue_cents").desc, col("l_partkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .select(col("l_partkey"), col("rank"), col("revenue_cents"),
        col("cum_cents"),
        when(col("cum_cents") * 10 <= col("t") * 7, "A")
          .when(col("cum_cents") * 10 <= col("t") * 9, "B")
          .otherwise("C").as("abc_class"))
  }

  def r68AbcClassification(spark: SparkSession, dir: String): DataFrame =
    abcClassification(Tables.lineitem(spark, dir))

  val r68Sql: String =
    """WITH pp AS (SELECT l_partkey,
      |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
      |      AS BIGINT) AS revenue_cents
      |  FROM lineitem GROUP BY 1),
      |tt AS (SELECT CAST(sum(revenue_cents) AS BIGINT) AS t FROM pp),
      |rk AS (SELECT l_partkey, revenue_cents,
      |    CAST(row_number() OVER (ORDER BY revenue_cents DESC,
      |      l_partkey) AS INT) AS rank,
      |    CAST(sum(revenue_cents) OVER (ORDER BY revenue_cents DESC,
      |      l_partkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum_cents
      |  FROM pp)
      |SELECT l_partkey, rank, revenue_cents, cum_cents,
      |  CASE WHEN cum_cents * 10 <= tt.t * 7 THEN 'A'
      |    WHEN cum_cents * 10 <= tt.t * 9 THEN 'B'
      |    ELSE 'C' END AS abc_class
      |FROM rk CROSS JOIN tt""".stripMargin

  // ---- r69: RFM customer segmentation ------------------------------

  /** r69: RFM SEGMENTATION — every customer scored 1–5 on Recency
    * (latest order day), Frequency (order count) and Monetary
    * (cents), quintiles assigned richest-first so 1 is best, with
    * the concatenated segment label ("111" = champions). ntile is
    * deterministic once the ordering is total — every quintile
    * orders by (metric best-first, custkey), the r13/r26 window
    * discipline — and both engines split remainders identically
    * (earlier buckets larger), so the labels hash.
    *
    * 100 TB shape: ONE partial-agg groupBy collapses orders to the
    * customer dimension; the three quintile windows sort
    * dimension-sized data (the r68 escalation note applies); no
    * join back to the fact table. */
  def rfm(ordersIn: DataFrame): DataFrame = {
    val base = ordersIn.groupBy(col("o_custkey"))
      .agg(max(unix_micros(date_trunc("day", col("o_orderdate"))))
        .as("last_day_us"),
        count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
    val rw = Window.orderBy(col("last_day_us").desc, col("o_custkey"))
    val fw = Window.orderBy(col("n_orders").desc, col("o_custkey"))
    val mw = Window.orderBy(col("cents").desc, col("o_custkey"))
    base
      .withColumn("r_q", ntile(5).over(rw))
      .withColumn("f_q", ntile(5).over(fw))
      .withColumn("m_q", ntile(5).over(mw))
      .select(col("o_custkey"), col("last_day_us"), col("n_orders"),
        col("cents"), col("r_q"), col("f_q"), col("m_q"),
        concat(col("r_q").cast("string"), col("f_q").cast("string"),
          col("m_q").cast("string")).as("segment"))
  }

  def r69Rfm(spark: SparkSession, dir: String): DataFrame =
    rfm(Tables.orders(spark, dir))

  val r69Sql: String =
    """WITH b AS (SELECT o_custkey,
      |    max(epoch_us(date_trunc('day', o_orderdate))) AS last_day_us,
      |    count(*) AS n_orders,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      |q AS (SELECT o_custkey, last_day_us, n_orders, cents,
      |    CAST(ntile(5) OVER (ORDER BY last_day_us DESC, o_custkey)
      |      AS INT) AS r_q,
      |    CAST(ntile(5) OVER (ORDER BY n_orders DESC, o_custkey)
      |      AS INT) AS f_q,
      |    CAST(ntile(5) OVER (ORDER BY cents DESC, o_custkey)
      |      AS INT) AS m_q
      |  FROM b)
      |SELECT o_custkey, last_day_us, n_orders, cents, r_q, f_q, m_q,
      |  CAST(r_q AS VARCHAR) || CAST(f_q AS VARCHAR)
      |    || CAST(m_q AS VARCHAR) AS segment
      |FROM q""".stripMargin

  // ---- r70: data-expectations validation report --------------------

  /** r70: the DATA CONTRACT audit — a declared expectation suite
    * (range, positivity, referential integrity, key uniqueness,
    * non-null domain) evaluated over the warehouse into one
    * violations report, the Great-Expectations shape as a single
    * query. Every rule is an aggregate over its own scan (range
    * rules are partial-agg sums of a boolean; the FK rule is a LEFT
    * ANTI join count; uniqueness is count − count-distinct via a
    * two-level agg, no Expand), unioned into (rule, n_checked,
    * n_violations, passed). A failing expectation (c_acctbal ≥ 0
    * here) reports its violation count rather than erroring — the
    * report IS the artifact.
    *
    * 100 TB shape: each rule touches one table once with map-side
    * partial aggregation; the FK anti-join is the r14 semi/anti
    * plan (dimension side broadcasts); the union is |rules| rows. */
  def expectations(li: DataFrame, ordersIn: DataFrame,
      customerIn: DataFrame, eventsIn: DataFrame): DataFrame = {
    def rule(name: String, df: DataFrame, viol: Column): DataFrame =
      df.agg(count(lit(1)).as("n_checked"),
          sum(when(viol, 1L).otherwise(0L)).as("n_violations"))
        .select(lit(name).as("rule"), col("n_checked"),
          col("n_violations"))
    val fkViol = ordersIn.join(
        customerIn.select(col("c_custkey").as("o_custkey")),
        Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val fk = ordersIn.agg(count(lit(1)).as("n_checked"))
      .crossJoin(broadcast(fkViol))
      .select(lit("orders.o_custkey references customer").as("rule"),
        col("n_checked"), col("n_violations"))
    val uniq = ordersIn.groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).as("n_checked"),
        (sum(col("c")) - count(lit(1))).as("n_violations"))
      .select(lit("orders.o_orderkey unique").as("rule"),
        col("n_checked"), col("n_violations"))
    Seq(
      rule("lineitem.l_quantity in [1,50]", li,
        !col("l_quantity").between(1.0, 50.0)),
      rule("lineitem.l_discount in [0,0.1]", li,
        !col("l_discount").between(0.0, 0.1)),
      rule("orders.o_totalprice positive", ordersIn,
        col("o_totalprice") <= 0.0),
      rule("customer.c_acctbal non-negative", customerIn,
        col("c_acctbal") < 0.0),
      rule("customer.c_mktsegment present", customerIn,
        col("c_mktsegment").isNull || col("c_mktsegment") === ""),
      rule("events.value positive", eventsIn, col("value") <= 0.0),
      fk, uniq)
      .reduce(_ unionByName _)
      .withColumn("passed", col("n_violations") === 0L)
  }

  def r70Expectations(spark: SparkSession, dir: String): DataFrame =
    expectations(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      Tables.customer(spark, dir), Tables.events(spark, dir))

  val r70Sql: String =
    """SELECT 'lineitem.l_quantity in [1,50]' AS rule,
      |  count(*) AS n_checked,
      |  CAST(sum(CASE WHEN NOT (l_quantity BETWEEN 1.0 AND 50.0)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
      |  CAST(sum(CASE WHEN NOT (l_quantity BETWEEN 1.0 AND 50.0)
      |    THEN 1 ELSE 0 END) AS BIGINT) = 0 AS passed
      |FROM lineitem
      |UNION ALL
      |SELECT 'lineitem.l_discount in [0,0.1]', count(*),
      |  CAST(sum(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.1)
      |    THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(sum(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.1)
      |    THEN 1 ELSE 0 END) AS BIGINT) = 0
      |FROM lineitem
      |UNION ALL
      |SELECT 'orders.o_totalprice positive', count(*),
      |  CAST(sum(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END)
      |    AS BIGINT),
      |  CAST(sum(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END)
      |    AS BIGINT) = 0
      |FROM orders
      |UNION ALL
      |SELECT 'customer.c_acctbal non-negative', count(*),
      |  CAST(sum(CASE WHEN c_acctbal < 0.0 THEN 1 ELSE 0 END)
      |    AS BIGINT),
      |  CAST(sum(CASE WHEN c_acctbal < 0.0 THEN 1 ELSE 0 END)
      |    AS BIGINT) = 0
      |FROM customer
      |UNION ALL
      |SELECT 'customer.c_mktsegment present', count(*),
      |  CAST(sum(CASE WHEN c_mktsegment IS NULL OR c_mktsegment = ''
      |    THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(sum(CASE WHEN c_mktsegment IS NULL OR c_mktsegment = ''
      |    THEN 1 ELSE 0 END) AS BIGINT) = 0
      |FROM customer
      |UNION ALL
      |SELECT 'events.value positive', count(*),
      |  CAST(sum(CASE WHEN value <= 0.0 THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(sum(CASE WHEN value <= 0.0 THEN 1 ELSE 0 END) AS BIGINT) = 0
      |FROM events
      |UNION ALL
      |SELECT 'orders.o_custkey references customer',
      |  (SELECT count(*) FROM orders),
      |  (SELECT count(*) FROM orders o LEFT JOIN customer c
      |    ON c.c_custkey = o.o_custkey WHERE c.c_custkey IS NULL),
      |  (SELECT count(*) FROM orders o LEFT JOIN customer c
      |    ON c.c_custkey = o.o_custkey WHERE c.c_custkey IS NULL) = 0
      |UNION ALL
      |SELECT 'orders.o_orderkey unique',
      |  (SELECT count(*) FROM orders),
      |  (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders),
      |  (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) = 0""".stripMargin

  // ---- r71: Gini coefficient of customer spend ---------------------

  /** r71: the GINI COEFFICIENT of per-customer spend — the single
    * inequality number behind r68's Pareto curve (0 = equal, → 1 =
    * one whale). Exact rank formulation over cents sorted
    * ascending: G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ); ranks are a
    * row_number under the total (cents, custkey) order — ties
    * contribute identically to the SUM whichever way they break.
    * Every moment that multiplies two corpus-sized longs is carried
    * in decimal(38,0) internally (Σ i·cents and n·Σ cents blow past
    * Long.MaxValue at large customer counts), but NOTHING fractional
    * or decimal crosses the output edge: the coefficient ships as
    * gini_ppm = ⌊num·10⁶ / den⌋ via exact integer division — both
    * operands non-negative (Chebyshev's sum inequality makes num ≥ 0
    * for ascending ranks), so truncating and flooring division agree
    * and the value is engine-independent to the last bit.
    *
    * 100 TB shape: one partial-agg groupBy collapses orders to the
    * customer dimension; one dimension-sized ordered window pass
    * (the r68 escalation note applies); the closing agg is ONE
    * row. */
  def gini(ordersIn: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val base = ordersIn.groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
    val w = Window.orderBy(col("cents"), col("o_custkey"))
    val num = (lit(2L).cast(dec) * col("si") -
      (col("n") + 1).cast(dec) * col("s")).cast(dec)
    val den = (col("n").cast(dec) * col("s")).cast(dec)
    base.withColumn("i", row_number().over(w).cast("long"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
        sum(col("i").cast(dec) * col("cents")).as("si"))
      .select(col("n"), col("s"),
        num.as("gnum"), den.as("gden"))
      .selectExpr("n", "s",
        "CAST(CASE WHEN n = 0 OR s = 0 THEN 0 " +
          "ELSE (gnum * 1000000) div gden END AS BIGINT) AS gini_ppm")
  }

  def r71Gini(spark: SparkSession, dir: String): DataFrame =
    gini(Tables.orders(spark, dir))

  val r71Sql: String =
    """WITH b AS (SELECT o_custkey,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      |r AS (SELECT cents, CAST(row_number() OVER
      |    (ORDER BY cents, o_custkey) AS BIGINT) AS i FROM b),
      |a AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS s,
      |    sum(CAST(i AS HUGEINT) * cents) AS si FROM r)
      |SELECT n, s,
      |  CAST(CASE WHEN n = 0 OR s = 0 THEN 0
      |    ELSE ((2 * si - (n + 1) * CAST(s AS HUGEINT)) * 1000000)
      |      // (CAST(n AS HUGEINT) * s)
      |    END AS BIGINT) AS gini_ppm
      |FROM a""".stripMargin

  // ---- r72: last-touch conversion attribution ----------------------

  /** r72: TOUCH-TYPE REVENUE CREDIT — every purchase is credited to
    * the user's most recent preceding touch event within a 7-day
    * lookback, where multiple touch TYPES (click, view) COMPETE for
    * the credit, and revenue (cents) is attributed per winning type;
    * purchases with no in-window touch report under '(none)'. The
    * channel-mix complement of r44 (r44 fixes the touch type to
    * clicks and reports the LAG distribution through the AsOfJoin
    * operator; r72 answers "which channel gets the money" with a
    * bounded lookback). The "most recent" pick is an argmax over the total
    * (ts, event_id) order carried as a STRUCT running max inside one
    * per-user window — struct comparison is lexicographic fieldwise
    * on both engines, and event_id uniqueness makes the tiebreak
    * total, so the attribution is deterministic and hash-exact.
    *
    * 100 TB shape: ONE keyed window pass (partition by user, order by
    * time) computes every purchase's candidate touch — no self-join
    * of the event table against itself (the naive as-of spelling
    * shuffles events twice and explodes on hot users); the closing
    * agg is |touch types|+1 rows. */
  def lastTouchAttribution(eventsIn: DataFrame, touchTypes: Seq[String],
      convType: String, lookbackUs: Long): DataFrame = {
    val ev = eventsIn.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"),
      floor(col("value") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val lt = max(when(col("event_type").isInCollection(touchTypes),
      struct(col("ts_us").as("t"), col("event_id").as("e"),
        col("event_type").as("ty")))).over(w)
    ev.withColumn("l", lt)
      .filter(col("event_type") === convType)
      .withColumn("touch_type",
        when(col("l").isNotNull &&
          col("l.t") >= col("ts_us") - lookbackUs, col("l.ty"))
          .otherwise(lit("(none)")))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("cents")).as("attributed_cents"))
  }

  def r72Attribution(spark: SparkSession, dir: String): DataFrame =
    lastTouchAttribution(Tables.events(spark, dir),
      touchTypes = Seq("click", "view"), convType = "purchase",
      lookbackUs = 604800000000L)

  val r72Sql: String =
    """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |    event_type, CAST(floor(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |lt AS (SELECT *, (max(CASE WHEN event_type IN ('click', 'view')
      |      THEN struct_pack(t := ts_us, e := event_id,
      |        ty := event_type) END)
      |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) AS l
      |  FROM ev)
      |SELECT CASE WHEN l IS NOT NULL AND l.t >= ts_us - 604800000000
      |    THEN l.ty ELSE '(none)' END AS touch_type,
      |  count(*) AS n_purchases,
      |  CAST(sum(cents) AS BIGINT) AS attributed_cents
      |FROM lt WHERE event_type = 'purchase' GROUP BY 1""".stripMargin

  // ---- r73: Theil–Sen robust trend ---------------------------------

  /** r73: THEIL–SEN robust trend of daily revenue per event type —
    * the median of all pairwise day-to-day slopes, the
    * outlier-immune alternative to least squares (one flash-sale
    * day drags an OLS slope arbitrarily; it moves a median of
    * O(days²) slopes by one rank). Hash discipline: inputs to every
    * slope are exact integers (cents, day numbers), the slope is one
    * IEEE double division evaluated identically on both engines,
    * the median element is selected by rank over the deterministic
    * total order (slope, i, j) — lower median at rank (n+1) div 2 —
    * and the emitted value floors to ppm.
    *
    * 100 TB shape: the fact table collapses to |type|·|day| rows in
    * one partial-agg pass; the pair self-join is DAY-bounded (|days|²
    * per type — calendar-sized, corpus-size-independent), and the
    * median is a per-type rank over that bounded frame. */
  def theilSen(eventsIn: DataFrame): DataFrame = {
    val daily = eventsIn.groupBy(col("event_type"),
        (unix_micros(date_trunc("day", col("ts"))) / 86400000000L)
          .cast("long").as("d"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("y"))
    val pairs = daily.alias("a").join(daily.alias("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.d") < col("b.d"))
      .select(col("a.event_type").as("event_type"),
        col("a.d").as("xi"), col("b.d").as("xj"),
        ((col("b.y") - col("a.y")).cast("double") /
          (col("b.d") - col("a.d")).cast("double")).as("slope"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("slope"), col("xi"), col("xj"))
    pairs
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("event_type"), col("n").as("n_pairs"),
        floor(col("slope") * 1000000.0).cast("long")
          .as("slope_cents_per_day_ppm"))
  }

  def r73TheilSen(spark: SparkSession, dir: String): DataFrame =
    theilSen(Tables.events(spark, dir))

  val r73Sql: String =
    """WITH daily AS MATERIALIZED (SELECT event_type,
      |    epoch_us(date_trunc('day', ts)) // 86400000000 AS d,
      |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |pr AS (SELECT a.event_type, a.d AS xi, b.d AS xj,
      |    CAST(b.y - a.y AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.d < b.d),
      |rk AS (SELECT event_type, slope,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |      ORDER BY slope, xi, xj) AS BIGINT) AS rn,
      |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM pr)
      |SELECT event_type, n AS n_pairs,
      |  CAST(floor(slope * 1000000.0) AS BIGINT)
      |    AS slope_cents_per_day_ppm
      |FROM rk WHERE rn = (n + 1) // 2""".stripMargin

  // ---- r74: chi-square independence test ---------------------------

  /** r74: CHI-SQUARE test of independence between event type and
    * day-of-week — "is activity mix a function of the weekday", the
    * first question behind staffing and anomaly baselines. The
    * statistic stays EXACT-integer end to end: dow derives from the
    * epoch day number ((day + 4) % 7, 0 = Sunday — engine-neutral,
    * no locale/week-start semantics), each cell's contribution is
    * ((O·T − R·C)²·1e6) div (T·R·C) over decimal(38,0) — the
    * floor-quantized per-cell chi² in micro-units, summed as exact
    * longs (the statistic is DEFINED as the floor-per-cell sum, so
    * both engines agree bit-for-bit; the quantization error is ≤
    * |cells| micro-units, noise at any real magnitude). Magnitude
    * bound: (O·T)² ≤ T⁴ caps exactness at T ≈ 3e9 events per the
    * decimal(38) ceiling — beyond that, scale the micro factor down
    * (documented escalation).
    *
    * 100 TB shape: ONE partial-agg pass collapses the fact table to
    * ≤ |types|·7 cells; margins and the total derive from those few
    * rows and broadcast back; degrees of freedom ride along. */
  def chiSquareDow(eventsIn: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = eventsIn.groupBy(col("event_type"),
        (((unix_micros(date_trunc("day", col("ts"))) / 86400000000L)
          .cast("long") + 4) % 7).as("dow"))
      .agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy(col("event_type")).agg(sum(col("o")).as("r"))
    val colT = cells.groupBy(col("dow")).agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("t"),
      countDistinct(col("event_type")).as("nr"),
      countDistinct(col("dow")).as("nc"))
    cells.join(broadcast(rowT), Seq("event_type"))
      .join(broadcast(colT), Seq("dow"))
      .crossJoin(broadcast(tot))
      .select(expr(s"cast(o as $dec) * t - cast(r as $dec) * c").as("num"),
        expr(s"cast(t as $dec) * r * c").as("den"),
        col("nr"), col("nc"))
      .groupBy(col("nr"), col("nc"))
      .agg(count(lit(1)).as("n_cells"),
        sum(expr("cast((num * num * 1000000) div den as bigint)"))
          .as("chi2_micro"))
      .select(col("n_cells"),
        ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
        col("chi2_micro"))
  }

  def r74ChiSquare(spark: SparkSession, dir: String): DataFrame =
    chiSquareDow(Tables.events(spark, dir))

  val r74Sql: String =
    """WITH cells AS MATERIALIZED (SELECT event_type,
      |    (epoch_us(date_trunc('day', ts)) // 86400000000 + 4) % 7
      |      AS dow,
      |    CAST(count(*) AS BIGINT) AS o
      |  FROM events GROUP BY 1, 2),
      |rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r
      |  FROM cells GROUP BY 1),
      |ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c
      |  FROM cells GROUP BY 1),
      |tt AS (SELECT CAST(sum(o) AS BIGINT) AS t,
      |    count(DISTINCT event_type) AS nr,
      |    count(DISTINCT dow) AS nc
      |  FROM cells)
      |SELECT count(*) AS n_cells,
      |  CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
      |  CAST(sum((CAST(o AS HUGEINT) * t - CAST(r AS HUGEINT) * c)
      |      * (CAST(o AS HUGEINT) * t - CAST(r AS HUGEINT) * c)
      |      * 1000000
      |    // (CAST(t AS HUGEINT) * r * c)) AS BIGINT) AS chi2_micro
      |FROM cells JOIN rt USING (event_type) JOIN ct USING (dow)
      |CROSS JOIN tt
      |GROUP BY nr, nc""".stripMargin

  // ---- r75: seasonal-naive forecast backtest -----------------------

  /** r75: SEASONAL-NAIVE BACKTEST — per event type, every day's
    * revenue is "forecast" as the expanding mean of all PRIOR
    * same-weekday days, and the query reports the per-type mean
    * absolute error in cents: the baseline every forecasting
    * pipeline must beat before any model earns its keep (and the
    * standing data-quality monitor for seasonality drift). Exact
    * integer discipline end-to-end: daily revenue in cents (long),
    * weekday = d mod 7 on the epoch-day number (no calendar API),
    * the prior mean is ONE integral division — truncation toward
    * zero spelled identically on both engines (the r71 sign
    * discipline: floor(|x|/n) re-signed, since the revenue sum can
    * be negative) — and |y − forecast| sums in longs.
    *
    * 100 TB shape: the fact table collapses to |type|·|day| rows in
    * one partial-agg pass; the expanding window runs over that
    * calendar-bounded frame (ROWS UNBOUNDED PRECEDING → 1 PRECEDING
    * per (type, weekday)); the closing agg is |type| rows. */
  def seasonalNaive(eventsIn: DataFrame): DataFrame = {
    val daily = eventsIn.groupBy(col("event_type"),
        (unix_micros(date_trunc("day", col("ts"))) / 86400000000L)
          .cast("long").as("d"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("y"))
      .withColumn("dow", col("d") % 7)
    val w = Window.partitionBy(col("event_type"), col("dow"))
      .orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    daily
      .withColumn("psum", sum(col("y")).over(w))
      .withColumn("pcnt", count(lit(1)).over(w))
      .filter(col("pcnt") >= 1)
      .withColumn("err", abs(col("y") - expr("psum div pcnt")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_forecast_days"),
        sum(col("err")).as("total_abs_err_cents"))
      .select(col("event_type"), col("n_forecast_days"),
        col("total_abs_err_cents"),
        expr("total_abs_err_cents div n_forecast_days").as("mae_cents"))
  }

  def r75SeasonalNaive(spark: SparkSession, dir: String): DataFrame =
    seasonalNaive(Tables.events(spark, dir))

  val r75Sql: String =
    """WITH daily AS (SELECT event_type,
      |    epoch_us(date_trunc('day', ts)) // 86400000000 AS d,
      |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |f AS (SELECT event_type, d, y,
      |    sum(y) OVER w AS psum, count(*) OVER w AS pcnt
      |  FROM daily WINDOW w AS (PARTITION BY event_type, d % 7
      |    ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |g AS (SELECT event_type,
      |    abs(y - (CASE WHEN psum >= 0 THEN psum // pcnt
      |      ELSE -((-psum) // pcnt) END)) AS err
      |  FROM f WHERE pcnt >= 1)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_forecast_days,
      |  CAST(sum(err) AS BIGINT) AS total_abs_err_cents,
      |  CAST(sum(err) // count(*) AS BIGINT) AS mae_cents
      |FROM g GROUP BY 1""".stripMargin
}
