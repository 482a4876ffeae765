package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Relational breadth, batch 2 (SURVEY.md §7 step 4): rollup/cube,
  * set operations, ranking + analytic windows, semi/anti joins,
  * string/date/JSON scalars, and a multi-join star aggregation.
  * All Spark built-ins — the engine work is the query surface, the
  * oracle parity, and the plan-shape notes.
  *
  * Parity invariants (see SparkEntry.ordered): no NULL output cells
  * (rollup/cube keys coalesced, lag defaults filled), doubles only
  * via exact (min/max) or round-after-sum aggregates, BIGINT/INT
  * alignment via casts on the DuckDB side.
  */
object Relational2 {

  /** r10: ROLLUP over the region→nation hierarchy. Dims broadcast;
    * rollup adds one extra partial-agg pass, shuffle stays tiny. */
  def r10Rollup(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        min(col("c_acctbal")).as("min_bal"), max(col("c_acctbal")).as("max_bal"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_cust"), col("min_bal"), col("max_bal"))
  }

  val r10Sql: String =
    """SELECT coalesce(r_name, 'ALL') AS region,
      |  coalesce(n_name, 'ALL') AS nation,
      |  count(*) AS n_cust, min(c_acctbal) AS min_bal,
      |  max(c_acctbal) AS max_bal
      |FROM customer c
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)""".stripMargin

  /** r11: CUBE over two independent order dimensions. */
  def r11Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("min_price"), col("max_price"))

  val r11Sql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS n, min(o_totalprice) AS min_price,
      |  max(o_totalprice) AS max_price
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin

  /** r12: set operations — INTERSECT / EXCEPT / UNION branches of
    * two customer populations, tagged and unioned. Set ops shuffle
    * on the full row — fine for key-only projections. */
  def r12SetOps(spark: SparkSession, dir: String): DataFrame = {
    val seg = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val big = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey").as("custkey")).distinct()
    seg.intersect(big).select(lit("both").as("op"), col("custkey"))
      .unionAll(seg.except(big).select(lit("seg_only").as("op"), col("custkey")))
      .unionAll(big.except(seg).select(lit("big_only").as("op"), col("custkey")))
  }

  val r12Sql: String =
    """WITH seg AS (SELECT c_custkey AS custkey FROM customer
      |    WHERE c_mktsegment = 'BUILDING'),
      |big AS (SELECT DISTINCT o_custkey AS custkey FROM orders
      |    WHERE o_totalprice > 400000.0)
      |SELECT 'both' AS op, custkey FROM (SELECT custkey FROM seg INTERSECT SELECT custkey FROM big)
      |UNION ALL
      |SELECT 'seg_only' AS op, custkey FROM (SELECT custkey FROM seg EXCEPT SELECT custkey FROM big)
      |UNION ALL
      |SELECT 'big_only' AS op, custkey FROM (SELECT custkey FROM big EXCEPT SELECT custkey FROM seg)""".stripMargin

  /** r13: ranking windows — top-3 customers by balance per nation
    * with row_number (tie-broken) plus rank/dense_rank (tie-aware). */
  def r13RankWindow(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val base = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(col("n_name").as("nation"), col("c_custkey"), col("c_acctbal"))
    val wRn = Window.partitionBy(col("nation"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val wRk = Window.partitionBy(col("nation")).orderBy(col("c_acctbal").desc)
    base.select(col("nation"), col("c_custkey"), col("c_acctbal"),
        row_number().over(wRn).as("rn"),
        rank().over(wRk).as("rk"),
        dense_rank().over(wRk).as("drk"))
      .filter(col("rn") <= 3)
  }

  val r13Sql: String =
    """WITH base AS (SELECT n_name AS nation, c_custkey, c_acctbal
      |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
      |w AS (SELECT nation, c_custkey, c_acctbal,
      |  CAST(row_number() OVER (PARTITION BY nation
      |    ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn,
      |  CAST(rank() OVER (PARTITION BY nation
      |    ORDER BY c_acctbal DESC) AS INT) AS rk,
      |  CAST(dense_rank() OVER (PARTITION BY nation
      |    ORDER BY c_acctbal DESC) AS INT) AS drk
      |  FROM base)
      |SELECT nation, c_custkey, c_acctbal, rn, rk, drk
      |FROM w WHERE rn <= 3""".stripMargin

  /** r14: semi/anti joins — customers with vs without orders, per
    * segment. Spark plans left-semi/left-anti hash joins; the probe
    * never widens rows. */
  def r14SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey"))
    val withO = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .select(lit("with_orders").as("mode"), col("c_mktsegment"), col("n"))
    val noO = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .select(lit("no_orders").as("mode"), col("c_mktsegment"), col("n"))
    withO.unionAll(noO)
  }

  val r14Sql: String =
    """SELECT 'with_orders' AS mode, c_mktsegment, count(*) AS n
      |FROM customer c WHERE EXISTS
      |  (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY 2
      |UNION ALL
      |SELECT 'no_orders' AS mode, c_mktsegment, count(*) AS n
      |FROM customer c WHERE NOT EXISTS
      |  (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY 2""".stripMargin

  /** r15: string + date scalar functions as a pushdown-friendly
    * projection (the modulo filter reaches the scan). */
  def r15StringDate(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"),
        upper(col("o_orderpriority")).as("pri_upper"),
        substring(col("o_orderpriority"), 1, 1).as("pri_code"),
        length(col("o_orderpriority")).as("pri_len"),
        concat(col("o_orderstatus"), lit("-"), col("o_orderpriority"))
          .as("status_pri"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_add(to_date(col("o_orderdate")), 30).as("due_date"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01"))
          .as("days_since"))

  val r15Sql: String =
    """SELECT o_orderkey,
      |  upper(o_orderpriority) AS pri_upper,
      |  substr(o_orderpriority, 1, 1) AS pri_code,
      |  CAST(length(o_orderpriority) AS INT) AS pri_len,
      |  o_orderstatus || '-' || o_orderpriority AS status_pri,
      |  CAST(year(o_orderdate) AS INT) AS yr,
      |  CAST(month(o_orderdate) AS INT) AS mo,
      |  CAST(day(o_orderdate) AS INT) AS dom,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
      |  CAST(date_diff('day', DATE '1995-01-01',
      |    CAST(o_orderdate AS DATE)) AS INT) AS days_since
      |FROM orders WHERE o_orderkey % 97 = 0""".stripMargin

  /** r16: JSON scalar extraction over the events props column. */
  def r16Json(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("event_id"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), min(col("event_id")).as("first_event"))

  val r16Sql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
      |  count(*) AS n, min(event_id) AS first_event
      |FROM events GROUP BY 1""".stripMargin

  /** r17: the multi-join star aggregation (TPC-H Q5 shape): fact
    * joined through orders to the customer→nation→region hierarchy;
    * dims broadcast, facts join on keys, 25-group aggregate. */
  def r17StarJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
  }

  val r17Sql: String =
    """SELECT r_name AS region, n_name AS nation, count(*) AS n_items,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY 1, 2""".stripMargin

  /** r19: the SQL surface — ONE ANSI SQL text executed verbatim by
    * both engines (spark.sql over temp views ↔ DuckDB over the same
    * table names). CTE + join + aggregation; Catalyst plans it
    * identically to the DataFrame variants. */
  val r19Sql: String =
    """WITH big AS (
      |  SELECT o_custkey, count(*) AS n_big
      |  FROM orders WHERE o_totalprice > 300000.0 GROUP BY 1
      |)
      |SELECT c.c_mktsegment, count(*) AS n_cust, max(b.n_big) AS max_big
      |FROM customer c JOIN big b ON c.c_custkey = b.o_custkey
      |GROUP BY 1""".stripMargin

  def r19SqlSurface(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    spark.sql(r19Sql)
  }

  /** r20: session windows — gap-based event sessions per user
    * (Spark's session_window; restated in SQL as the classic
    * gaps-and-islands pattern). Ties in ts are safe: zero gaps can
    * never split a session, so island ids are order-independent. */
  def r20SessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("user_id") < 30)
      // group by the session_window STRUCT — extracting .start here
      // would skip the session-merge aggregation entirely
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").cast("timestamp_ntz").as("session_start"),
        col("n_events"))

  val r20Sql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      |  WHERE user_id < 30),
      |o AS (SELECT user_id, ts,
      |    -- session window is [t, t+gap): an event exactly `gap`
      |    -- after its predecessor starts a NEW session (>=, not >)
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |      THEN 1 ELSE 0 END AS brk
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (SELECT user_id, ts, sum(brk) OVER
      |    (PARTITION BY user_id ORDER BY ts
      |     ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM o)
      |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
      |FROM s GROUP BY user_id, sid""".stripMargin

  /** r18: analytic windows over the event stream — lag, rolling
    * 3-row count/min, running sequence per user. */
  def r18Analytic(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("event_id"), col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val w3 = w.rowsBetween(-2, 0)
    e.select(col("user_id"), col("event_id"), col("value"),
      coalesce(lag(col("event_id"), 1).over(w), lit(-1L)).as("prev_event"),
      count(lit(1)).over(w3).as("cnt3"),
      min(col("value")).over(w3).as("min3"),
      row_number().over(w).as("seq"))
  }

  val r18Sql: String =
    """WITH e AS (SELECT user_id, event_id, value FROM events
      |  WHERE user_id < 10)
      |SELECT user_id, event_id, value,
      |  coalesce(lag(event_id, 1) OVER w, -1) AS prev_event,
      |  count(*) OVER w3 AS cnt3,
      |  min(value) OVER w3 AS min3,
      |  CAST(row_number() OVER w AS INT) AS seq
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY event_id),
      |  w3 AS (PARTITION BY user_id ORDER BY event_id
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin

  /** r21: AS-OF join — each event matched to the user's most recent
    * order on-or-before the event date (operators.AsOfJoin: one
    * key shuffle + in-partition sort, vs DuckDB's native ASOF JOIN
    * as the oracle). Right side pre-aggregated to one row per
    * (custkey, date) so the match is deterministic on both engines;
    * summary output keeps the hash gate integer-exact. */
  def r21Asof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), to_date(col("ts")).as("d"))
    val ord = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("user_id"),
        to_date(col("o_orderdate")).as("od"))
      .agg(max(col("o_orderkey")).as("okey"))
    graft.operators.AsOfJoin.asOf(ev, ord, "user_id", "d", "od")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_matched"),
        sum(datediff(col("d"), col("asof.od"))).as("total_gap_days"),
        max(col("asof.okey")).as("max_okey"))
  }

  val r21Sql: String =
    """WITH ev AS (SELECT event_type, user_id, CAST(ts AS DATE) AS d
      |  FROM events),
      |ord AS (SELECT o_custkey AS user_id, CAST(o_orderdate AS DATE) AS od,
      |    max(o_orderkey) AS okey
      |  FROM orders GROUP BY 1, 2),
      |j AS (SELECT ev.event_type, ev.d, ord.od, ord.okey
      |  FROM ev ASOF JOIN ord
      |    ON ev.user_id = ord.user_id AND ev.d >= ord.od)
      |SELECT event_type, count(*) AS n_matched,
      |  CAST(sum(datediff('day', od, d)) AS BIGINT) AS total_gap_days,
      |  max(okey) AS max_okey
      |FROM j GROUP BY 1""".stripMargin

  /** r22: RANGE join — orders bucketized into overlapping price
    * bands derived from the nation dim (operators.RangeJoin: equi-
    * join on a bucket grid + residual range predicate — the big-big
    * plan; DuckDB verifies with the plain inequality join). Cents
    * are summed as integers (floor(price*100): identical doubles →
    * identical floor on both engines, then exact integer addition —
    * no order-dependent float accumulation in the hash gate). */
  def r22Range(spark: SparkSession, dir: String): DataFrame = {
    val bands = Tables.nation(spark, dir).select(
      col("n_name").as("band"),
      (col("n_nationkey").cast("long") * 20000L).as("lo"),
      (col("n_nationkey").cast("long") * 20000L + 40000L).as("hi"))
    val ords = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
    graft.operators.RangeJoin
      .bucketed(ords, bands, "o_totalprice", "lo", "hi", width = 20000L)
      .groupBy(col("range.band").as("band"))
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
  }

  val r22Sql: String =
    """WITH bands AS (SELECT n_name AS band, n_nationkey * 20000 AS lo,
      |    n_nationkey * 20000 + 40000 AS hi
      |  FROM nation),
      |j AS (SELECT b.band, o.o_totalprice
      |  FROM orders o JOIN bands b
      |    ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi)
      |SELECT band, count(*) AS n_orders,
      |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS cents
      |FROM j GROUP BY 1""".stripMargin

  /** r23: OUTER joins — LEFT and FULL outer over two partially
    * overlapping populations (every 7th customer vs customers with a
    * big order), tagged and unioned so one query exercises all three
    * row classes: matched, left-only (no big orders), right-only
    * (big-order customer outside the key filter). Outer joins emit
    * NULLs by construction, and the parity invariant forbids NULL
    * output cells, so every nullable side is sentinel-coalesced
    * (the r10/r18 pattern: 'NONE' / 0 / -1). Plan shape: both joins
    * are key-shuffled sort-merge joins (full outer cannot broadcast;
    * left outer of two already-aggregated sides has no small side
    * here) — one exchange per side, reused by both branches when AQE
    * reuses the subplan. */
  def r23OuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"), col("c_mktsegment"))
    val big = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000.0)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_big"), max(col("o_orderkey")).as("max_okey"))
    def shape(mode: String, j: DataFrame): DataFrame =
      j.select(lit(mode).as("mode"),
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        coalesce(col("c_mktsegment"), lit("NONE")).as("segment"),
        coalesce(col("n_big"), lit(0L)).as("n_big"),
        coalesce(col("max_okey"), lit(-1L)).as("max_okey"))
    shape("left", cust.join(big,
      cust("c_custkey") === big("o_custkey"), "left_outer"))
      .unionAll(shape("full", cust.join(big,
        cust("c_custkey") === big("o_custkey"), "full_outer")))
  }

  /** r24: PIVOT — the order-status × priority matrix as columns
    * (count + revenue cents per cell), the reshape every reporting
    * layer runs. Spark's relational pivot with an EXPLICIT value
    * list: no distinct-values pre-pass, one partial-agg shuffle on
    * the priority key alone (the pivoted statuses ride as map-side
    * conditional aggregates), so the plan is a plain hash aggregate
    * at any scale. Cents via floor(×100+0.5) so the money sum is
    * integer-exact and order-independent; empty cells coalesce to 0
    * (the no-NULL gate invariant). */
  def r24Pivot(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderpriority"),
      col("o_orderstatus"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val piv = o.groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
    def cell(s: String) = Seq(
      coalesce(col(s"${s}_n"), lit(0L)).as(s"${s.toLowerCase}_n"),
      coalesce(col(s"${s}_cents"), lit(0L)).as(s"${s.toLowerCase}_cents"))
    piv.select(col("o_orderpriority") +:
      (cell("F") ++ cell("O") ++ cell("P")): _*)
  }

  val r24Sql: String = {
    def cell(s: String) =
      s"""  coalesce(count(*) FILTER (WHERE o_orderstatus = '$s'), 0)
         |    AS ${s.toLowerCase}_n,
         |  CAST(coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
         |    FILTER (WHERE o_orderstatus = '$s'), 0) AS BIGINT)
         |    AS ${s.toLowerCase}_cents""".stripMargin
    s"""SELECT o_orderpriority,
       |${Seq("F", "O", "P").map(cell).mkString(",\n")}
       |FROM orders GROUP BY 1""".stripMargin
  }

  /** r25: RANGE-frame analytic window — the trailing-1-hour running
    * aggregate every ops dashboard computes (distinct from r18's
    * ROWS frames: the frame is bounded by VALUE distance, so peers
    * and gaps behave per the SQL standard on both engines). Ordering
    * key is exact epoch microseconds (BIGINT) and the summed measure
    * is integer cents, so the window sum is order-independent and
    * hash-stable. One shuffle on event_type + an in-partition sort —
    * at scale the partition count is the event-type cardinality, so
    * a skewed type would range-partition by (type, time-bucket) with
    * boundary overlap; documented, not needed at test SF. */
  def r25RangeWindow(spark: SparkSession, dir: String): DataFrame =
    trailingWindowStats(Tables.events(spark, dir))

  /** DataFrame-taking core of r25 (eventsIn: event_id, event_type,
    * ts, value) — the unit spec asserts on THIS, so a frame-bound or
    * rounding regression can't hide behind a test-local copy. */
  def trailingWindowStats(eventsIn: DataFrame): DataFrame = {
    val ev = eventsIn.select(
      col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"),
      floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts_us"))
      .rangeBetween(-3600L * 1000000L, 0L)
    ev.select(col("event_id"), col("event_type"), col("ts_us"),
      count(lit(1)).over(w).as("n_1h"),
      sum(col("cents")).over(w).as("cents_1h"))
  }

  val r25Sql: String =
    """WITH e AS (SELECT event_id, event_type,
      |    CAST(epoch_us(ts) AS BIGINT) AS ts_us,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events)
      |SELECT event_id, event_type, ts_us,
      |  count(*) OVER w AS n_1h,
      |  CAST(sum(cents) OVER w AS BIGINT) AS cents_1h
      |FROM e
      |WINDOW w AS (PARTITION BY event_type ORDER BY ts_us
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin

  /** r26: the DISTRIBUTION window family r13/r18 left out — ntile
    * bucketing, percent_rank/cume_dist (exact rank ratios: same
    * integer operands divide to bit-identical doubles on both
    * engines, so no rounding is needed), lead and first_value. The
    * window's ORDER BY is a total order (price, then key) so every
    * function is deterministic; one partitioned sort, no other
    * exchange. */
  def r26Distribution(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_custkey") < 50)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
      ntile(4).over(w).as("quartile"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume"),
      coalesce(lead(col("o_orderkey"), 1).over(w), lit(-1L)).as("next_okey"),
      first_value(col("o_orderkey")).over(w).as("cheapest_okey"))
  }

  val r26Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume,
      |  coalesce(lead(o_orderkey, 1) OVER w, -1) AS next_okey,
      |  first_value(o_orderkey) OVER w AS cheapest_okey
      |FROM orders WHERE o_custkey < 50
      |WINDOW w AS (PARTITION BY o_custkey
      |  ORDER BY o_totalprice, o_orderkey)""".stripMargin

  /** r27: the correlated-subquery surface — EXISTS, NOT EXISTS and
    * two correlated scalar subqueries in one statement, run through
    * `spark.sql` so Catalyst's decorrelation does the planning
    * (RewritePredicateSubquery turns the EXISTS pair into LEFT SEMI
    * and LEFT ANTI joins; RewriteCorrelatedScalarSubquery turns each
    * scalar into an aggregate + LEFT OUTER join — no per-row
    * re-execution anywhere, which is what makes the declared form
    * safe at 100 TB). ONE SQL string serves engine and oracle: the
    * statement is ANSI-portable, and the selected scalars (count,
    * max) are order-independent, so no float-summation parity risk.
    * The same semantics hand-built from joins is r14/r19 territory;
    * what r27 adds is the DECLARED subquery form a SQL user writes. */
  val r27Sql: String =
    """SELECT c.c_custkey, c.c_mktsegment,
      |  (SELECT count(*) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
      |  coalesce((SELECT max(o.o_totalprice) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey), -1.0) AS max_price
      |FROM customer c
      |WHERE c.c_custkey < 500
      |  AND EXISTS (SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
      |      AND o.o_totalprice > 400000.0)""".stripMargin

  def r27Subqueries(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    spark.sql(r27Sql)
  }

  /** r28: explicit GROUPING SETS with GROUPING() markers — the
    * general form r10's ROLLUP and r11's CUBE are special cases of:
    * an asymmetric set list ((a,b),(a),(b),()) plus the grouping()
    * bit that disambiguates a data NULL from a superaggregate row
    * (the coalesce-to-'ALL' trick r10/r11 use breaks the moment a
    * grouping column is nullable; grouping() is the correct contract
    * and this query ships it). ONE ANSI SQL string serves engine and
    * oracle (the r27 convention). Spark plans a single Expand +
    * hash aggregate — one shuffle for all four set combinations, map-
    * side partials over ≤ 4×|groups| rows regardless of input size;
    * sum(l_quantity) is integer-valued double, so order-independent
    * and hash-stable. */
  val r28Sql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
      |  coalesce(l_linestatus, 'ALL') AS lstatus,
      |  CAST(grouping(l_returnflag) AS INT) AS g_rflag,
      |  CAST(grouping(l_linestatus) AS INT) AS g_lstatus,
      |  count(*) AS n, sum(l_quantity) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |  (l_returnflag), (l_linestatus), ())""".stripMargin

  def r28GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(r28Sql)
  }

  /** r29: the LATERAL correlated derived-table surface — "top 2
    * orders per customer" in the declared SQL form (a correlated
    * subquery in FROM with its own ORDER BY + LIMIT + window),
    * completing the subquery family r27 opened. Catalyst
    * DECORRELATES the lateral into a join against a
    * WindowGroupLimit-bounded window — exactly the per-group top-k
    * physical shape the engine's s-queries build by hand, so the
    * declared form and the hand-built form meet at the same plan; no
    * per-customer re-execution anywhere. ONE ANSI string serves
    * engine and oracle (the r27/r28 convention). */
  val r29Sql: String =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice, t.rk
      |FROM customer c,
      |  LATERAL (SELECT o.o_orderkey, o.o_totalprice,
      |      CAST(row_number() OVER (ORDER BY o.o_totalprice DESC,
      |        o.o_orderkey) AS INT) AS rk
      |    FROM orders o WHERE o.o_custkey = c.c_custkey
      |    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2) t
      |WHERE c.c_custkey < 200""".stripMargin

  def r29Lateral(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    spark.sql(r29Sql)
  }

  val r23Sql: String =
    """WITH cust AS (SELECT c_custkey, c_mktsegment FROM customer
      |    WHERE c_custkey % 7 = 0),
      |big AS (SELECT o_custkey, count(*) AS n_big,
      |    max(o_orderkey) AS max_okey
      |  FROM orders WHERE o_totalprice > 400000.0 GROUP BY 1)
      |SELECT 'left' AS mode, c.c_custkey AS custkey,
      |  c.c_mktsegment AS segment,
      |  coalesce(b.n_big, 0) AS n_big,
      |  coalesce(b.max_okey, -1) AS max_okey
      |FROM cust c LEFT JOIN big b ON c.c_custkey = b.o_custkey
      |UNION ALL
      |SELECT 'full' AS mode, coalesce(c.c_custkey, b.o_custkey) AS custkey,
      |  coalesce(c.c_mktsegment, 'NONE') AS segment,
      |  coalesce(b.n_big, 0) AS n_big,
      |  coalesce(b.max_okey, -1) AS max_okey
      |FROM cust c FULL JOIN big b ON c.c_custkey = b.o_custkey""".stripMargin
}
