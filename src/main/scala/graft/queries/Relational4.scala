package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Decision-support surface, round 9: the six classic TPC-H shapes
  * the r32–r45 family had not yet covered and this corpus' columns
  * can express — EXISTS-gated priority counts (Q4), outer-join
  * count distributions (Q13), conditional-share reports (Q14),
  * argmax-by-aggregate (Q15), disjunctive multi-predicate scans
  * (Q19), and two-level share-of-market rollups (Q8). Together with
  * the earlier rounds this closes every Q-shape expressible without
  * `partsupp`/`l_commitdate`/`l_shipmode` (Q2/Q9/Q11/Q16/Q20 need
  * partsupp; Q4's true commit-vs-receipt lateness, Q12's shipmode
  * and Q21's multi-supplier wait chains need the lineitem columns
  * this corpus doesn't ship — each is substituted by the nearest
  * expressible predicate and documented at the query).
  *
  * Oracle parity rules are Relational2's: timestamps leave the plan
  * as epoch micros (BIGINT), money stays in exact integer cents (or
  * cent·percent) until one division at the edge, so every hash is
  * drift-free across engines.
  */
object Relational4 {

  // ---- r47: late-shipment priority report (TPC-H Q4 shape) ---------

  /** r47: the Q4 SHAPE — how many orders per priority had at least
    * one badly late line item. Q4's lateness is commit-vs-receipt;
    * this corpus carries neither column, so the expressible analog
    * is ship-vs-order: a line shipped more than 60 days after the
    * order was placed. The EXISTS is a LEFT SEMI join (first match
    * short-circuits per order — no count, no dedup), with the
    * order-window predicate pushed to the orders scan.
    *
    * 100 TB shape: one keyed shuffle (orderkey) for the semi join —
    * the lateness predicate references both sides so it rides the
    * join condition, evaluated during the probe, and the date window
    * prunes the orders side at the scan; the closing agg is 5
    * partial-agg rows. */
  def lateShipments(ordersIn: DataFrame, liIn: DataFrame): DataFrame = {
    val o = ordersIn
      .filter(col("o_orderdate") >= lit("1997-01-01") &&
        col("o_orderdate") < lit("1997-07-01"))
    val li = liIn
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  def r47LateShipments(spark: SparkSession, dir: String): DataFrame =
    lateShipments(Tables.orders(spark, dir), Tables.lineitem(spark, dir))

  val r47Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |    WHERE l.l_orderkey = o.o_orderkey
      |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY 1""".stripMargin

  // ---- r48: customer order-count distribution (TPC-H Q13 shape) ----

  /** r48: the Q13 SHAPE — the histogram of orders-per-customer,
    * INCLUDING the zero bucket: a LEFT OUTER join from customer to a
    * filtered orders set (Q13 excludes special-request comments;
    * this corpus' expressible analog excludes low-priority orders),
    * counted per customer with NULL-matches counting zero, then
    * re-aggregated into the distribution.
    *
    * 100 TB shape: two keyed shuffles by construction (custkey for
    * the outer count, c_count for the distribution — the second is
    * over one row per customer, and the distribution agg partial-
    * aggregates to at most |distinct counts| rows per task). The
    * priority filter pushes to the orders scan. */
  def customerDistribution(custIn: DataFrame, ordersIn: DataFrame): DataFrame = {
    val o = ordersIn
      .filter(col("o_orderpriority") =!= "5-LOW")
      .select(col("o_custkey"), col("o_orderkey"))
    val perCust = custIn
      .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  def r48CustomerDistribution(spark: SparkSession, dir: String): DataFrame =
    customerDistribution(Tables.customer(spark, dir),
      Tables.orders(spark, dir))

  val r48Sql: String =
    """WITH pc AS (SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY 1)
      |SELECT c_count, count(*) AS custdist
      |FROM pc GROUP BY 1
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---- r49: promo revenue share (TPC-H Q14 shape) ------------------

  /** r49: the Q14 SHAPE — what fraction of one month's revenue came
    * from promotional parts. The conditional-vs-total ratio is the
    * shape; this corpus ships a literal 'PROMO' p_type so no
    * substitution is needed. Revenue stays an EXACT long in
    * cent·percent units (base_cents·(100−disc_pct), the r43
    * discipline) through both sums; the one float division happens
    * at the edge and rounds once, so the share cannot drift between
    * engines.
    *
    * 100 TB shape: the month predicate prunes the lineitem scan; the
    * part join broadcasts (dimension ≪ fact); the global agg folds
    * to ONE row via partial aggregation — no keyed shuffle at all. */
  def promoShare(liIn: DataFrame, partIn: DataFrame): DataFrame = {
    val li = liIn
      .filter(col("l_shipdate") >= lit("1997-09-01") &&
        col("l_shipdate") < lit("1997-10-01"))
      .select(col("l_partkey"),
        (floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
          (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long")))
          .as("cp"))
    val p = partIn
      .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        coalesce(sum(when(col("is_promo"), col("cp")).otherwise(0L)), lit(0L))
          .as("promo_cp_sum"),
        coalesce(sum(col("cp")), lit(0L)).as("total_cp_sum"))
      .select(col("promo_cp_sum"), col("total_cp_sum"),
        when(col("total_cp_sum") > 0,
          round(col("promo_cp_sum").cast("double") * 100.0 /
            col("total_cp_sum").cast("double"), 6))
          .otherwise(lit(0.0)).as("promo_share_pct"))
  }

  def r49PromoShare(spark: SparkSession, dir: String): DataFrame =
    promoShare(Tables.lineitem(spark, dir), Tables.part(spark, dir))

  val r49Sql: String =
    """WITH li AS (SELECT l_partkey,
      |    CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
      |      * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS cp
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      |    AND l_shipdate < TIMESTAMP '1997-10-01')
      |SELECT
      |  coalesce(CAST(sum(CASE WHEN p_type = 'PROMO' THEN cp ELSE 0 END)
      |    AS BIGINT), 0) AS promo_cp_sum,
      |  coalesce(CAST(sum(cp) AS BIGINT), 0) AS total_cp_sum,
      |  CASE WHEN coalesce(sum(cp), 0) > 0 THEN
      |    round(CAST(sum(CASE WHEN p_type = 'PROMO' THEN cp ELSE 0 END)
      |      AS DOUBLE) * 100.0 / CAST(sum(cp) AS DOUBLE), 6)
      |  ELSE 0.0 END AS promo_share_pct
      |FROM li JOIN part ON l_partkey = p_partkey""".stripMargin

  // ---- r50: top supplier by quarter revenue (TPC-H Q15 shape) ------

  /** r50: the Q15 SHAPE — the supplier(s) whose quarterly revenue
    * equals the maximum: an aggregate (revenue per supplier), a
    * scalar of that aggregate (its max), and an equality join back —
    * the argmax-by-aggregate pattern Q15 spells as a view + scalar
    * subquery. Revenue is compared for EQUALITY, so it must be exact:
    * the cent·percent long discipline makes max-equality bit-precise
    * on both engines (a float sum would make the argmax
    * order-dependent). Dollars appear once, rounded at the edge.
    *
    * 100 TB shape: one keyed shuffle (suppkey) for the per-supplier
    * agg; the max folds to ONE broadcast row; the supplier name join
    * broadcasts the (usually single-row) winner set against the
    * dimension. */
  def topSupplier(liIn: DataFrame, suppIn: DataFrame): DataFrame = {
    val rev = liIn
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1997-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
        (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long")))
        .as("total_cp"))
    val top = rev.agg(max(col("total_cp")).as("max_cp"))
    rev.crossJoin(broadcast(top))
      .filter(col("total_cp") === col("max_cp"))
      .join(suppIn, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_cp"),
        round(col("total_cp").cast("double") / 10000.0, 2)
          .as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  def r50TopSupplier(spark: SparkSession, dir: String): DataFrame =
    topSupplier(Tables.lineitem(spark, dir), Tables.supplier(spark, dir))

  val r50Sql: String =
    """WITH rev AS (SELECT l_suppkey,
      |    CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
      |      * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)))
      |      AS BIGINT) AS total_cp
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, total_cp,
      |  round(CAST(total_cp AS DOUBLE) / 10000.0, 2) AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_cp = (SELECT max(total_cp) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // ---- r51: disjunctive-predicate revenue (TPC-H Q19 shape) --------

  /** r51: the Q19 SHAPE — revenue under three OR'd brand/size/
    * quantity envelopes (Q19's container and shipmode conjuncts
    * aren't in this corpus; brand+size+quantity are, and they carry
    * the shape: a disjunction whose branches each constrain BOTH
    * sides of the join). The per-side implications are declared as
    * scan filters (size ≤ 15, quantity < 31, the brand IN-list) so
    * both scans prune before the join; the exact three-way
    * disjunction is evaluated once post-join.
    *
    * 100 TB shape: the derived conjuncts are what makes this scale —
    * without them the fact scan is unfiltered; with them
    * PushedFilters carries the quantity/size bounds and the join
    * probes a fraction of the corpus. The part side broadcasts. */
  def disjunctiveRevenue(liIn: DataFrame, partIn: DataFrame): DataFrame = {
    val li = liIn
      .filter(col("l_quantity") >= 1.0 && col("l_quantity") < 31.0)
      .select(col("l_partkey"), col("l_quantity"),
        (floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
          (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long")))
          .as("cp"))
    val p = partIn
      .filter(col("p_size") >= 1 && col("p_size") <= 15 &&
        col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val branch1 = col("p_brand") === "Brand#1" &&
      col("p_size") <= 5 && col("l_quantity") < 11.0
    val branch2 = col("p_brand") === "Brand#2" &&
      col("p_size") <= 10 && col("l_quantity") >= 10.0 &&
      col("l_quantity") < 21.0
    val branch3 = col("p_brand") === "Brand#3" &&
      col("p_size") <= 15 && col("l_quantity") >= 20.0 &&
      col("l_quantity") < 31.0
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(branch1 || branch2 || branch3)
      .agg(count(lit(1)).as("n_items"),
        coalesce(sum(col("cp")), lit(0L)).as("revenue_cp_sum"))
      .select(col("n_items"), col("revenue_cp_sum"),
        round(col("revenue_cp_sum").cast("double") / 10000.0, 2)
          .as("revenue"))
  }

  def r51DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame =
    disjunctiveRevenue(Tables.lineitem(spark, dir), Tables.part(spark, dir))

  val r51Sql: String =
    """WITH li AS (SELECT l_partkey, l_quantity,
      |    CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
      |      * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS cp
      |  FROM lineitem WHERE l_quantity >= 1 AND l_quantity < 31)
      |SELECT count(*) AS n_items,
      |  coalesce(CAST(sum(cp) AS BIGINT), 0) AS revenue_cp_sum,
      |  round(coalesce(CAST(sum(cp) AS DOUBLE), 0) / 10000.0, 2)
      |    AS revenue
      |FROM li JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
      |    AND l_quantity < 11)
      |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
      |    AND l_quantity >= 10 AND l_quantity < 21)
      |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
      |    AND l_quantity >= 20 AND l_quantity < 31)""".stripMargin

  // ---- r52: national market share (TPC-H Q8 shape) -----------------

  /** r52: the Q8 SHAPE — one nation's share of a region's market for
    * one part type, per year: the seven-table join tree (fact +
    * orders + both nation roles + region + part + supplier +
    * customer) where the SAME revenue stream is summed twice — once
    * in total, once gated on the supplier's nation — and divided.
    * Both sums stay exact cent·percent longs; the share divides once
    * per year row. The customer's nation restricts WHICH orders count
    * (region = ASIA); the supplier's nation is the share numerator —
    * the two roles join the nation table independently, exactly
    * Q8's n1/n2 split.
    *
    * 100 TB shape: part/supplier/nation/region all broadcast
    * (dimensions); orders⋈lineitem is the one big keyed shuffle;
    * the date window prunes the orders scan and the p_type filter
    * prunes the part build side to a fraction before broadcast. The
    * closing agg is ≤2 year rows. */
  def marketShare(liIn: DataFrame, ordersIn: DataFrame, partIn: DataFrame,
      custIn: DataFrame, suppIn: DataFrame, nationIn: DataFrame,
      regionIn: DataFrame): DataFrame = {
    val li = liIn
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
          (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long")))
          .as("cp"))
    val o = ordersIn
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1998-01-01"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("o_year"))
    val p = partIn
      .filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val asiaCust = custIn
      .join(broadcast(nationIn),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(regionIn
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val supp = suppIn
      .join(broadcast(nationIn
        .select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(asiaCust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(
        coalesce(sum(when(col("supp_nation") === "NATION_5", col("cp"))
          .otherwise(0L)), lit(0L)).as("nation_cp_sum"),
        coalesce(sum(col("cp")), lit(0L)).as("total_cp_sum"))
      .select(col("o_year"), col("nation_cp_sum"), col("total_cp_sum"),
        when(col("total_cp_sum") > 0,
          round(col("nation_cp_sum").cast("double") /
            col("total_cp_sum").cast("double"), 6))
          .otherwise(lit(0.0)).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  def r52MarketShare(spark: SparkSession, dir: String): DataFrame =
    marketShare(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      Tables.part(spark, dir), Tables.customer(spark, dir),
      Tables.supplier(spark, dir), Tables.nation(spark, dir),
      Tables.region(spark, dir))

  val r52Sql: String =
    """WITH rev AS (SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |    CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
      |      * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS cp,
      |    n2.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1998-01-01')
      |SELECT o_year,
      |  coalesce(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN cp
      |    ELSE 0 END) AS BIGINT), 0) AS nation_cp_sum,
      |  coalesce(CAST(sum(cp) AS BIGINT), 0) AS total_cp_sum,
      |  CASE WHEN coalesce(sum(cp), 0) > 0 THEN
      |    round(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN cp
      |      ELSE 0 END) AS DOUBLE) / CAST(sum(cp) AS DOUBLE), 6)
      |  ELSE 0.0 END AS mkt_share
      |FROM rev GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- r53: winsorized robust statistics ---------------------------

  /** r53: WINSORIZED robust aggregation — per event type, clamp the
    * value distribution to its own [p5, p95] and report the robust
    * mean/variance next to the clamp counts: the outlier-resistant
    * metrics every monitoring pipeline wants when a single bad
    * reading would drag a plain mean. The percentiles are DISCRETE
    * (the sorted multiset's element at index ⌊p·(n−1)/100⌋) — pure
    * INTEGER index arithmetic, deliberately not the interpolating
    * percentile: an interpolated threshold is a derived float and
    * its last ulp could flip clamp decisions between engines,
    * while a selected data value is exact. Values quantize to cents
    * at the scan, so every sum (including the squared sum feeding
    * the variance) is an exact long; the two float divisions happen
    * once per group at the edge.
    *
    * 100 TB shape: ONE event_type-keyed exchange shared by the rank
    * window and the count; the per-type bound rows fold to
    * |types|·2 values that join back BROADCAST onto the same sorted
    * partitions; the closing agg is |types| rows. The n²·s2 terms
    * outgrow int64 around 10⁹ rows·type at cent precision —
    * decimal(38,0) is the documented escalation (the r43/x31 note). */
  def winsorized(eventsIn: DataFrame): DataFrame = {
    val ev = eventsIn.select(col("event_type"),
      floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val rk = ev
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("cents")))
        .cast("long") - 1L)
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
    val bounds = rk.groupBy(col("event_type"))
      .agg(
        min(when(col("rn") === expr("(n - 1) * 5 div 100"), col("cents")))
          .as("lo_cents"),
        min(when(col("rn") === expr("(n - 1) * 95 div 100"), col("cents")))
          .as("hi_cents"))
    ev.join(broadcast(bounds), Seq("event_type"))
      .withColumn("c", greatest(col("lo_cents"),
        least(col("hi_cents"), col("cents"))))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("lo_cents")).as("lo_cents"),
        min(col("hi_cents")).as("hi_cents"),
        sum(when(col("cents") < col("lo_cents"), 1L).otherwise(0L))
          .as("n_clamped_low"),
        sum(when(col("cents") > col("hi_cents"), 1L).otherwise(0L))
          .as("n_clamped_high"),
        sum(col("c")).as("s1"),
        sum(col("c") * col("c")).as("s2"))
      .select(col("event_type"), col("n"), col("lo_cents"), col("hi_cents"),
        col("n_clamped_low"), col("n_clamped_high"),
        round(col("s1").cast("double") / col("n").cast("double") / 100.0, 6)
          .as("wmean"),
        round((col("n") * col("s2") - col("s1") * col("s1")).cast("double") /
          (col("n") * col("n")).cast("double") / 10000.0, 6).as("wvar"))
  }

  def r53Winsorized(spark: SparkSession, dir: String): DataFrame =
    winsorized(Tables.events(spark, dir))

  // ---- r54: incremental SCD-2 apply (relational MERGE lifecycle) ---

  /** r54: INCREMENTAL SCD-2 MAINTENANCE — the relational member of
    * the build-once/refresh-incrementally family (vector s17,
    * lexical x41, profile x39): the r38 validity-interval table is
    * PERSISTED once for the standing corpus, and each change batch
    * applies with MERGE semantics — untouched users' rows are served
    * from the saved table byte-for-byte (never re-windowed), while
    * touched users replay their persisted intervals + the batch rows
    * through the shared r38 unroll. Out-of-order batch changes are
    * the point: a late event re-opens a user's history, and the
    * replay handles it because intervals carry everything the window
    * needs (the change's ts lives on as valid_from). The oracle is
    * the FULL r38 recompute over all events — a drifted merge (a
    * missed user, a stale current flag, a re-windowed untouched row)
    * breaks the hash. The same bit-identical-to-rebuild property
    * s17/x41 carry.
    *
    * 100 TB shape: the apply pass is sized by the BATCH — the
    * standing table contributes one semi/anti join probe keyed by
    * user (partition-prunable when the table is written bucketed by
    * user), and only touched users' rows re-window. */
  def scd2Apply(standing: DataFrame, batchQuantized: DataFrame): DataFrame = {
    val touchedUsers = batchQuantized.select(col("user_id")).distinct()
    val untouched = standing
      .join(touchedUsers, Seq("user_id"), "left_anti")
    val replay = standing
      .join(touchedUsers, Seq("user_id"), "left_semi")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("valid_from_us").as("ts_us"), col("cents"))
      .unionByName(batchQuantized)
    untouched.unionByName(Relational3.scd2Quantized(replay))
  }

  def r54Scd2Apply(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def quantize(e: DataFrame): DataFrame =
      e.select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val path = graft.TmpPaths.workDir(spark, "scd2", dir)
    Relational3.scd2(ev.filter(col("event_id") % 10 < 8))
      .write.mode("overwrite").parquet(path)
    scd2Apply(spark.read.parquet(path),
      quantize(ev.filter(col("event_id") % 10 >= 8)))
  }

  /** Full recompute from the raw log — the apply must be
    * indistinguishable from a rebuild. */
  val r54Sql: String = Relational3.r38Sql

  // ---- r55: event transition matrix --------------------------------

  /** r55: the per-user EVENT TRANSITION MATRIX — counts of each
    * (previous type → type) step along every user's time-ordered
    * event sequence, with the row-normalized transition rate: the
    * first-order Markov model of user flow (what funnel analysis
    * (r33) fixes to one path, this measures for ALL paths), and the
    * input to next-action prediction and anomaly scoring. Ties on
    * (ts) break by event_id — the r31/r38 total-order discipline —
    * so each user's sequence is deterministic.
    *
    * 100 TB shape: ONE user-keyed exchange for the lag window; the
    * transition agg partial-aggregates to ≤ |types|² rows, and the
    * per-from totals derive from the SAME aggregated relation (a
    * |types|²-row window, not a second scan). */
  def transitionMatrix(eventsIn: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val steps = eventsIn
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val m = steps.groupBy(col("prev_type").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_steps"))
    m.withColumn("from_total",
        sum(col("n_steps")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n_steps"),
        col("from_total"),
        round(col("n_steps").cast("double") /
          col("from_total").cast("double"), 6).as("rate"))
  }

  def r55TransitionMatrix(spark: SparkSession, dir: String): DataFrame =
    transitionMatrix(Tables.events(spark, dir))

  val r55Sql: String =
    """WITH st AS (SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |m AS (SELECT prev_type AS from_type, event_type AS to_type,
      |    count(*) AS n_steps
      |  FROM st WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT from_type, CAST(sum(n_steps) AS BIGINT) AS from_total
      |  FROM m GROUP BY 1)
      |SELECT from_type, to_type, n_steps, from_total,
      |  round(CAST(n_steps AS DOUBLE) / CAST(from_total AS DOUBLE), 6)
      |    AS rate
      |FROM m JOIN t USING (from_type)""".stripMargin

  val r53Sql: String =
    """WITH ev AS (SELECT event_type,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
      |rk AS (SELECT event_type, cents,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY cents)
      |      AS BIGINT) - 1 AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM ev),
      |bd AS (SELECT event_type,
      |    min(CASE WHEN rn = (n - 1) * 5 // 100 THEN cents END) AS lo_cents,
      |    min(CASE WHEN rn = (n - 1) * 95 // 100 THEN cents END) AS hi_cents
      |  FROM rk GROUP BY 1),
      |cl AS (SELECT ev.event_type, cents, lo_cents, hi_cents,
      |    greatest(lo_cents, least(hi_cents, cents)) AS c
      |  FROM ev JOIN bd USING (event_type))
      |SELECT event_type, count(*) AS n,
      |  CAST(min(lo_cents) AS BIGINT) AS lo_cents,
      |  CAST(min(hi_cents) AS BIGINT) AS hi_cents,
      |  CAST(sum(CASE WHEN cents < lo_cents THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clamped_low,
      |  CAST(sum(CASE WHEN cents > hi_cents THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clamped_high,
      |  round(CAST(sum(c) AS DOUBLE) / count(*) / 100.0, 6) AS wmean,
      |  round(CAST(count(*) * sum(c * c) - sum(c) * sum(c) AS DOUBLE) /
      |    CAST(count(*) * count(*) AS DOUBLE) / 10000.0, 6) AS wvar
      |FROM cl GROUP BY 1""".stripMargin

  // ---- r56: rolling discrete median (robust smoothing window) ------

  /** r56: ROLLING DISCRETE MEDIAN — the robust per-entity smoother
    * (median-of-last-5) every metrics/anomaly pipeline runs where a
    * rolling MEAN would chase outliers: for each event, the lower
    * median of the trailing 5 values in the user's own (ts,
    * event_id)-ordered stream, plus the residual against it. The
    * median is DISCRETE (the sorted frame's element at (n+1) div 2,
    * 1-based) — the r53 argument: a SELECTED value is cross-engine
    * exact where an interpolated quantile is a derived float; the
    * residual is one IEEE subtraction of two exact inputs, so the
    * whole row hashes. First rows of a stream take the median of the
    * shorter prefix (n < 5), by the same formula.
    *
    * 100 TB shape: ONE exchange keyed by user, one in-partition sort
    * shared by the frame; the ROWS frame is O(5) per row (bounded
    * memory, unlike a RANGE frame over unbounded history). The
    * sort-within-key is bounded by per-user event counts — the same
    * contract as r13/r18/r25. */
  def r56RollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-4, 0)
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("win", collect_list(col("value")).over(w))
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"),
        element_at(sort_array(col("win")),
          ((size(col("win")) + 1) / 2).cast("int")).as("med5"))
      .withColumn("dev", col("value") - col("med5"))
  }

  val r56Sql: String =
    """WITH w AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
      |    list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS win
      |  FROM events)
      |SELECT user_id, ts_us, event_id, value,
      |  list_sort(win)[(len(win) + 1) // 2] AS med5,
      |  value - list_sort(win)[(len(win) + 1) // 2] AS dev
      |FROM w""".stripMargin

  // ---- r57: peak concurrency (interval sweep line) -----------------

  /** r57: PEAK CONCURRENCY per event type — the classic interval
    * sweep line: treating each event as an interval [ts, ts + value
    * seconds), how many overlap at the busiest instant. This is the
    * capacity question (peak sessions, peak open orders, peak GPU
    * leases) that no windowed aggregate so far answers: r20's
    * sessionization merges overlaps, r46's rate limit counts per
    * fixed bucket; the sweep measures the true instantaneous
    * maximum.
    *
    * Exactness: boundaries are integer micros; the ±1 deltas and
    * their running sum are exact longs. Half-open semantics come
    * from the SORT KEY ENCODING — boundary instants are doubled,
    * ends land on even keys (end·2), starts on odd (start·2+1), so
    * at the same instant ends sort first and back-to-back intervals
    * never double-count. Duration is clamped at 0 (floor to micros),
    * so degenerate intervals contribute nothing.
    *
    * 100 TB shape: the boundary multiset partial-aggregates to one
    * delta row per DISTINCT (type, key) BEFORE the window — the
    * shuffle and in-partition sort carry Σ distinct boundaries, not
    * 2·|events| rows; then ONE type-keyed exchange for the running
    * sum and a partial-agg max. (At a single-type extreme the
    * escalation is time-range chunking with per-chunk offsets — the
    * standard parallel prefix-sum split — noted, not needed at this
    * key domain.) */
  def r57MaxConcurrent(spark: SparkSession, dir: String): DataFrame =
    maxConcurrent(Tables.events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("s_us"),
        greatest(floor(col("value") * 1000000).cast("long"), lit(0L))
          .as("dur_us")))

  /** DataFrame-taking core of r57 (iv: event_type, s_us, dur_us) —
    * the unit/property specs assert on THIS. */
  def maxConcurrent(iv: DataFrame): DataFrame = {
    val pts = iv.select(col("event_type"),
        (col("s_us") * 2 + 1).as("k"), lit(1L).as("delta"))
      .unionByName(iv.select(col("event_type"),
        ((col("s_us") + col("dur_us")) * 2).as("k"), lit(-1L).as("delta")))
    val agg = pts.groupBy(col("event_type"), col("k"))
      .agg(sum(col("delta")).as("d"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    agg.withColumn("run", sum(col("d")).over(w))
      .groupBy(col("event_type"))
      .agg(max(col("run")).as("max_concurrent"),
        sum(when(col("k") % 2 === 1, col("d")).otherwise(lit(0L)))
          .as("n_intervals"))
  }

  val r57Sql: String =
    """WITH iv AS (SELECT event_type, epoch_us(ts) AS s_us,
      |    greatest(CAST(floor(value * 1000000) AS BIGINT), 0) AS dur_us
      |  FROM events),
      |pts AS (SELECT event_type, s_us * 2 + 1 AS k,
      |    CAST(1 AS BIGINT) AS delta FROM iv
      |  UNION ALL SELECT event_type, (s_us + dur_us) * 2,
      |    CAST(-1 AS BIGINT) FROM iv),
      |ag AS (SELECT event_type, k, CAST(sum(delta) AS BIGINT) AS d
      |  FROM pts GROUP BY 1, 2),
      |rn AS (SELECT event_type, k, d,
      |    sum(d) OVER (PARTITION BY event_type ORDER BY k
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |  FROM ag)
      |SELECT event_type, CAST(max(run) AS BIGINT) AS max_concurrent,
      |  CAST(sum(CASE WHEN k % 2 = 1 THEN d ELSE 0 END) AS BIGINT)
      |    AS n_intervals
      |FROM rn GROUP BY 1""".stripMargin

  // ---- r58: forward as-of (time-to-next-purchase) ------------------

  /** r58: FORWARD AS-OF join — each non-purchase event matched to
    * the user's NEXT purchase at-or-after it
    * (AsOfJoin.asOfForward), aggregated to the per-type conversion
    * report: how many events convert at all, total and worst wait.
    * r21 answers "what state preceded this fact" (enrichment); r58
    * answers "what outcome followed it" (attribution-forward /
    * time-to-conversion / SLA-to-next-touch) — the mirrored
    * temporal join, same single-exchange union-tag plan with the
    * running aggregate reversed. Right side pre-aggregated to one
    * row per (user, instant) so the match is deterministic on both
    * engines; waits are exact micros longs.
    *
    * Oracle: DuckDB's native ASOF JOIN with the `<=` bound (its
    * forward form), the same native-vs-composed standard r21 sets. */
  def r58NextPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        unix_micros(col("ts")).as("t_us"), col("event_id"))
    val left = ev.filter(col("event_type") =!= "purchase")
    val right = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("t_us").as("p_us"))
      .agg(max(col("event_id")).as("p_event"))
    graft.operators.AsOfJoin.asOfForward(left, right,
        "user_id", "t_us", "p_us")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_matched"),
        sum(col("asof.p_us") - col("t_us")).as("total_wait_us"),
        max(col("asof.p_us") - col("t_us")).as("max_wait_us"))
  }

  // ---- r59: median absolute deviation (robust outlier gate) --------

  /** r59: MAD OUTLIER DETECTION — per event type, the DISCRETE
    * median of cents, the discrete median of absolute deviations
    * from it (the MAD), and the count beyond the classic 3×MAD
    * robust outlier bar. Completes the robust-statistics family:
    * r53 winsorizes against its own tails (which shift WITH
    * contamination), the MAD gate does not move until half the data
    * is bad — the 50% breakdown point that makes it the standard
    * anomaly bar. Both medians are SELECTED values (the sorted
    * multiset's element at (n−1) div 2 — the r53/r56 discipline:
    * a selected datum is cross-engine exact where an interpolated
    * quantile is a derived float), and every comparison is integer.
    *
    * 100 TB shape: two type-keyed rank passes (each one exchange +
    * in-partition sort) with the selected medians collapsing to a
    * broadcast row between passes; the closing agg is partial. Rank
    * ties among equal values are selection-safe (any tie order
    * selects the same VALUE at the pinned index). */
  def madOutliers(eventsIn: DataFrame): DataFrame = {
    val ev = eventsIn.select(col("event_type"),
      floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    def selectAt(df: DataFrame, c: String, out: String): DataFrame = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col(c)))
        .cast("long") - 1L)
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(min(when(col("rn") === expr("(n - 1) div 2"), col(c))).as(out))
    val med = selectAt(ev, "cents", "med_cents")
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("cents") - col("med_cents")))
    val madv = selectAt(dev.select(col("event_type"), col("dev")),
      "dev", "mad_cents")
    dev.join(broadcast(madv), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("med_cents")).as("med_cents"),
        min(col("mad_cents")).as("mad_cents"),
        sum(when(col("dev") > col("mad_cents") * 3, 1L).otherwise(0L))
          .as("n_outliers"))
  }

  def r59MadOutliers(spark: SparkSession, dir: String): DataFrame =
    madOutliers(Tables.events(spark, dir))

  val r59Sql: String =
    """WITH ev AS (SELECT event_type,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
      |rk AS (SELECT event_type, cents,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY cents)
      |      AS BIGINT) - 1 AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n FROM ev),
      |md AS (SELECT event_type,
      |    min(CASE WHEN rn = (n - 1) // 2 THEN cents END) AS med_cents
      |  FROM rk GROUP BY 1),
      |dv AS (SELECT ev.event_type, cents, med_cents,
      |    abs(cents - med_cents) AS dev
      |  FROM ev JOIN md USING (event_type)),
      |dk AS (SELECT event_type, dev,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY dev)
      |      AS BIGINT) - 1 AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n FROM dv),
      |mv AS (SELECT event_type,
      |    min(CASE WHEN rn = (n - 1) // 2 THEN dev END) AS mad_cents
      |  FROM dk GROUP BY 1)
      |SELECT dv.event_type, count(*) AS n,
      |  CAST(min(med_cents) AS BIGINT) AS med_cents,
      |  CAST(min(mad_cents) AS BIGINT) AS mad_cents,
      |  CAST(sum(CASE WHEN dev > 3 * mad_cents THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_outliers
      |FROM dv JOIN mv USING (event_type) GROUP BY 1""".stripMargin

  val r58Sql: String =
    """WITH ev AS (SELECT event_type, user_id, epoch_us(ts) AS t_us,
      |    event_id FROM events),
      |l AS (SELECT * FROM ev WHERE event_type <> 'purchase'),
      |r AS (SELECT user_id, t_us AS p_us, max(event_id) AS p_event
      |  FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2),
      |j AS (SELECT l.event_type, l.t_us, r.p_us
      |  FROM l ASOF JOIN r
      |    ON l.user_id = r.user_id AND l.t_us <= r.p_us)
      |SELECT event_type, count(*) AS n_matched,
      |  CAST(sum(p_us - t_us) AS BIGINT) AS total_wait_us,
      |  CAST(max(p_us - t_us) AS BIGINT) AS max_wait_us
      |FROM j GROUP BY 1""".stripMargin

  // ---- r60: trailing 7-day distinct users (rolling distinct) -------

  /** r60: ROLLING DISTINCT — trailing 7-day distinct active users
    * for every active day, the canonical WAU/MAU engagement metric.
    * `count(DISTINCT)` does not decompose over sliding windows, so
    * the naive plan re-scans a 7-day window per report day (the
    * oracle's range join — O(days × activity), unrunnable at
    * 100 TB). The engine decomposes it exactly: a user active on day
    * a is counted in windows ending a..a+6, so per user the covered
    * report days form INTERVALS; merging per-user active days whose
    * gap ≤ 6 (gaps-and-islands over one user-keyed exchange) yields
    * disjoint islands [s, e] covering [s, e+6], each contributing
    * +1 at s and −1 at e+7 — and the day-level running sum of those
    * deltas IS the rolling distinct count.
    *
    * 100 TB shape: one (user, day) dedup shuffle + one user-keyed
    * window for island merge (both partition by user, so the second
    * reuses the first's exchange); deltas partial-aggregate to ≤ 2
    * rows per distinct DAY, so the final running sum is a
    * single-partition window over the calendar — thousands of rows
    * regardless of corpus size. */
  def r60RollingDistinct(spark: SparkSession, dir: String): DataFrame =
    rollingDistinct(Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")))

  /** DataFrame-taking core of r60 (user_id, d DATE) — specs assert
    * on THIS against a brute-force window recount. */
  def rollingDistinct(ud0: DataFrame, windowDays: Int = 7): DataFrame = {
    val g = windowDays - 1
    val ud = ud0.select(col("user_id"), col("d")).distinct()
    val wu = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val islands = ud
      .withColumn("prev", lag(col("d"), 1).over(wu))
      .withColumn("brk", when(col("prev").isNull ||
        datediff(col("d"), col("prev")) > g, 1L).otherwise(0L))
      .withColumn("isl", sum(col("brk")).over(
        wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("isl"))
      .agg(min(col("d")).as("s"), max(col("d")).as("e"))
    val deltas = islands
      .select(col("s").as("d"), lit(1L).as("delta"))
      .unionByName(islands.select(date_add(col("e"), windowDays).as("d"),
        lit(-1L).as("delta")))
      .groupBy(col("d")).agg(sum(col("delta")).as("dd"))
    // evaluate the running sum at every report (= active) day; same-
    // day deltas order before the report probe (false < true), so a
    // user entering on day d is counted in d's own window
    val probes = ud.select(col("d")).distinct()
      .select(col("d"), lit(0L).as("dd"), lit(true).as("rep"))
    val run = deltas.select(col("d"), col("dd"), lit(false).as("rep"))
      .unionByName(probes)
      .withColumn("run", sum(col("dd")).over(Window.orderBy(col("d"),
        col("rep")).rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    run.filter(col("rep"))
      .select(datediff(col("d"), lit("1970-01-01")).cast("long")
        .as("epoch_day"), col("run").as("n_users_7d"))
  }

  /** Oracle: the NAIVE formulation — a per-day range join recounting
    * each window from scratch — so the interval-merge decomposition
    * is certified against an independent restatement of the metric's
    * definition, not a re-derivation of the engine's algebra. */
  val r60Sql: String =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
      |  FROM events),
      |days AS (SELECT DISTINCT d FROM ud)
      |SELECT CAST(days.d - DATE '1970-01-01' AS BIGINT) AS epoch_day,
      |  CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_users_7d
      |FROM days JOIN ud u ON u.d BETWEEN days.d - 6 AND days.d
      |GROUP BY 1""".stripMargin
}
