package graft

import java.sql.Timestamp

/** r47–r52: the round-9 TPC-H shapes (Q4, Q13, Q14, Q15, Q19, Q8
  * analogs), each against a hand-checked fixture that exercises the
  * window boundaries, the zero/empty buckets, and the exact-money
  * tie semantics the oracle hash depends on. */
class Relational4Spec extends SparkTestBase {
  import testImplicits._
  import graft.queries.Relational4

  private def ts(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  test("r47 lateShipments: EXISTS counts each order once, boundary " +
    "+60d is not late, window prunes") {
    val orders = Seq(
      // late line (+89d) -> counted under 1-URGENT
      (1L, ts("1997-02-01"), "1-URGENT"),
      // only an on-time line (+31d) -> not counted
      (2L, ts("1997-03-01"), "1-URGENT"),
      // outside the order window -> never counted, even though late
      (3L, ts("1996-12-31"), "2-HIGH"),
      // TWO late lines -> still one order (semi join short-circuit)
      (4L, ts("1997-06-30"), "2-HIGH"),
      // exactly +60 days -> strict '>' excludes it
      (5L, ts("1997-02-01"), "3-MEDIUM"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Seq(
      (1L, ts("1997-05-01")),
      (2L, ts("1997-04-01")),
      (3L, ts("1997-06-01")),
      (4L, ts("1997-09-15")), (4L, ts("1997-10-01")),
      (5L, ts("1997-04-02")))
      .toDF("l_orderkey", "l_shipdate")
    val got = Relational4.lateShipments(orders, li)
      .as[(String, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(("1-URGENT", 1L), ("2-HIGH", 1L)))
  }

  test("r48 customerDistribution: zero bucket kept, excluded-priority " +
    "orders count as zero") {
    val cust = Seq(1L, 2L, 3L, 4L).toDF("c_custkey")
    val orders = Seq(
      (10L, 1L, "1-URGENT"), (11L, 1L, "3-MEDIUM"), (12L, 1L, "5-LOW"),
      (13L, 3L, "2-HIGH"),
      (14L, 4L, "5-LOW")) // c4's only order is excluded -> zero bucket
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val got = Relational4.customerDistribution(cust, orders)
      .as[(Long, Long)].collect().toSeq
    // c1 -> 2, c2 -> 0, c3 -> 1, c4 -> 0; ordered custdist DESC, count DESC
    assert(got === Seq((0L, 2L), (2L, 1L), (1L, 1L)))
  }

  test("r49 promoShare: conditional/total ratio exact, month boundary " +
    "excluded") {
    val li = Seq(
      (1L, ts("1997-09-15"), 100.0, 0.10), // promo: cp = 10000*90
      (2L, ts("1997-09-20"), 50.0, 0.00),  // non-promo: cp = 5000*100
      (1L, ts("1997-10-01"), 999.0, 0.00)) // out of window
      .toDF("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
    val part = Seq((1L, "PROMO"), (2L, "STANDARD")).toDF("p_partkey", "p_type")
    val got = Relational4.promoShare(li, part)
      .as[(Long, Long, Double)].collect()
    assert(got.length === 1)
    assert(got(0)._1 === 900000L)
    assert(got(0)._2 === 1400000L)
    // 900000*100/1400000 = 64.2857142857... -> round 6
    assert(got(0)._3 === 64.285714)
  }

  test("r50 topSupplier: exact cent-percent max, ties both returned " +
    "in suppkey order") {
    val li = Seq(
      (1L, ts("1997-01-10"), 100.0, 0.0), // s1: cp 1000000
      (1L, ts("1997-02-10"), 50.0, 0.0),  // s1: cp  500000 -> 1500000
      (2L, ts("1997-03-10"), 150.0, 0.0), // s2: cp 1500000 -> tie
      (2L, ts("1997-04-01"), 999.0, 0.0)) // out of quarter
      .toDF("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    val supp = Seq((1L, "supp1"), (2L, "supp2")).toDF("s_suppkey", "s_name")
    val got = Relational4.topSupplier(li, supp)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(got === Seq((1L, "supp1", 1500000L, 150.0),
      (2L, "supp2", 1500000L, 150.0)))
  }

  test("r51 disjunctiveRevenue: each branch admits only its own " +
    "brand/size/quantity envelope") {
    val part = Seq(
      (1L, "Brand#1", 3),   // branch-1 territory
      (2L, "Brand#2", 8),   // branch-2 territory
      (3L, "Brand#3", 12),  // branch-3 territory
      (4L, "Brand#1", 20),  // size > 15: pruned at the part scan
      (5L, "Brand#9", 2))   // brand not in the IN-list
      .toDF("p_partkey", "p_brand", "p_size")
    val li = Seq(
      (1L, 5.0, 10.0, 0.0),  // branch 1: qty < 11     -> cp 100000
      (1L, 15.0, 99.0, 0.0), // brand 1 but qty 15: no branch admits
      (2L, 10.0, 20.0, 0.0), // branch 2: 10 <= qty<21 -> cp 200000
      (3L, 25.0, 30.0, 0.0), // branch 3: 20 <= qty<31 -> cp 300000
      (3L, 31.0, 99.0, 0.0), // qty 31: pruned at the lineitem scan
      (5L, 5.0, 99.0, 0.0))  // excluded brand
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val got = Relational4.disjunctiveRevenue(li, part)
      .as[(Long, Long, Double)].collect()
    assert(got.toSeq === Seq((3L, 600000L, 60.0)))
  }

  test("r52 marketShare: numerator gated on supplier nation, orders " +
    "gated on customer region, per-year split") {
    val region = Seq((0L, "ASIA"), (1L, "EUROPE"))
      .toDF("r_regionkey", "r_name")
    val nation = Seq((0L, "NATION_0", 0L), (5L, "NATION_5", 1L),
      (6L, "NATION_6", 1L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val cust = Seq((1L, 0L), (2L, 6L)).toDF("c_custkey", "c_nationkey")
    val supp = Seq((1L, 5L), (2L, 6L)).toDF("s_suppkey", "s_nationkey")
    val part = Seq((1L, "PROMO"), (2L, "STANDARD"))
      .toDF("p_partkey", "p_type")
    val orders = Seq(
      (10L, 1L, ts("1996-05-01")), // ASIA, 1996
      (11L, 1L, ts("1997-03-01")), // ASIA, 1997
      (12L, 2L, ts("1996-06-01")), // EUROPE customer: excluded
      (13L, 1L, ts("1998-01-01"))) // outside the window
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val li = Seq(
      (10L, 1L, 1L, 100.0, 0.0), // 1996, NATION_5 supplier: cp 1000000
      (10L, 1L, 2L, 100.0, 0.0), // 1996, other supplier:    cp 1000000
      (10L, 2L, 1L, 999.0, 0.0), // non-PROMO part: excluded
      (11L, 1L, 2L, 50.0, 0.0),  // 1997, other supplier:    cp  500000
      (12L, 1L, 1L, 999.0, 0.0), // EUROPE customer's order: excluded
      (13L, 1L, 1L, 999.0, 0.0)) // out-of-window order: excluded
      .toDF("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
    val got = Relational4.marketShare(li, orders, part, cust, supp,
      nation, region)
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(got === Seq((1996, 1000000L, 2000000L, 0.5),
      (1997, 0L, 500000L, 0.0)))
  }

  test("r54 scd2Apply: out-of-order batch re-opens a user's history, " +
    "untouched users pass through, result equals full rebuild") {
    import org.apache.spark.sql.functions._
    import graft.queries.{Relational3, Relational4}
    def ev(rows: Seq[(Long, Long, String, Double)]) =
      rows.map { case (eid, uid, t, v) =>
        (eid, ts(s"2024-01-0$t"), uid, "upd", v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts", col("ts"))
    // standing: user 1 at days 1 and 5; user 2 at day 3
    val standingEvents = ev(Seq(
      (1L, 1L, "1", 1.0), (2L, 1L, "5", 2.0), (3L, 2L, "3", 3.0)))
    // batch: user 1 gets a LATE day-2 change (lands between the two
    // standing intervals); user 3 is brand new
    val batchEvents = ev(Seq((4L, 1L, "2", 4.0), (5L, 3L, "4", 5.0)))
    def quantize(e: org.apache.spark.sql.DataFrame) =
      e.select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val standing = Relational3.scd2(standingEvents)
    val got = Relational4.scd2Apply(standing, quantize(batchEvents))
      .as[(Long, Long, Long, Long, Boolean, String, Long)]
      .collect().toSet
    val expected = Relational3.scd2(
      standingEvents.unionByName(batchEvents))
      .as[(Long, Long, Long, Long, Boolean, String, Long)]
      .collect().toSet
    assert(got === expected && expected.size === 5)
    // the late change chained in: event 1's interval now closes at
    // day 2, and event 4's closes at day 5
    val byEvent = got.map(r => r._2 -> r).toMap
    assert(byEvent(1L)._4 === byEvent(4L)._3) // e1.valid_to = e4.from
    assert(byEvent(4L)._4 === byEvent(2L)._3) // e4.valid_to = e2.from
    assert(byEvent(3L)._5 === true)           // untouched user 2 current
    assert(byEvent(5L)._5 === true)           // new user 3 current
  }

  test("r56 rollingMedian: lower-median hand-check over a growing " +
    "frame, outlier absorbed, residual exact") {
    import graft.queries.Relational4
    import org.apache.spark.sql.functions.{col, unix_micros}
    val got = Relational4.r56RollingMedian(spark, sf)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    // recompute per user from the raw events
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)].collect()
    val expected = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      ordered.indices.map { i =>
        val frame = ordered.slice(math.max(0, i - 4), i + 1).map(_._4).sorted
        val med = frame((frame.length + 1) / 2 - 1)
        (u, ordered(i)._2, ordered(i)._3, ordered(i)._4, med,
          ordered(i)._4 - med)
      }
    }.toSet
    assert(got.toSet === expected)
  }
}
