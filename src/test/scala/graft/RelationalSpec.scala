package graft

import graft.queries.Relational

class RelationalSpec extends SparkTestBase {
  test("q1_agg groups to the returnflag x linestatus grid") {
    val rows = Relational.q1Agg(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    val counts = rows.map(_.getAs[Long]("count_order"))
    assert(counts.sum == 6000L) // all lineitem rows accounted for
  }

  test("q2_topk returns 25 rows in descending price order") {
    val prices = Relational.q2TopK(spark, sf)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length == 25)
    assert(prices.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("q6_filter_agg returns one row") {
    val rows = Relational.q6FilterAgg(spark, sf).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("n") > 0)
  }

  test("as-of join: latest right row at-or-before each left time, per key") {
    import testImplicits._
    val left = Seq( // (key, t, tag)
      (1L, 10, "a"), (1L, 20, "b"), (1L, 5, "early"),
      (2L, 15, "c"), (3L, 99, "lonely"))
      .toDF("k", "t", "tag")
    val right = Seq( // (key, t, payload) — unique per (key, t)
      (1L, 10, "r10"), (1L, 18, "r18"), (2L, 15, "r15"), (4L, 1, "r-unused"))
      .toDF("k", "t", "p")
    val out = graft.operators.AsOfJoin.asOf(left, right, "k", "t", "t")
      .select("tag", "asof.p").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // equal timestamps match (<= bound): left(1,10) takes right(1,10)
    assert(out === Map("a" -> "r10", "b" -> "r18", "c" -> "r15"))
    // "early" (t=5, before every right row) and "lonely" (no key
    // match) are dropped — inner semantics, no NULL output
    assert(!out.contains("early") && !out.contains("lonely"))
  }

  test("forward as-of join: earliest right row at-or-after each left " +
    "time, per key") {
    import testImplicits._
    val left = Seq( // (key, t, tag)
      (1L, 10, "a"), (1L, 20, "b"), (1L, 99, "late"),
      (2L, 15, "c"), (3L, 1, "lonely"))
      .toDF("k", "t", "tag")
    val right = Seq( // (key, t, payload) — unique per (key, t)
      (1L, 10, "r10"), (1L, 18, "r18"), (1L, 25, "r25"),
      (2L, 15, "r15"), (4L, 1, "r-unused"))
      .toDF("k", "t", "p")
    val out = graft.operators.AsOfJoin.asOfForward(left, right, "k", "t", "t")
      .select("tag", "asof.p").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // equal timestamps match (>= bound): left(1,10) takes right(1,10);
    // left(1,20) skips the past r18 and takes r25
    assert(out === Map("a" -> "r10", "b" -> "r25", "c" -> "r15"))
    // "late" (t=99, after every right row) and "lonely" (no key
    // match) are dropped — inner semantics, no NULL output
    assert(!out.contains("late") && !out.contains("lonely"))
  }

  test("range join: bucket decomposition matches the plain inequality join") {
    import testImplicits._
    val pts = Seq((1L, 0L), (2L, 7L), (3L, 10L), (4L, 19L), (5L, 20L),
      (6L, 25L), (7L, 999L)).toDF("id", "v")
    val ranges = Seq(("a", 0L, 10L), ("b", 5L, 20L), ("c", 10L, 30L))
      .toDF("name", "lo", "hi")
    val got = graft.operators.RangeJoin
      .bucketed(pts, ranges, "v", "lo", "hi", width = 8)
      .select("id", "range.name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // reference: plain non-equi join (broadcast NLJ — fine for a spec)
    val expect = pts.join(ranges,
        pts("v") >= ranges("lo") && pts("v") < ranges("hi"))
      .select("id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === expect)
    // boundary semantics: v=10 excluded from [0,10) but in [5,20)+[10,30);
    // v=20 excluded from [5,20) but in [10,30); v=999 matches nothing
    assert(got.filter(_._1 == 3L).map(_._2) === Set("b", "c"))
    assert(got.filter(_._1 == 5L).map(_._2) === Set("c"))
    assert(!got.exists(_._1 == 7L))
  }

  test("range join: fractional bounds keep full coverage") {
    import testImplicits._
    // v=10.2 in [5.0, 10.5): the old floor((end-1)/w) last bucket
    // would stop at bucket 0 and silently drop this match
    val pts = Seq((1L, 10.2), (2L, 4.9), (3L, 10.5)).toDF("id", "v")
    val ranges = Seq(("a", 5.0, 10.5)).toDF("name", "lo", "hi")
    val got = graft.operators.RangeJoin
      .bucketed(pts, ranges, "v", "lo", "hi", width = 10)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L)) // 4.9 below, 10.5 excluded (exclusive end)
  }

  test("r23 outer joins: all three row classes present, no NULL cells") {
    val rows = graft.queries.Relational2.r23OuterJoin(spark, sf).collect()
    assert(rows.forall(r => (0 until r.length).forall(i => !r.isNullAt(i))))
    val (left, full) = rows.partition(_.getAs[String]("mode") == "left")
    assert(left.nonEmpty && full.length >= left.length)
    // left branch: exactly the filtered customers, matched or not
    assert(left.forall(_.getAs[Long]("custkey") % 7 == 0))
    // full branch adds right-only rows: sentinel segment, real counts
    val rightOnly = full.filter(_.getAs[String]("segment") == "NONE")
    assert(rightOnly.nonEmpty)
    assert(rightOnly.forall(r => r.getAs[Long]("custkey") % 7 != 0 &&
      r.getAs[Long]("n_big") > 0 && r.getAs[Long]("max_okey") >= 0))
    // left-only rows carry the 0 / -1 sentinels
    val leftOnly = left.filter(_.getAs[Long]("n_big") == 0)
    assert(leftOnly.forall(_.getAs[Long]("max_okey") == -1L))
    // the full branch's left-class rows equal the left branch exactly
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("custkey"), r.getAs[String]("segment"),
        r.getAs[Long]("n_big"), r.getAs[Long]("max_okey"))
    assert(full.filter(_.getAs[String]("segment") != "NONE")
      .map(key).toSet === left.map(key).toSet)
  }

  test("as-of join: NULL keys and NULL times never match (either side)") {
    import testImplicits._
    val left = Seq( // NULL key / NULL time left rows must vanish
      (Option(1L), Option(10), "ok"),
      (Option.empty[Long], Option(10), "null-key"),
      (Option(1L), Option.empty[Int], "null-time"))
      .toDF("k", "t", "tag")
    val right = Seq( // NULL-keyed right row must never be matched
      (Option(1L), Option(5), "r5"),
      (Option.empty[Long], Option(1), "r-null"),
      (Option(1L), Option.empty[Int], "r-null-t"))
      .toDF("k", "t", "p")
    val out = graft.operators.AsOfJoin.asOf(left, right, "k", "t", "t")
      .select("tag", "asof.p").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // equality semantics: only the non-NULL row pairs with the
    // non-NULL right row — DuckDB's ASOF JOIN does the same
    assert(out === Map("ok" -> "r5"))
  }

  test("as-of join: randomized parity with a naive per-row reference") {
    import testImplicits._
    val rnd = new scala.util.Random(4242)
    // random keys/times, duplicate left times allowed; right unique
    // per (key, time) as the operator contract requires
    val left = Seq.tabulate(120)(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(50), i.toLong))
    val right = Seq.tabulate(60)(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(50), i * 100L))
      .groupBy(r => (r._1, r._2)).values.map(_.head).toSeq
    val out = graft.operators.AsOfJoin.asOf(
        left.toDF("k", "t", "lid"), right.toDF("k", "t", "rid"),
        "k", "t", "t")
      .select("lid", "asof.rid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive reference: latest right with same key and rt <= lt
    left.foreach { case (k, t, lid) =>
      val cand = right.filter(r => r._1 == k && r._2 <= t)
      if (cand.isEmpty) assert(!out.contains(lid))
      else assert(out(lid) === cand.maxBy(_._2)._3,
        s"left $lid (k=$k, t=$t)")
    }
  }

  test("range join: randomized parity across bucket widths") {
    import testImplicits._
    val rnd = new scala.util.Random(777)
    val pts = Seq.tabulate(100)(i => (i.toLong, rnd.nextInt(200).toLong))
    val ranges = Seq.tabulate(30) { i =>
      val lo = rnd.nextInt(200).toLong
      (s"r$i", lo, lo + rnd.nextInt(40).toLong) // includes empty (hi==lo)
    }
    val expect = (for {
      (id, v) <- pts; (name, lo, hi) <- ranges
      if v >= lo && v < hi
    } yield (id, name)).toSet
    Seq(1L, 7L, 64L).foreach { w =>
      val got = graft.operators.RangeJoin
        .bucketed(pts.toDF("id", "v"), ranges.toDF("name", "lo", "hi"),
          "v", "lo", "hi", width = w)
        .select("id", "range.name").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === expect, s"width=$w")
    }
  }
}
