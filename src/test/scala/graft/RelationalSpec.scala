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
}
