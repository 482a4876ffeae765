package graft

import org.apache.spark.sql.functions._
import graft.queries.CorpusQueries

/** Misra–Gries sketch aggregate (functions/Sketches.scala) + the x36
  * two-pass heavy-hitters query built on it. */
class SketchesSpec extends SparkTestBase {
  import testImplicits._

  // planted stream: one 20% heavy hitter, one 5% warm term, unique tail
  private def planted(n: Int): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < n) {
      out += (if (i % 5 == 0) "hot" else if (i % 20 == 1) "warm" else s"tail_$i")
      i += 1
    }
    out.result()
  }

  test("misra_gries retains every term above the n/(k+1) guarantee") {
    val n = 20000
    val df = planted(n).toDF("term").repartition(8)
    val rows = df.agg(expr("misra_gries(term, 64)").as("s"))
      .selectExpr("inline(s)").as[(String, Long)].collect().toMap
    // guarantee: any term with freq > n/(k+1) survives the sketch
    assert(rows.contains("hot"), "20% heavy hitter must survive")
    assert(rows.contains("warm"), "5% term must survive k=64 (n/65 ~ 1.5%)")
    assert(rows.size <= 64)
    // merged-summary error bound: est <= true <= est + n/(k+1)
    val trueHot = n / 5
    val trueWarm = n / 20
    assert(rows("hot") <= trueHot && trueHot - rows("hot") <= n / 65 + 1)
    assert(rows("warm") <= trueWarm && trueWarm - rows("warm") <= n / 65 + 1)
  }

  test("misra_gries estimates are an undercount for ALL surviving terms") {
    val n = 8000
    val df = planted(n).toDF("term").repartition(16)
    val est = df.agg(expr("misra_gries(term, 32)").as("s"))
      .selectExpr("inline(s)").as[(String, Long)].collect().toMap
    val exact = planted(n).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    est.foreach { case (t, e) =>
      assert(e <= exact(t), s"$t: est $e must not exceed true ${exact(t)}")
      assert(exact(t) - e <= n / 33 + 1, s"$t: error beyond bound")
    }
  }

  test("sketch survives serialize/deserialize round trip (multi-partition merge)") {
    // 64 partitions force partial-buffer serialization through the
    // exchange; a heavy hitter spread across all of them must still
    // aggregate to one near-exact counter
    val df = (0 until 10000).map(i => if (i % 2 == 0) "even" else s"odd_$i")
      .toDF("term").repartition(64)
    val rows = df.agg(expr("misra_gries(term, 16)").as("s"))
      .selectExpr("inline(s)").as[(String, Long)].collect().toMap
    assert(rows.contains("even"))
    assert(rows("even") <= 5000 && 5000 - rows("even") <= 10000 / 17 + 1)
  }

  test("x36 heavy hitters equals exact brute force on the corpus") {
    val got = CorpusQueries.x36HeavyHitters(spark, sf)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    // brute force: full groupBy, same threshold
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
    val n = toks.count()
    val exact = toks.groupBy("term").count()
      .where(col("count") * lit(64L) >= lit(n))
      .as[(String, Long)].collect().sortBy(_._1)
    assert(got.nonEmpty, "sf0.001 corpus should have at least one >1/64 term")
    assert(got.map(r => (r._1, r._2)).toSeq === exact.toSeq)
    got.foreach { case (_, cnt, share) =>
      assert(math.abs(share - cnt.toDouble / n) < 1e-6)
    }
  }
}
