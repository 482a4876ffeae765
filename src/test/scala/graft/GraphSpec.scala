package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Integer-exact PageRank (g1) and degree-ordered triangle counting
  * (g2) on hand-checked graphs + a reference-fold parity check.
  */
class GraphSpec extends SparkTestBase {
  import testImplicits._

  test("pageRank: hand-checked one round on a path graph") {
    // 1 - 2 - 3: deg(1)=deg(3)=1, deg(2)=2
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val got = Graph.pageRank(pairs, iters = 1)
      .as[(Long, Long)].collect().toMap
    // r(2) = (15e6 + 85*(1e6 + 1e6)) / 100; r(1)=r(3)=(15e6+85*5e5)/100
    assert(got === Map(1L -> 575000L, 2L -> 1850000L, 3L -> 575000L))
  }

  test("pageRank: multi-round matches an in-memory reference fold") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (5L, 6L))
    val pairs = edges.toDF("doc_a", "doc_b")
    val got = Graph.pageRank(pairs, iters = 4)
      .as[(Long, Long)].collect().toMap
    // reference: same integer recurrence over adjacency maps
    val sym = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = sym.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    var r = deg.keys.map(_ -> 1000000L).toMap
    (1 to 4).foreach { _ =>
      val in = sym.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / deg(u) }.sum
      }
      r = in.map { case (v, s) => v -> (15L * 1000000L + 85L * s) / 100L }
    }
    assert(got === r)
  }

  test("triangleCounts: shared-edge triangles, pendant excluded") {
    // triangles {1,2,3} and {1,3,4}; node 5 pendant off 4
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (3L, 4L),
      (4L, 5L)).toDF("doc_a", "doc_b")
    val got = Graph.triangleCounts(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("triangleCounts: K4 gives every node 3 triangles") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val pairs = (for {
      a <- nodes; b <- nodes if a < b
    } yield (a, b)).toDF("doc_a", "doc_b")
    val got = Graph.triangleCounts(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === nodes.map(_ -> 3L).toMap)
  }

  test("twoHopCounts: path graph hand-check, triangle saturates") {
    // path 1-2-3-4: within-2 of 1 = {2,3}; of 2 = {1,3,4};
    // of 3 = {1,2,4}; of 4 = {2,3}
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val got = Graph.twoHopCounts(path).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 3L, 3L -> 3L, 4L -> 2L))
    // triangle 1-2-3: everyone reaches everyone in <= 2
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    val got2 = Graph.twoHopCounts(tri).as[(Long, Long)].collect().toMap
    assert(got2 === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("bfsLayers: chain distances, unreachable at -1, maxHops cap") {
    // chain 0-1-2-3-4-5-6 plus isolated pair 8-9; seeds = %7==0 -> {0,7?}
    // nodes present: 0..6, 8, 9 -> seed set {0}
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (8L, 9L)).toDF("doc_a", "doc_b")
    val got = Graph.bfsLayers(pairs, seedMod = 7L, maxHops = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L,
      5L -> -1L, 6L -> -1L, 8L -> -1L, 9L -> -1L))
  }

  test("bfsLayers: two seeds meet in the middle, min distance wins") {
    // cycle 0-1-2-3-4-5-6-0: seeds {0}; node 3 and 4 both at 3 via
    // opposite directions; then add seed 7 bridging to 3
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 0L), (7L, 3L)).toDF("doc_a", "doc_b")
    val got = Graph.bfsLayers(pairs, seedMod = 7L, maxHops = 4)
      .as[(Long, Long)].collect().toMap
    // seeds {0, 7}: 3 is 1 hop from 7 (not 3 from 0); 4 is 2 hops via 7-3
    assert(got === Map(0L -> 0L, 7L -> 0L, 1L -> 1L, 6L -> 1L, 3L -> 1L,
      2L -> 2L, 5L -> 2L, 4L -> 2L))
  }

  test("kCorePeel: pendant chain peels outside-in, triangle survives, " +
    "peel rounds recorded") {
    // triangle {1,2,3} with a chain 3-4-5 hanging off it
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("doc_a", "doc_b")
    val got = Graph.kCorePeel(pairs, k = 2L, rounds = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // round 1: node 5 (deg 1) peels; round 2: node 4 (deg now 1) peels;
    // triangle nodes keep degree 2 and survive
    assert(got === Map(
      1L -> ((-1L, 2L)), 2L -> ((-1L, 2L)), 3L -> ((-1L, 2L)),
      4L -> ((2L, -1L)), 5L -> ((1L, -1L))))
  }

  test("kCorePeel: whole graph dissolves when nothing meets k") {
    // a bare path 1-2-3: everything eventually peels
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val got = Graph.kCorePeel(pairs, k = 2L, rounds = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    // round 1 peels the endpoints (deg 1); round 2 peels the middle
    assert(got === Map(1L -> 1L, 3L -> 1L, 2L -> 2L))
  }

  test("g1/g2 run on the real d6 graph and rank mass stays sane") {
    import graft.queries.GraphQueries
    val pr = GraphQueries.g1PageRank(spark, sf).as[(Long, Long)].collect()
    assert(pr.nonEmpty)
    // every rank >= the base (15% of scale) and bounded by total mass
    assert(pr.forall(_._2 >= 150000L))
    val tri = GraphQueries.g2Triangles(spark, sf).as[(Long, Long)].collect()
    // triangle participants are a subset of ranked nodes
    val nodes = pr.map(_._1).toSet
    assert(tri.forall(t => nodes.contains(t._1)))
  }
}
