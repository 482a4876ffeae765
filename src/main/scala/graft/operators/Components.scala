package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * the transitive-closure step of a dedup pipeline: near-dup PAIRS
  * (d2/d4/d6/d7 output) under-merge chains (a~b, b~c puts a and c in
  * different "pairs" but the same duplicate family), so production
  * curation clusters first and then keeps one survivor per cluster.
  *
  * Algorithm: iterative minimum-label propagation (the standard
  * large-graph formulation — what GraphX/Pregel CC does, expressed
  * on DataFrames): every node starts labeled with itself; each round
  * every node takes the min of its own and its neighbors' labels;
  * converged when no label changes. Rounds = O(component diameter);
  * near-dup families are shallow (stars/short chains), so a handful
  * of rounds closes 100 TB of pairs. Each round is one equi-join +
  * one partial-agg groupBy on the node key — no driver-side graph,
  * and `localCheckpoint` truncates the growing lineage each round
  * (on a cluster: `checkpoint` to the reliable dir). The driver-side
  * `count()` per round is the convergence test every iterative
  * distributed algorithm pays.
  *
  * Contract: a pathological deep-chain corpus (each doc near-duping
  * only the next) needs O(n) rounds and fails loudly at `maxIters`;
  * if a real corpus ever trips that, the escalation is the
  * alternating large-star/small-star formulation (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond"), which converges
  * in O(log n) rounds on the same one-join-per-round shape.
  */
object Components {

  /** Connected components of the undirected graph given by `edges`
    * (two LONG columns `a`, `b`). Returns one row per distinct node:
    * (node, cluster) where cluster = min node id reachable. */
  def connectedComponents(edges: DataFrame, maxIters: Int = 50): DataFrame = {
    val e = edges.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b"))
    // symmetric closure once, reused every round
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint(true)
    var labels = sym.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val nbrMin = sym.join(labels, sym("b") === labels("node"))
        .groupBy(col("a")).agg(min(col("label")).as("nbr_min"))
      val next = labels.alias("l")
        .join(nbrMin.alias("p"), col("l.node") === col("p.a"), "left")
        .select(col("l.node").as("node"),
          least(col("l.label"), coalesce(col("p.nbr_min"), col("l.label")))
            .as("label"))
        .localCheckpoint(true)
      val changed = next.alias("n").join(labels.alias("o"), Seq("node"))
        .filter(col("n.label") =!= col("o.label")).count()
      // release the superseded round's snapshot NOW — without this,
      // up to maxIters dead label tables pile up in storage memory
      // until the driver's ContextCleaner happens to GC them
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    require(converged, s"connectedComponents did not converge in $maxIters rounds")
    labels.select(col("node"), col("label").as("cluster"))
  }
}
