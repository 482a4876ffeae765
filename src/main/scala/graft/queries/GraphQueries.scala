package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Graph
import graft.sources.Tables

/** Graph analytics over the near-dup pair graph (SURVEY LLM-1's
  * d-family emits the edges; d9 already clusters them) — PageRank
  * centrality (g1) and triangle counting (g2), the canonical-doc
  * ranking and cohesion measures a curation pipeline derives from
  * its duplicate graph. Both oracles restate the FULL iteration /
  * combinatorics arithmetically (integer micro-unit ranks, unrolled
  * iterations; orientation-ordered wedge joins), so the driver's
  * hash gate applies to iterative graph analytics — the same
  * standard d9's recursive-CTE closure set.
  */
object GraphQueries {

  /** g1: PageRank over the d6 SimHash near-dup graph, 5 integer-
    * exact iterations — "which documents sit at the center of a
    * near-duplication neighborhood" (the authority score x24-style
    * representative selection would consult at corpus scale).
    * Oracle: d6's pair SQL nested as a CTE + the 5 rounds unrolled
    * (aggregates are not allowed in a recursive CTE term, and the
    * iteration count is a fixed parameter anyway). */
  def g1PageRank(spark: SparkSession, dir: String): DataFrame =
    Graph.pageRank(LlmQueries.d6SimhashPairs(spark, dir), iters = 5)

  val g1Sql: String = {
    val rounds = (1 to 5).map { i =>
      s"""r$i AS MATERIALIZED (SELECT e.d AS node,
         |    CAST((15 * 1000000 + 85 * sum(r.pr // g.deg)) // 100 AS BIGINT)
         |      AS pr
         |  FROM sym e JOIN r${i - 1} r ON r.node = e.s
         |    JOIN deg g ON g.s = e.s
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM (
       |${LlmQueries.d6Sql}
       |)),
       |sym AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |deg AS MATERIALIZED (SELECT s, count(*) AS deg FROM sym GROUP BY 1),
       |r0 AS MATERIALIZED (SELECT s AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
       |$rounds
       |SELECT node AS doc_id, pr AS rank_micro FROM r5""".stripMargin
  }

  /** g2: per-document triangle counts in the same graph — the local
    * cohesion signal (a doc in many triangles sits in a dense
    * duplicate clique, not a chain of pairwise accidents; exactly
    * the distinction d9's components cannot make). */
  def g2Triangles(spark: SparkSession, dir: String): DataFrame =
    Graph.triangleCounts(LlmQueries.d6SimhashPairs(spark, dir))

  val g2Sql: String =
    s"""WITH pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM (
       |${LlmQueries.d6Sql}
       |)),
       |sym AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |deg AS MATERIALIZED (SELECT s, count(*) AS deg FROM sym GROUP BY 1),
       |ornt AS MATERIALIZED (SELECT e.s AS src, e.d AS dst
       |  FROM sym e JOIN deg a ON a.s = e.s JOIN deg b ON b.s = e.d
       |  WHERE a.deg < b.deg OR (a.deg = b.deg AND e.s < e.d)),
       |tri AS MATERIALIZED (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
       |  FROM ornt e1 JOIN ornt e2 ON e1.src = e2.src
       |  JOIN ornt e3 ON e3.src = e1.dst AND e3.dst = e2.dst
       |  WHERE e1.dst <> e2.dst),
       |cr AS MATERIALIZED (SELECT unnest([u, v, w]) AS doc_id FROM tri)
       |SELECT doc_id, count(*) AS n_triangles FROM cr GROUP BY 1""".stripMargin

  /** g3: distinct ≤2-hop neighborhood size in the same graph — the
    * candidate-expansion count (how wide a near-dup family grows
    * when widened through one intermediate; the breadth signal
    * between g2's local cohesion and d9's full closure). */
  def g3TwoHop(spark: SparkSession, dir: String): DataFrame =
    Graph.twoHopCounts(LlmQueries.d6SimhashPairs(spark, dir))

  val g3Sql: String =
    s"""WITH pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM (
       |${LlmQueries.d6Sql}
       |)),
       |sym AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |two AS MATERIALIZED (SELECT a.s, b.d FROM sym a JOIN sym b ON a.d = b.s
       |  WHERE b.d <> a.s),
       |al AS (SELECT s, d FROM sym UNION SELECT s, d FROM two)
       |SELECT s AS doc_id, count(*) AS n_within_2 FROM al GROUP BY 1""".stripMargin

  /** g4: local clustering coefficient over the same near-dup graph —
    * the template-vs-chain discriminator (Graph.
    * clusteringCoefficients): near-clique families (cc → 1) are safe
    * to collapse to one survivor; low-cc chains are the over-merge
    * hazard d9's docs warn about. Same oriented-wedge triangle plan
    * as g2 plus the degree agg; one row per graph node. */
  def g4ClusteringCoeff(spark: SparkSession, dir: String): DataFrame =
    Graph.clusteringCoefficients(LlmQueries.d6SimhashPairs(spark, dir))

  val g4Sql: String =
    s"""WITH pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM (
       |${LlmQueries.d6Sql}
       |)),
       |sym AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |deg AS MATERIALIZED (SELECT s AS doc_id, count(*) AS degree FROM sym GROUP BY 1),
       |ornt AS MATERIALIZED (SELECT e.s AS src, e.d AS dst
       |  FROM sym e JOIN deg a ON a.doc_id = e.s JOIN deg b ON b.doc_id = e.d
       |  WHERE a.degree < b.degree OR (a.degree = b.degree AND e.s < e.d)),
       |tri AS MATERIALIZED (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
       |  FROM ornt e1 JOIN ornt e2 ON e1.src = e2.src
       |  JOIN ornt e3 ON e3.src = e1.dst AND e3.dst = e2.dst
       |  WHERE e1.dst <> e2.dst),
       |cr AS MATERIALIZED (SELECT unnest([u, v, w]) AS doc_id FROM tri),
       |tc AS (SELECT doc_id, count(*) AS n_triangles FROM cr GROUP BY 1)
       |SELECT d.doc_id, d.degree,
       |  CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
       |  CASE WHEN d.degree >= 2 THEN
       |    round(2.0 * coalesce(t.n_triangles, 0) /
       |      (d.degree * (d.degree - 1)), 6)
       |  ELSE 0.0 END AS cc
       |FROM deg d LEFT JOIN tc t USING (doc_id)""".stripMargin

  /** g5: degree assortativity of the near-dup graph
    * (Graph.degreeAssortativity) — hub-and-spoke vs stratified
    * structure, from five exact integer edge-degree moments with one
    * rounded division at the edge. */
  def g5Assortativity(spark: SparkSession, dir: String): DataFrame =
    Graph.degreeAssortativity(LlmQueries.d6SimhashPairs(spark, dir))

  val g5Sql: String =
    s"""WITH pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM (
       |${LlmQueries.d6Sql}
       |)),
       |sym AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |deg AS MATERIALIZED (SELECT s, count(*) AS degree FROM sym GROUP BY 1),
       |nd AS (SELECT count(*) AS n_nodes, max(degree) AS max_degree FROM deg),
       |ed AS (SELECT count(*) AS n_edges FROM pairs),
       |e AS (SELECT a.degree AS du, b.degree AS dv
       |  FROM sym JOIN deg a ON a.s = sym.s JOIN deg b ON b.s = sym.d),
       |mo AS (SELECT CAST(count(*) AS BIGINT) AS m,
       |    CAST(sum(du) AS BIGINT) AS sx, CAST(sum(dv) AS BIGINT) AS sy,
       |    CAST(sum(du*du) AS BIGINT) AS sxx,
       |    CAST(sum(dv*dv) AS BIGINT) AS syy,
       |    CAST(sum(du*dv) AS BIGINT) AS sxy
       |  FROM e)
       |SELECT n_nodes, n_edges, max_degree,
       |  CASE WHEN m*sxx - sx*sx > 0 AND m*syy - sy*sy > 0 THEN
       |    round(CAST(m*sxy - sx*sy AS DOUBLE) /
       |      (sqrt(CAST(m*sxx - sx*sx AS DOUBLE)) *
       |       sqrt(CAST(m*syy - sy*sy AS DOUBLE))), 6)
       |  ELSE 0.0 END AS assortativity
       |FROM nd CROSS JOIN ed CROSS JOIN mo""".stripMargin

  // ---- g6: bipartite projection (co-engagement matrix) -------------

  /** g6: BIPARTITE PROJECTION — the user↔event-type graph projected
    * onto event types: for every type pair, how many users touch
    * BOTH, with the Jaccard overlap of their user sets — the
    * co-engagement/market-basket matrix (and the item-item edge
    * weighting collaborative filters start from). The projection is
    * the canonical graph op the g1–g5 family lacks: g1/g2/g4 analyze
    * a given edge set; g6 DERIVES an edge set from an incidence
    * relation.
    *
    * Exactness: all counts are exact longs from a distinct'd
    * incidence relation; Jaccard = inter/(|A|+|B|−inter) divides
    * once at the edge.
    *
    * 100 TB shape: the incidence distinct is one (user, type) keyed
    * partial-agg shuffle; the pair join is keyed by USER with
    * fan-out |types touched|² per user — bounded by the type-domain
    * size (here 5; at large type domains the standard cap is
    * per-user top-K types, the d2 bucket-cap argument); per-type
    * totals fold to a broadcast row set. */
  def g6CoEngagement(spark: SparkSession, dir: String): DataFrame = {
    val inc = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
    val perType = inc.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"))
    val pairs = inc.alias("a")
      .join(inc.alias("b"),
        col("a.user_id") === col("b.user_id") &&
        col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(perType.select(col("event_type").as("type_a"),
        col("n_users").as("n_a"))), Seq("type_a"))
      .join(broadcast(perType.select(col("event_type").as("type_b"),
        col("n_users").as("n_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_both"),
        round(col("n_both").cast("double") /
          (col("n_a") + col("n_b") - col("n_both")).cast("double"), 6)
          .as("jaccard"))
  }

  val g6Sql: String =
    """WITH inc AS (SELECT DISTINCT user_id, event_type FROM events),
      |pt AS (SELECT event_type, count(*) AS n_users FROM inc GROUP BY 1),
      |pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    count(*) AS n_both
      |  FROM inc a JOIN inc b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, pa.n_users AS n_a, pb.n_users AS n_b,
      |  n_both,
      |  round(CAST(n_both AS DOUBLE) /
      |    CAST(pa.n_users + pb.n_users - n_both AS DOUBLE), 6) AS jaccard
      |FROM pr
      |JOIN pt pa ON type_a = pa.event_type
      |JOIN pt pb ON type_b = pb.event_type""".stripMargin

  // ---- g7: bounded multi-source BFS (hop layers) -------------------

  /** g7: BFS HOP LAYERS over the d6 near-dup graph
    * (Graph.bfsLayers) — hop distance from the seed set (doc_id ≡ 0
    * mod 7) up to 4 hops, unreached nodes at -1: the "blast radius"
    * question ("everything within k contamination steps of a flagged
    * doc") that g3's fixed 2-hop count and d9's unbounded closure
    * bracket. The engine runs the real frontier expansion (each
    * round shuffles the FRONTIER, not the visited set); the oracle
    * unrolls the four layers as naive neighbor sets and takes the
    * min layer per node — same semantics, the plan you could NOT
    * afford at 100 TB. */
  def g7BfsLayers(spark: SparkSession, dir: String): DataFrame =
    Graph.bfsLayers(LlmQueries.d6SimhashPairs(spark, dir),
      seedMod = 7L, maxHops = 4)

  val g7Sql: String = {
    val layers = (1 to 4).map { i =>
      s"""f$i AS MATERIALIZED (SELECT DISTINCT e.d AS node
         |  FROM sym e JOIN f${i - 1} f ON f.node = e.s)""".stripMargin
    }.mkString(",\n")
    val unions = (0 to 4).map(i =>
      s"SELECT node, $i AS h FROM f$i").mkString("\n  UNION ALL ")
    s"""WITH pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM (
       |${LlmQueries.d6Sql}
       |)),
       |sym AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |nodes AS MATERIALIZED (SELECT DISTINCT s AS node FROM sym),
       |f0 AS MATERIALIZED (SELECT node FROM nodes WHERE node % 7 = 0),
       |$layers,
       |lay AS ($unions),
       |md AS (SELECT node, CAST(min(h) AS BIGINT) AS hops
       |  FROM lay GROUP BY 1)
       |SELECT n.node AS doc_id, coalesce(md.hops, -1) AS hops
       |FROM nodes n LEFT JOIN md ON md.node = n.node""".stripMargin
  }

  // ---- g8: bounded k-core peeling ----------------------------------

  /** g8: 2-CORE PEELING over the d6 near-dup graph at a 4-round
    * horizon (Graph.kCorePeel) — the cycle-evidence filter: a
    * surviving node's near-dup links are mutually corroborating
    * (every neighbor also has ≥2 links), while chains and pendants
    * peel round by round. The engine runs the real iterative peel
    * with early convergence stop; the oracle unrolls the same four
    * rounds (post-convergence rounds are no-ops, so any horizon
    * agrees). */
  def g8KCore(spark: SparkSession, dir: String): DataFrame =
    Graph.kCorePeel(LlmQueries.d6SimhashPairs(spark, dir),
      k = 2L, rounds = 4)

  val g8Sql: String = {
    val rounds = (1 to 4).map { i =>
      s"""d$i AS MATERIALIZED (SELECT a.node, count(e.s) AS deg
         |  FROM a${i - 1} a LEFT JOIN e${i - 1} e ON e.s = a.node
         |  GROUP BY 1),
         |p$i AS MATERIALIZED (SELECT node FROM d$i WHERE deg < 2),
         |a$i AS MATERIALIZED (SELECT node FROM d$i WHERE deg >= 2),
         |e$i AS MATERIALIZED (SELECT e.s, e.d FROM e${i - 1} e
         |  JOIN a$i x ON x.node = e.s JOIN a$i y ON y.node = e.d)""".stripMargin
    }.mkString(",\n")
    val peeledUnion = (1 to 4).map(i =>
      s"SELECT node, $i AS r FROM p$i").mkString("\n  UNION ALL ")
    s"""WITH pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM (
       |${LlmQueries.d6Sql}
       |)),
       |sym AS MATERIALIZED (SELECT DISTINCT s, d FROM (
       |  SELECT doc_a AS s, doc_b AS d FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs)),
       |a0 AS MATERIALIZED (SELECT DISTINCT s AS node FROM sym),
       |e0 AS MATERIALIZED (SELECT s, d FROM sym),
       |$rounds,
       |peeled AS ($peeledUnion),
       |df AS (SELECT a.node, count(e.s) AS deg
       |  FROM a4 a LEFT JOIN e4 e ON e.s = a.node GROUP BY 1)
       |SELECT node AS doc_id, CAST(-1 AS BIGINT) AS peel_round,
       |  CAST(deg AS BIGINT) AS core_degree FROM df
       |UNION ALL
       |SELECT node, CAST(r AS BIGINT), CAST(-1 AS BIGINT) FROM peeled""".stripMargin
  }

  // ---- g9: personalized PageRank (seed-proximity ranking) ----------

  /** g9: PERSONALIZED PageRank over the d6 near-dup graph, 4
    * integer-exact rounds with teleport mass restricted to the seed
    * set (doc_id ≡ 0 mod 7 — the same flagged set g7's BFS measures
    * hop distance from) — "how strongly does each document associate
    * with the flagged set by graph affinity", the smooth counterpart
    * of g7's discrete layers: a doc two hops away through many
    * parallel paths outranks one two hops away through a single
    * accidental edge. Oracle: d6 pairs as a CTE + the 4 rounds
    * unrolled, each round re-injecting teleport at the seeds via a
    * LEFT JOIN of the node list against the round's contributions
    * (g1's pattern, extended because unreached nodes carry exact 0
    * and must persist through rounds). */
  def g9PersonalizedPagerank(spark: SparkSession, dir: String): DataFrame =
    Graph.personalizedPageRank(LlmQueries.d6SimhashPairs(spark, dir),
      seedMod = 7L, iters = 4)

  val g9Sql: String = {
    val rounds = (1 to 4).map { i =>
      s"""c$i AS MATERIALIZED (SELECT e.d AS node, sum(r.pr // g.deg) AS s
         |  FROM sym e JOIN r${i - 1} r ON r.node = e.s
         |    JOIN deg g ON g.s = e.s
         |  GROUP BY 1),
         |r$i AS MATERIALIZED (SELECT n.node,
         |    CAST((15 * 1000000 * n.is_seed + 85 * coalesce(c.s, 0)) // 100
         |      AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN c$i c ON c.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM (
       |${LlmQueries.d6Sql}
       |)),
       |sym AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |deg AS MATERIALIZED (SELECT s, count(*) AS deg FROM sym GROUP BY 1),
       |nodes AS MATERIALIZED (SELECT DISTINCT s AS node,
       |    CASE WHEN s % 7 = 0 THEN 1 ELSE 0 END AS is_seed FROM sym),
       |r0 AS MATERIALIZED (SELECT node, CAST(is_seed * 1000000 AS BIGINT) AS pr
       |  FROM nodes),
       |$rounds
       |SELECT node AS doc_id, pr AS ppr_micro FROM r4""".stripMargin
  }

  // ---- g10: component-size profile (dedup blast-radius audit) ------

  /** g10: COMPONENT-SIZE PROFILE of the d9 dedup clusters — the
    * size histogram (how many families of each size) with each
    * size's integer-micro share of the clustered corpus: the
    * blast-radius audit a curation run reads BEFORE collapsing
    * clusters to survivors (a healthy near-dup graph is dominated by
    * small families; a giant component is the over-merge alarm the
    * d9/g4 docs warn about, and its share is THE number that says
    * how much corpus one bad template chain would delete). Pure
    * integer arithmetic: sizes and counts are exact longs, the
    * share divides once per row in micro-units.
    *
    * 100 TB shape: two partial-agg groupBys over d9's (node,
    * cluster) output (cluster → size, size → count; each strictly
    * shrinking) + a one-row broadcast total. The oracle nests d9's
    * recursive-CTE closure as a derived table — at scale exactly
    * the plan you could not run, while the engine's min-label
    * rounds + two aggs remain bounded. */
  def g10ComponentProfile(spark: SparkSession, dir: String): DataFrame = {
    val sizes = LlmQueries.d9DedupClusters(spark, dir)
      .groupBy(col("cluster")).agg(count(lit(1)).as("sz"))
    val hist = sizes.groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
    val total = hist.agg(sum(col("n_docs")).as("total"))
    hist.crossJoin(broadcast(total))
      .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
        expr("n_docs * 1000000 div total").as("share_micro"))
  }

  val g10Sql: String =
    s"""WITH cl AS (SELECT doc_id, cluster FROM (
       |${LlmQueries.d9Sql}
       |)),
       |sz AS (SELECT cluster, count(*) AS sz FROM cl GROUP BY 1),
       |h AS (SELECT sz AS cluster_size, count(*) AS n_clusters
       |  FROM sz GROUP BY 1),
       |t AS (SELECT sum(cluster_size * n_clusters) AS total FROM h)
       |SELECT cluster_size, n_clusters,
       |  CAST(cluster_size * n_clusters AS BIGINT) AS n_docs,
       |  CAST((cluster_size * n_clusters) * 1000000 // total AS BIGINT)
       |    AS share_micro
       |FROM h CROSS JOIN t""".stripMargin

  // ---- g11: partition modularity of the near-dup families ----------

  /** g11: PARTITION MODULARITY over the d6 graph (Graph.modularity)
    * — the one-number clustering-quality score for the component
    * partition: Q near 1 = balanced families (parallel collapse is
    * safe), Q near 0 = a giant component owns the duplicate mass
    * (g10's alarm as the standard community metric). Exact integer
    * micro-unit arithmetic; oracle nests the recursive closure over
    * the d6 edges and restates the same floor divisions. */
  def g11Modularity(spark: SparkSession, dir: String): DataFrame =
    Graph.modularity(LlmQueries.d6SimhashPairs(spark, dir)
      .select(col("doc_a"), col("doc_b")))

  val g11Sql: String =
    s"""WITH RECURSIVE pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM (
       |${LlmQueries.d6Sql}
       |)),
       |sym AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach(node, lab) AS (
       |  SELECT DISTINCT s AS node, s AS lab FROM sym
       |  UNION
       |  SELECT s.s AS node, r.lab FROM sym s JOIN reach r ON r.node = s.d
       |),
       |cl AS (SELECT node, min(lab) AS cluster FROM reach GROUP BY 1),
       |ec AS (SELECT c.cluster, count(*) AS e_c
       |  FROM pairs p JOIN cl c ON p.doc_a = c.node GROUP BY 1),
       |mm AS (SELECT CAST(sum(e_c) AS BIGINT) AS m FROM ec),
       |qc AS (SELECT e_c, m,
       |    e_c * 1000000 // m - (e_c * e_c * 1000000) // (m * m) AS q_micro
       |  FROM ec CROSS JOIN mm)
       |SELECT count(*) AS n_clusters, CAST(max(m) AS BIGINT) AS m_edges,
       |  CAST(sum(q_micro) AS BIGINT) AS q_micro,
       |  CAST(max(e_c) AS BIGINT) AS max_cluster_edges
       |FROM qc""".stripMargin

  /** g12: COMMUNITIES via deterministic label propagation
    * (Graph.labelPropagation, 3 synchronous rounds, most-frequent
    * neighbor label with smallest-label tie-break) over the d6
    * near-dup graph — the finer-than-components banding: d9/d16
    * merge everything REACHABLE, LPA stops where a denser
    * neighborhood outvotes the bridge, separating two duplicate
    * cliques that share one accidental pair. The oracle unrolls the
    * three rounds (count CTE + row_number argmax per round), so the
    * mode-adoption update is hash-certified engine-for-engine. */
  /** g13: WEIGHTED proximity to the flagged seed set
    * (Graph.weightedPaths, 4 Bellman-Ford rounds, weight =
    * hamming + 1) — g7 counts hops, g13 weighs them by evidence
    * strength: a path through exact-duplicate (hamming-0) pairs is
    * shorter than one through borderline hamming-3 pairs, so the
    * distance ranks expansion candidates the way a curation triage
    * actually trusts them. The oracle unrolls the four relaxation
    * rounds (union + min per round), putting Bellman-Ford under the
    * hash gate alongside g1's PageRank and g7's BFS. */
  def g13WeightedPaths(spark: SparkSession, dir: String): DataFrame =
    Graph.weightedPaths(LlmQueries.d6SimhashPairs(spark, dir),
      seedMod = 7L, rounds = 4)

  val g13Sql: String = {
    val rounds = (1 to 4).map { i =>
      s"""r$i AS MATERIALIZED (SELECT node, CAST(min(wd) AS BIGINT) AS wd FROM (
         |  SELECT node, wd FROM r${i - 1}
         |  UNION ALL
         |  SELECT e.dst AS node, r.wd + e.w AS wd
         |  FROM syme e JOIN r${i - 1} r ON r.node = e.src
         |) GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (SELECT doc_a, doc_b, hamming FROM (
       |${LlmQueries.d6Sql}
       |)),
       |syme AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst,
       |    CAST(hamming + 1 AS BIGINT) AS w FROM pairs
       |  UNION ALL SELECT doc_b, doc_a, hamming + 1 FROM pairs),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM syme),
       |r0 AS MATERIALIZED (SELECT node, CAST(0 AS BIGINT) AS wd FROM nodes
       |  WHERE node % 7 = 0),
       |$rounds
       |SELECT n.node AS doc_id, coalesce(r4.wd, -1) AS wdist
       |FROM nodes n LEFT JOIN r4 ON r4.node = n.node""".stripMargin
  }

  def g12LabelProp(spark: SparkSession, dir: String): DataFrame =
    Graph.labelPropagation(LlmQueries.d6SimhashPairs(spark, dir), rounds = 3)

  val g12Sql: String = {
    val rounds = (1 to 3).map { i =>
      s"""c$i AS MATERIALIZED (SELECT e.s AS node, r.lab, count(*) AS c
         |  FROM sym e JOIN r${i - 1} r ON r.node = e.d
         |  GROUP BY 1, 2),
         |r$i AS MATERIALIZED (SELECT node, lab FROM (SELECT node, lab,
         |    row_number() OVER (PARTITION BY node
         |      ORDER BY c DESC, lab) AS rn FROM c$i)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM (
       |${LlmQueries.d6Sql}
       |)),
       |sym AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |r0 AS MATERIALIZED (SELECT DISTINCT s AS node, s AS lab FROM sym),
       |$rounds
       |SELECT node AS doc_id, lab AS community FROM r3""".stripMargin
  }

  /** g14: 4-TRUSS peeling of the d6 near-dup graph, 3 fixed rounds —
    * the edge-level cohesion cut: an edge survives iff it keeps ≥ 2
    * triangles among survivors, so accidental bridges between dense
    * duplicate families peel even when g8's k-core keeps both
    * endpoints. The dedup reading: surviving edges are the pairs a
    * conservative collapse can trust (triangle-corroborated), peeled
    * rounds rank how quickly a pair loses corroboration. Oracle:
    * the same wedge-count + peel unrolled per round (aggregates
    * cannot sit in a recursive term; materialized CTEs keep it
    * linear). */
  def g14KTruss(spark: SparkSession, dir: String): DataFrame =
    Graph.kTruss(LlmQueries.d6SimhashPairs(spark, dir), k = 4L, rounds = 3)

  val g14Sql: String = {
    val rounds = (1 to 3).map { i =>
      s"""sym$i AS MATERIALIZED (SELECT a AS s, b AS d FROM e${i - 1}
         |  UNION ALL SELECT b, a FROM e${i - 1}),
         |sup$i AS MATERIALIZED (SELECT e.a, e.b, count(*) AS sup
         |  FROM e${i - 1} e JOIN sym$i n1 ON n1.s = e.a
         |    JOIN sym$i n2 ON n2.s = e.b AND n2.d = n1.d
         |  GROUP BY 1, 2),
         |sc$i AS MATERIALIZED (SELECT e.a, e.b,
         |    coalesce(s.sup, 0) AS sup
         |  FROM e${i - 1} e LEFT JOIN sup$i s
         |    ON s.a = e.a AND s.b = e.b),
         |p$i AS MATERIALIZED (SELECT a, b FROM sc$i WHERE sup < 2),
         |e$i AS MATERIALIZED (SELECT a, b FROM sc$i WHERE sup >= 2)""".stripMargin
    }.mkString(",\n")
    val peeledUnion = (1 to 3).map(i =>
      s"SELECT a, b, $i AS r FROM p$i").mkString("\n  UNION ALL ")
    s"""WITH pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM (
       |${LlmQueries.d6Sql}
       |)),
       |e0 AS MATERIALIZED (SELECT least(doc_a, doc_b) AS a,
       |    greatest(doc_a, doc_b) AS b
       |  FROM pairs GROUP BY 1, 2),
       |$rounds,
       |symf AS MATERIALIZED (SELECT a AS s, b AS d FROM e3
       |  UNION ALL SELECT b, a FROM e3),
       |supf AS MATERIALIZED (SELECT e.a, e.b, count(*) AS sup
       |  FROM e3 e JOIN symf n1 ON n1.s = e.a
       |    JOIN symf n2 ON n2.s = e.b AND n2.d = n1.d
       |  GROUP BY 1, 2),
       |peeled AS ($peeledUnion)
       |SELECT e.a AS doc_a, e.b AS doc_b, CAST(-1 AS BIGINT) AS peel_round,
       |  CAST(coalesce(s.sup, 0) AS BIGINT) AS truss_support
       |FROM e3 e LEFT JOIN supf s ON s.a = e.a AND s.b = e.b
       |UNION ALL
       |SELECT a, b, CAST(r AS BIGINT), CAST(-1 AS BIGINT) FROM peeled""".stripMargin
  }

  /** g15: LINK PREDICTION on the d6 near-dup graph — every
    * non-adjacent pair with ≥ 2 common neighbors, scored by
    * common-neighbor count and the integer Resource Allocation index
    * Σ_z (1e6 div deg(z)). The curation reading: pairs two
    * independent near-dup neighborhoods both vouch for are the
    * candidates a cheaper LSH pass missed — the recall-audit query
    * for d2/d6's banding, derived from the band output itself. */
  def g15LinkPrediction(spark: SparkSession, dir: String): DataFrame =
    Graph.linkPrediction(LlmQueries.d6SimhashPairs(spark, dir), minCn = 2L)

  val g15Sql: String =
    s"""WITH pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM (
       |${LlmQueries.d6Sql}
       |)),
       |ed AS MATERIALIZED (SELECT least(doc_a, doc_b) AS a,
       |    greatest(doc_a, doc_b) AS b
       |  FROM pairs GROUP BY 1, 2),
       |sym AS MATERIALIZED (SELECT a AS s, b AS d FROM ed
       |  UNION ALL SELECT b, a FROM ed),
       |deg AS MATERIALIZED (SELECT s, count(*) AS deg FROM sym GROUP BY 1),
       |wd AS (SELECT n1.s AS z, n1.d AS x, n2.d AS y
       |  FROM sym n1 JOIN sym n2 ON n1.s = n2.s AND n1.d < n2.d),
       |cand AS (SELECT w.x, w.y, g.deg
       |  FROM wd w LEFT JOIN ed e ON e.a = w.x AND e.b = w.y
       |  JOIN deg g ON g.s = w.z
       |  WHERE e.a IS NULL)
       |SELECT x AS doc_a, y AS doc_b, count(*) AS cn,
       |  CAST(sum(1000000 // deg) AS BIGINT) AS ra_ppm
       |FROM cand GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin

  /** g16: CO-PURCHASE graph built from the FACT table — every part
    * pair ordered together in ≥ 2 orders, scored by co-order count
    * and integer lift (how much more often than independence). The
    * one g-query whose graph comes from the big table, not the
    * near-dup doc graph: the edge BUILD is the scale exercise.
    *
    * 100 TB shape: lineitem collapses to distinct (order, part) in
    * one partial-agg pass; the pair self-join is keyed by ORDER, so
    * fan-out per order is bounded by basket size squared (a few
    * dozen — bounded by construction, the v12 frame-key argument, no
    * cap needed); per-part totals and the scalar order count
    * broadcast onto the pair aggregate. Lift is one floor division
    * over exact longs at the edge. */
  def g16CoPurchase(spark: SparkSession, dir: String): DataFrame =
    coPurchase(Tables.lineitem(spark, dir))

  /** DataFrame-taking core of g16 (li: l_orderkey, l_partkey) — the
    * unit spec asserts on THIS. */
  def coPurchase(li: DataFrame): DataFrame = {
    val op = li
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val perPart = op.groupBy(col("p")).agg(count(lit(1)).as("n_orders"))
    val nTot = op.select(countDistinct(col("o")).as("t"))
    val pairs = op.alias("a")
      .join(op.alias("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("part_a"), col("b.p").as("part_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= 2)
    pairs
      .join(broadcast(perPart.select(col("p").as("part_a"),
        col("n_orders").as("n_a"))), Seq("part_a"))
      .join(broadcast(perPart.select(col("p").as("part_b"),
        col("n_orders").as("n_b"))), Seq("part_b"))
      .crossJoin(broadcast(nTot))
      .select(col("part_a"), col("part_b"), col("n_both"), col("n_a"),
        col("n_b"),
        // n_both·1e6·t can pass Long.MaxValue at large order counts;
        // widen to decimal(38,0) BEFORE multiplying and use integral
        // `div` (exact; all operands positive so truncation = floor)
        // instead of double `/` + floor, which loses low bits at 2^53.
        expr("cast((cast(n_both as decimal(38,0)) * t * 1000000) div " +
          "(cast(n_a as decimal(38,0)) * n_b) as bigint)").as("lift_ppm"))
  }

  /** g17: RICH-CLUB coefficient curve of the d6 near-dup graph — at
    * each degree threshold k, how densely the over-k-degree nodes
    * (the template hubs) interlink (Graph.richClub): φ(k) rising
    * with k means the heaviest duplicators duplicate EACH OTHER (one
    * boilerplate ecosystem — collapse them together); flat-or-falling
    * means independent families (d9's per-component survivors are
    * safe). The thresholds sweep k = 1..4, bracketing the graph's
    * degree mass. */
  def g17RichClub(spark: SparkSession, dir: String): DataFrame =
    Graph.richClub(LlmQueries.d6SimhashPairs(spark, dir), ks = Seq(1, 2, 3, 4))

  val g17Sql: String =
    s"""WITH pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM (
       |${LlmQueries.d6Sql}
       |)),
       |sym AS MATERIALIZED (SELECT doc_a AS s FROM pairs
       |  UNION ALL SELECT doc_b FROM pairs),
       |deg AS MATERIALIZED (SELECT s, count(*) AS deg FROM sym GROUP BY 1),
       |ks AS (SELECT CAST(unnest([1, 2, 3, 4]) AS BIGINT) AS k),
       |ed AS (SELECT p.doc_a, p.doc_b, a.deg AS da, b.deg AS db
       |  FROM pairs p JOIN deg a ON a.s = p.doc_a
       |  JOIN deg b ON b.s = p.doc_b),
       |ek AS (SELECT k, count(*) AS n_edges FROM ks JOIN ed
       |  ON da > k AND db > k GROUP BY 1),
       |nk AS (SELECT k, count(*) AS n_nodes FROM ks JOIN deg
       |  ON deg > k GROUP BY 1)
       |SELECT nk.k, nk.n_nodes,
       |  CAST(coalesce(ek.n_edges, 0) AS BIGINT) AS n_edges,
       |  CASE WHEN nk.n_nodes >= 2 THEN
       |    CAST(CAST(coalesce(ek.n_edges, 0) AS HUGEINT) * 2 * 1000000 //
       |      (CAST(nk.n_nodes AS HUGEINT) * (nk.n_nodes - 1)) AS BIGINT)
       |  ELSE 0 END AS phi_ppm
       |FROM nk LEFT JOIN ek ON nk.k = ek.k""".stripMargin

  val g16Sql: String =
    """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o,
      |    l_partkey AS p FROM lineitem),
      |pp AS (SELECT p, count(*) AS n_orders FROM op GROUP BY 1),
      |nt AS (SELECT count(DISTINCT o) AS t FROM op),
      |pr AS (SELECT a.p AS part_a, b.p AS part_b, count(*) AS n_both
      |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      |  GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT part_a, part_b, n_both, pa.n_orders AS n_a,
      |  pb.n_orders AS n_b,
      |  CAST(CAST(n_both AS HUGEINT) * nt.t * 1000000 //
      |    (CAST(pa.n_orders AS HUGEINT) * pb.n_orders) AS BIGINT)
      |    AS lift_ppm
      |FROM pr
      |JOIN pp pa ON part_a = pa.p
      |JOIN pp pb ON part_b = pb.p
      |CROSS JOIN nt""".stripMargin
}
