package graft

import org.apache.spark.sql.functions._
import graft.operators.{KMeans, Similarity}
import graft.sources.Tables

/** The trained IVF coarse quantizer: DataFrame-native spherical
  * k-means (Lloyd's) feeding the existing knnIvf API. The s3 oracle
  * keeps its deterministic stand-in centroids (restating k-means in
  * SQL buys nothing); these specs pin training behavior.
  */
class KMeansSpec extends SparkTestBase {

  private def emb = Tables.embeddings(spark, sf)

  test("kmeans: cost is non-increasing over Lloyd's iterations") {
    val seed = KMeans.train(emb, k = 4, iters = 0)
    val c1 = KMeans.train(emb, k = 4, iters = 1)
    val c3 = KMeans.train(emb, k = 4, iters = 3)
    val (cost0, cost1, cost3) =
      (KMeans.cost(emb, seed), KMeans.cost(emb, c1), KMeans.cost(emb, c3))
    // spherical k-means: mean update monotonically improves the
    // mean cosine-distance objective
    assert(cost1 <= cost0 + 1e-12, s"iter1 $cost1 > seed $cost0")
    assert(cost3 <= cost1 + 1e-12, s"iter3 $cost3 > iter1 $cost1")
  }

  test("kmeans: deterministic — two trains agree exactly") {
    val a = KMeans.train(emb, k = 3, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = KMeans.train(emb, k = 3, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a.keySet === Set(0L, 1L, 2L))
    assert(a === b)
    // assignments are deterministic too
    val asg1 = Similarity.assignCells(emb,
        KMeans.train(emb, k = 3, iters = 2))
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val asg2 = Similarity.assignCells(emb,
        KMeans.train(emb, k = 3, iters = 2))
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asg1 === asg2)
    // every vector lands in a trained cell
    assert(asg1.values.toSet.subsetOf(Set(0L, 1L, 2L)))
  }

  test("assignCells: zero-norm vector lands in the lowest cell, like the oracle") {
    import testImplicits._
    val cents = Seq(
      (3L, Array(1f, 0f, 0f)), (7L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val vecs = Seq(
      (100L, Array(0f, 0f, 0f)),   // zero norm: every cosine NULL
      (101L, Array(0f, 2f, 0f)))
      .toDF("vec_id", "embedding")
    val cells = Similarity.assignCells(vecs, cents)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the row_number restatement (cos DESC NULLS LAST, cid ASC)
    // assigns an all-NULL vector to the lowest centroid id
    assert(cells(100L) === 3L)
    assert(cells(101L) === 7L)
  }

  test("s9: trained quantizer beats the stand-in on cost, holds recall") {
    // What training buys, in the metric k-means optimizes: the
    // trained centroids quantize the corpus strictly better than the
    // vec_id<8 stand-in (which IS train's seed, renumbered — so this
    // is also the monotone-cost property measured end to end).
    // Measured: ~9% cost improvement at sf0.001 AND sf0.01.
    // Raw recall@k is NOT asserted superior on purpose: the synthetic
    // embeddings are isotropic (no cluster structure), so both
    // quantizers produce balanced cells and shifting boundaries moves
    // recall by ± one neighbor — we assert parity within a band at
    // the same (k, nprobe) search budget and a no-wider candidate set.
    val standInCents = emb.filter(col("vec_id") < 8)
    val trainedCents = KMeans.train(emb, k = 8, iters = 3)
    val costStandIn = KMeans.cost(emb, standInCents)
    val costTrained = KMeans.cost(emb, trainedCents)
    assert(costTrained < costStandIn - 0.01,
      s"trained cost $costTrained not below stand-in $costStandIn")

    val queries = emb.filter(col("vec_id") < 5)
    val truth = Similarity.knnBruteForce(emb, queries, k = 3)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(cents: org.apache.spark.sql.DataFrame): Double = {
      val got = Similarity.knnIvfProbe(emb, queries, cents, k = 3, nprobe = 2)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    def candidates(cents: org.apache.spark.sql.DataFrame): Long =
      Similarity.assignCells(emb, cents).alias("c")
        .join(Similarity.assignCellsMulti(queries, cents, 2).alias("q"),
          col("q.cell") === col("c.cell") &&
          col("q.vec_id") =!= col("c.vec_id")).count()
    val (rStandIn, rTrained) = (recall(standInCents), recall(trainedCents))
    assert(rTrained >= rStandIn - 0.15,
      s"trained recall $rTrained far below stand-in $rStandIn")
    assert(rTrained >= 0.5)
    val (cStandIn, cTrained) = (candidates(standInCents), candidates(trainedCents))
    assert(cTrained <= (cStandIn * 1.1).toLong,
      s"trained scans $cTrained candidates vs stand-in $cStandIn")
  }

  test("kmeans centroids drive knnIvf end to end") {
    val centroids = KMeans.train(emb, k = 4, iters = 2)
    val queries = emb.filter(col("vec_id") < 3)
    val out = Similarity.knnIvf(emb, queries, centroids, k = 5)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // per query: at most k neighbors, ranked 1..n, never itself
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getInt(2)).sorted.toSeq === (1 to rs.length))
      assert(!rs.exists(_.getLong(1) == qid))
    }
  }
}
