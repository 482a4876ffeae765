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
