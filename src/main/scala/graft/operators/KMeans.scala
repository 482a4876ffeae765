package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataFrame-native spherical k-means — the trained coarse quantizer
  * for the IVF index (Similarity.knnIvf). Lloyd's iterations with
  * cosine affinity: because cosine ignores vector scale, the
  * arithmetic-mean update IS the spherical-k-means centroid update
  * (the mean's direction maximizes the within-cell cosine sum), so
  * the objective improves monotonically until assignments fix.
  *
  * 100 TB shape per iteration:
  *  - assignment = Similarity.assignCells — a NARROW projection
  *    against one broadcast row of centroids (no corpus shuffle);
  *  - update = posexplode to (cell, dim, value) and ONE partial-
  *    aggregated shuffle of k×dim running sums (map-side combine
  *    reduces every partition to ≤ k×dim rows before the exchange);
  *  - centroids materialize per iteration (k tiny rows cached) so
  *    the lineage stays linear, mirroring how production k-means
  *    broadcasts centroids each round.
  *
  * Determinism: seeding is data-deterministic (the k lowest vec_ids,
  * matching the s3 oracle's stand-in convention), iteration count is
  * fixed, and every aggregate is an exact sum/count — two runs over
  * the same corpus produce identical centroids and assignments.
  */
object KMeans {

  /** Train `k` centroids with `iters` Lloyd's iterations; returns
    * (vec_id = cell id 0..k-1, embedding ARRAY<FLOAT>) — the exact
    * input shape `knnIvf(centroids = ...)` expects.
    *
    * The returned DataFrame is CACHED (intermediate rounds are
    * unpersisted as the loop advances, but the final centroids stay
    * pinned so the caller's searches reuse them without recompute);
    * a caller running many trains in one session should
    * `.unpersist()` results it is done with. */
  def train(vecs: DataFrame, k: Int, iters: Int = 5): DataFrame = {
    val corpus = vecs.select(col("vec_id"), col("embedding"))
    // deterministic seed: the k lowest vec_ids, renumbered 0..k-1 so
    // cell ids are stable no matter which vectors seeded them
    var centroids = corpus.orderBy(col("vec_id")).limit(k)
      .select((row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))) - 1)
          .cast("long").as("vec_id"),
        col("embedding"))
      .cache()
    centroids.count() // materialize the seed
    var it = 0
    while (it < iters) {
      val assigned = Similarity.assignCells(corpus, centroids)
      val means = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("cell"), col("dim"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(
          sort_array(collect_list(struct(col("dim"), col("m")))),
          s => s.getField("m").cast("float")).as("memb"))
        .select(col("cell").as("vec_id"), col("memb"))
      // a cell that captured no vectors this round keeps its previous
      // centroid (classic empty-cluster guard) so k never shrinks
      val next = centroids.join(means, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("memb"), col("embedding")).as("embedding"))
        .cache()
      next.count() // materialize before dropping the previous round
      centroids.unpersist()
      centroids = next
      it += 1
    }
    centroids
  }

  /** Clustering cost: mean cosine DISTANCE (1 - cos) of each vector
    * to its assigned centroid — the spherical-k-means objective,
    * non-increasing over `train`'s iterations. One narrow assignment
    * pass + a scalar aggregate. */
  def cost(vecs: DataFrame, centroids: DataFrame): Double = {
    import graft.functions.TextFunctions.cosineSim
    val assigned = Similarity.assignCells(vecs, centroids).alias("a")
      .join(broadcast(centroids.select(col("vec_id").as("cell"),
        col("embedding").as("cemb"))), "cell")
      .select((lit(1.0) - cosineSim(col("a.embedding"), col("cemb")))
        .as("dist"))
    assigned.agg(avg(col("dist"))).head().getDouble(0)
  }
}
