package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * fixed, and the mean update is carried on the INTEGER MICRO-UNIT
  * lattice — each component is quantized to round(x·1e6) before the
  * per-cell sum, the sum is an exact long (summation-ORDER-free,
  * unlike a float avg), and the centroid component is the truncating
  * integer division by the cell count mapped back to float as
  * (cu/1e6). Two runs — and two ENGINES — therefore produce
  * bit-identical centroids and assignments: the trained artifacts
  * are cross-engine hashable, which is what lets s9/s15 restate the
  * full train-then-search lifecycle under the DuckDB oracle. The
  * sub-micro precision given up is ~1e-6 per component, orders of
  * magnitude below the quantizer's own distortion.
  */
object KMeans {

  /** Dimensionality guard for the fixed-width trainers: the
    * no-explode mean reads `element_at(embedding, d+1)` for
    * d < `dim`, and element_at past the array end is NULL — a
    * mismatched corpus would silently train truncated/null centroid
    * components instead of failing. The check rides INSIDE the
    * embedding column (a separate assert column would be pruned as
    * unused), so any row with the wrong width fails the job loudly
    * on first scan; per-row cost is one size() compare in codegen. */
  private def checkedDim(vecs: DataFrame, dim: Int, who: String): DataFrame =
    vecs.select(col("vec_id"),
      when(size(col("embedding")) === dim, col("embedding"))
        .otherwise(raise_error(concat(
          lit(s"$who: expected $dim-dim embedding, got "),
          size(col("embedding")).cast("string"),
          lit(" (vec_id "), col("vec_id").cast("string"), lit(")"))))
        .as("embedding"))

  /** Train `k` centroids with `iters` Lloyd's iterations; returns
    * (vec_id = cell id 0..k-1, embedding ARRAY<FLOAT>) — the exact
    * input shape `knnIvf(centroids = ...)` expects.
    *
    * The returned DataFrame is CACHED (intermediate rounds are
    * unpersisted as the loop advances, but the final centroids stay
    * pinned so the caller's searches reuse them without recompute);
    * a caller running many trains in one session should
    * `.unpersist()` results it is done with. */
  def train(vecs: DataFrame, k: Int, iters: Int = 5,
      dim: Int = 64): DataFrame = {
    val corpus = checkedDim(vecs, dim, "KMeans.train")
    // deterministic seed: the k lowest vec_ids, renumbered 0..k-1 so
    // cell ids are stable no matter which vectors seeded them
    var centroids = corpus.orderBy(col("vec_id")).limit(k)
      .select((row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))) - 1)
          .cast("long").as("vec_id"),
        col("embedding"))
      .cache()
    centroids.count() // materialize the seed
    // one Lloyd's step as a LAZY plan over the previous centroids:
    // assignment (narrow broadcast-fold), the no-explode micro-unit
    // mean (dim agg columns — the partial agg reduces every
    // partition to ≤ k rows of dim sums before the exchange; order-
    // free exact: quantize, sum longs, truncating div, Spark `div`
    // ≡ DuckDB `//`), and the empty-cluster keep-previous guard so
    // k never shrinks
    def step(prev: DataFrame): DataFrame = {
      val assigned = Similarity.assignCells(corpus, prev)
      val sums = (0 until dim).map(d =>
        sum(floor(element_at(col("embedding"), d + 1).cast("double")
          * 1000000.0 + 0.5).cast("long")).as(s"su$d"))
      val means = assigned
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"), sums: _*)
        .select(col("cell").as("vec_id"),
          array((0 until dim).map(d =>
            (expr(s"su$d div n").cast("double") / 1000000.0)
              .cast("float")): _*).as("memb"))
      prev.join(means, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("memb"), col("embedding")).as("embedding"))
    }
    // TWO Lloyd's steps per materialization: step i+1's broadcast
    // centroid row is a SUBPLAN of the same job (the k-row mean agg
    // feeds the next assignment's broadcast exchange), halving the
    // sequential job barriers the trainer pays — the corpus is
    // scanned once per step either way
    var it = 0
    while (it < iters) {
      val steps = math.min(2, iters - it)
      val next = (1 to steps).foldLeft(centroids)((c, _) => step(c))
        .cache()
      next.count() // materialize before dropping the previous round
      centroids.unpersist()
      centroids = next
      it += steps
    }
    centroids
  }

  /** Per-subspace L2 Lloyd's for the PRODUCT-quantizer codebook: the
    * 64-dim space splits into `m` 8-dim subspaces and each trains its
    * own `k` codewords independently (true PQ — unlike the shared
    * stand-in, subspace j's codeword set adapts to subspace j's
    * distribution). Assignment metric is SQUARED L2, the metric
    * PqCodes/PqAdc rank by, so the trained codebook minimizes exactly
    * the distortion the ADC scan pays. Seeds are the `vec_id < k`
    * stand-in slices — the s7 codebook — so Lloyd's monotone descent
    * guarantees the trained codebook's self-distortion is NEVER worse
    * than the stand-in's (the property the spec pins). All `m`
    * subspaces train in ONE DataFrame pipeline per iteration: the
    * corpus explodes once to (subspace, subvector) rows, assignment
    * is the usual narrow broadcast-fold argmin (over that subspace's
    * codewords only), and the mean update is one partial-agg shuffle
    * of ≤ m×k×sub rows. Returns (vec_id = j, embedding) full-width
    * codewords reassembled from the subspace codewords — the exact
    * shape knnPqAdc/pqFlatCodebook expect. Deterministic end to end. */
  def trainPqCodebook(vecs: DataFrame, m: Int, k: Int, iters: Int,
      dim: Int = 64): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m
    val checked = checkedDim(vecs, dim, "KMeans.trainPqCodebook")
    def subSlices(df: DataFrame) = df
      .select(col("vec_id"), explode(sequence(lit(0), lit(m - 1))).as("ms"),
        col("embedding"))
      .select(col("ms"), col("vec_id"),
        slice(col("embedding"), col("ms") * sub + 1, lit(sub)).as("sv"))
    val corpus = subSlices(checked)
    // squared-L2 between two sub-width float arrays, double fold in
    // ascending dim order (the PqAdc kernel's exact arithmetic)
    def l2(a: Column, b: Column): Column =
      aggregate(sequence(lit(1), lit(sub)), lit(0.0), (acc, d) => {
        val diff = element_at(a, d).cast("double") -
          element_at(b, d).cast("double")
        acc + diff * diff
      })
    var codebook = subSlices(checked.orderBy(col("vec_id")).limit(k))
      .select(col("ms"),
        (row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("ms")).orderBy(col("vec_id"))) - 1).as("j"),
        col("sv").as("csv"))
      .cache()
    codebook.count()
    // one per-subspace Lloyd's step as a LAZY plan over the previous
    // codebook: broadcast-fold argmin assignment, then the same
    // micro-unit mean as `train` in the same no-explode shape — one
    // partial agg with `sub` sum columns instead of a posexplode to
    // (ms, j, dim, v), so the trainer's heaviest stage carries
    // corpus×m rows, not corpus×m×sub — plus the empty-codeword
    // keep-previous guard so k never shrinks per subspace
    def pqStep(prev: DataFrame): DataFrame = {
      val centArr = prev
        .select(struct(col("ms"), col("j"), col("csv")).as("c"))
        .agg(sort_array(collect_list(col("c"))).as("cs"))
      val assigned = corpus.crossJoin(broadcast(centArr))
        .withColumn("mine", filter(col("cs"), c => c.getField("ms") === col("ms")))
        .withColumn("best", aggregate(col("mine"),
          struct(lit(Double.PositiveInfinity).as("d"), lit(-1).as("j")),
          (acc, c) => {
            val d = l2(col("sv"), c.getField("csv"))
            when(d < acc.getField("d"),
              struct(d.as("d"), c.getField("j").as("j"))).otherwise(acc)
          }))
        .select(col("ms"), col("best.j").as("j"), col("sv"))
      val subSums = (0 until sub).map(d =>
        sum(floor(element_at(col("sv"), d + 1).cast("double")
          * 1000000.0 + 0.5).cast("long")).as(s"su$d"))
      val means = assigned
        .groupBy(col("ms"), col("j"))
        .agg(count(lit(1)).as("n"), subSums: _*)
        .select(col("ms"), col("j"),
          array((0 until sub).map(d =>
            (expr(s"su$d div n").cast("double") / 1000000.0)
              .cast("float")): _*).as("msv"))
      prev.join(means, Seq("ms", "j"), "left")
        .select(col("ms"), col("j"),
          coalesce(col("msv"), col("csv")).as("csv"))
    }
    // two steps per materialization (the `train` unroll): step i+1's
    // broadcast codeword array is a subplan of the same job
    var it = 0
    while (it < iters) {
      val steps = math.min(2, iters - it)
      val next = (1 to steps).foldLeft(codebook)((c, _) => pqStep(c))
        .cache()
      next.count()
      codebook.unpersist()
      codebook = next
      it += steps
    }
    // reassemble: codeword j = its m subspace codewords concatenated
    // in subspace order
    codebook.groupBy(col("j"))
      .agg(flatten(transform(
        sort_array(collect_list(struct(col("ms"), col("csv")))),
        s => s.getField("csv"))).as("embedding"))
      .select(col("j").cast("long").as("vec_id"), col("embedding"))
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
