package graft.tools

/** Decomposition profiler for the trained-index queries (the g11
  * standard: measure the floor before accepting it). Splits s9 and
  * s15 into seed / Lloyd's-training / serve, two passes (pass 0 is
  * JVM+codegen warm-up; read pass 1). Round-12 findings recorded in
  * PLANS.md: seed 0.15 s, ~0.65 s per trainer materialization (pure
  * step work 0.49 s, of which the mean agg is 0.43 s and the
  * broadcast-fold assignment 0.16 s), probe 0.9 s; the 2-step unroll
  * halves the barrier count and the no-explode mean keeps the
  * partial agg row-preserving. */
object ProfileTrain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Engine.session("graft-profile-train")
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    emb.count() // warm the scan
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label ${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }
    val q = graft.queries.LlmQueries.queryVecs(spark, sfDir)
    for (pass <- 0 to 1) {
      val seed = t(s"p$pass:s9_seed") {
        graft.operators.KMeans.train(emb, 8, 0)
      }
      seed.unpersist()
      val cents = t(s"p$pass:s9_train_k8_it3") {
        graft.operators.KMeans.train(emb, 8, 3)
      }
      t(s"p$pass:s9_probe") {
        graft.operators.Similarity.knnIvfProbe(emb, q, cents, 3, 2)
          .write.format("noop").mode("overwrite").save()
      }
      cents.unpersist()
      val cb = t(s"p$pass:s15_train_m8_k16_it2") {
        graft.operators.KMeans.trainPqCodebook(emb, 8, 16, 2)
      }
      t(s"p$pass:s15_adc") {
        graft.operators.Similarity.knnPqAdc(emb, q, cb, 8, 3)
          .write.format("noop").mode("overwrite").save()
      }
      cb.unpersist()
    }
    spark.stop()
  }
}
