package graft.tools

/** Per-query floor decomposition (optimization round 14, guide §1):
  * splits one BenchOne-style timed run into
  *   construct  — DataFrame construction (may run real jobs for the
  *                iterative queries; same charging as Bench)
  *   plan       — analysis + optimization + physical planning +
  *                codegen entry (forcing executedPlan)
  *   execute    — the noop write given a fully planned frame
  * so global overhead work targets the right component. Median of 3
  * after one preheat, like Bench/BenchOne.
  */
object Floor {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Engine.session("graft-floor")
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // preheat
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analyze+optimize+plan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }.sortBy(r => r._1 + r._2 + r._3)
      val (c, p, e) = runs(1)
      println(f"FLOOR $name construct=$c%.3f plan=$p%.3f execute=$e%.3f total=${c + p + e}%.3f")
    }
    spark.stop()
  }
}
