package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bench main (BASELINE.md methodology: one preheat run, then one
  * timed run per query ≈ `/root/reference/benchmark.sh:29-36`).
  *
  * Each timed run executes the FULL plan by writing to the `noop`
  * sink — a `count()` would let Catalyst prune the very projections
  * being timed. Failures are reported as errors, never as timings.
  * Output: exactly one bare JSON line on stdout (sbt's forked-run
  * output goes through StdoutOutput, see build.sbt, so the driver
  * can parse it without an `[info] ` prefix).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def runOnce(fn: (SparkSession, String) => DataFrame): Double = {
      val df = fn(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        runOnce(fn) // preheat: JVM/codegen/parquet-footer warm-up
        timings(name) = runOnce(fn)
      } catch { case e: Throwable =>
        errors(name) = e.toString.replaceAll("[\"\\\\\n\r\t]", " ").take(200)
      }
    }
    val qs = timings.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val total = timings.values.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}""")
    spark.stop()
  }
}
