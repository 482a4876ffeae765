package graft.tools

import graft.{Engine, SparkEntry}

/** Plan-audit driver (S9 sink over the whole query surface): dumps
  * the formatted physical plan of every SparkEntry query to
  * `outDir/<name>.plan.txt` for Exchange/Sort/pushdown/broadcast
  * review. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = args.headOption.getOrElse("/tmp/graft_plans")
    // optional further args: restrict to the named queries (local
    // iteration — dumping all 283 re-runs every construction-time
    // fixpoint)
    val only = args.drop(1).toSet
    new java.io.File(outDir).mkdirs()
    val spark = Engine.session("graft-plans")
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter(e => only.isEmpty || only.contains(e._1)).foreach { case (name, fn) =>
      try Engine.dumpPlan(fn(spark, sfDir), s"$outDir/$name.plan.txt")
      catch { case e: Throwable =>
        System.err.println(s"[plans] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
