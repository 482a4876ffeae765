package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine
import graft.functions.TextFunctions._
import graft.operators.Dedup
import graft.sources.Tables

/** Disposable stage profiler for the dedup pipeline (not part of the
  * engine surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-profile")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f")
    }
    time("scan") { docs.write.format("noop").mode("overwrite").save() }
    time("tokens") { docs.select(tokens(col("text"))).write.format("noop").mode("overwrite").save() }
    time("shingles") { docs.select(shingles3(tokens(col("text")))).write.format("noop").mode("overwrite").save() }
    time("explode+hash") {
      docs.select(col("doc_id"), explode(shingles3(tokens(col("text")))).as("s"))
        .select(col("doc_id"), polyHash(col("s")).as("h"))
        .write.format("noop").mode("overwrite").save()
    }
    time("features(agg)") { Dedup.shingleFeatures(docs).write.format("noop").mode("overwrite").save() }
    time("candidates") { Dedup.lshCandidates(Dedup.shingleFeatures(docs)).write.format("noop").mode("overwrite").save() }
    time("nearDupPairs") { Dedup.nearDupPairs(docs, 0.8).write.format("noop").mode("overwrite").save() }
    // g11 floor decomposition (VERDICT r10 #10): pair generation vs
    // CC rounds vs closing aggregation
    val d6pairs = graft.queries.LlmQueries.d6SimhashPairs(spark, dir)
    time("g11: d6 pair gen") {
      d6pairs.write.format("noop").mode("overwrite").save()
    }
    time("g11: CC(two-phase) on d6") {
      graft.operators.Components.connectedComponentsTwoPhase(
        d6pairs.select(col("doc_a").cast("long").as("a"),
          col("doc_b").cast("long").as("b")))
        .write.format("noop").mode("overwrite").save()
    }
    time("g11: full modularity") {
      graft.operators.Graph.modularity(d6pairs)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
