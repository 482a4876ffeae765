package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local-mode knobs mirror the reference's physical-exec config
  * (`/root/reference/config/settings.yaml:10-11`,
  * `/root/reference/run.sh:43-55`: N pipelines x 4 cores, compact
  * affinity): here parallelism = `local[N]` task slots and
  * `spark.sql.shuffle.partitions`, sized to the machine rather than
  * Spark's default 200. On a real cluster these come from
  * spark-submit; everything else (AQE, broadcast threshold) is
  * scale-oriented and carries over unchanged.
  */
object Engine {
  def cpus: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())

  def session(appName: String = "graft", master: String = ""): SparkSession = {
    val m = if (master.nonEmpty) master else s"local[$cpus]"
    SparkSession.builder()
      .master(m)
      .appName(appName)
      // custom codegen'd expressions (poly_hash, cosine_sim)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // spill-aware sizing: scan splits capped so a task's working
      // set (columns read × rows per split) stays well inside
      // executor memory at any SF; shuffle partition count above is
      // the cluster-side knob (cores here, data/200MB-ish on a real
      // cluster), with AQE coalescing the small ones
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which Spark rejects by
      // default; read as long and convert at the loader (Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Emit micros (not INT96/nanos) so dumped timestamps carry the
      // same physical type as the DuckDB oracle's TIMESTAMP
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  /** S9: the debug-graph-dump sink analog
    * (`/root/reference/run.sh:26-28`, `gst_graph=1` → .dot file):
    * writes the formatted physical plan — Exchange/Sort/codegen
    * boundaries visible — to a file for plan audits. */
  def dumpPlan(df: org.apache.spark.sql.DataFrame, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
}
