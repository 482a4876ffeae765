package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver-provided star schema
  * (`TESTDATA.md`): TPC-H-ish tables + `events` stream table +
  * `documents`/`embeddings` for the LLM-pipeline operators.
  *
  * Scans stay declarative (`spark.read.parquet`) so Catalyst pushes
  * filters and prunes columns at the source — at 100 TB the scan is
  * the dominant cost and `PushedFilters`/`ReadSchema` on the physical
  * plan are the first thing to check.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet has shipped `ts` in three physical encodings
    * across driver revisions: TIMESTAMP(NANOS) (which, under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, arrives as LONG
    * nanos), TIMESTAMP(MICROS, isAdjustedToUTC=false) (which arrives
    * as TimestampNTZType), and UTC-adjusted TIMESTAMP(MICROS) (a real
    * TimestampType). Branch on the arrived dtype so the loader is
    * correct under any of them: LONG nanos → integer `div 1000` (keeps
    * the full 63-bit value exact; a double division would lose
    * precision above 2^53 ns) → timestamp_micros; NTZ → cast to
    * TimestampType, which is the identity on the stored micros because
    * the session timezone is pinned to UTC in `Engine`; TimestampType
    * passes through. Every downstream consumer (windows, `unix_micros`,
    * watermarks) sees one canonical micros TimestampType. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Small-relation parallelization for kernel-heavy per-row stages
    * (codec decodes, window extraction, LM scoring): a relation whose
    * whole footprint is a single parquet row group arrives as ONE
    * scan partition, so a CPU-bound kernel downstream runs on one
    * core no matter how many the session has. When the plan's size
    * estimate says the relation is tiny (< cpus × 8 MB — i.e. there
    * aren't even `cpus` healthy splits in it), redistribute rows
    * round-robin across the session's cores; the shuffled bytes are
    * by definition small. At production scale the estimate exceeds
    * the threshold and this is a NO-OP — the scan's own splits
    * provide the parallelism, and no full-corpus shuffle is ever
    * introduced. */
  def spread(df: DataFrame): DataFrame = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val threshold = BigInt(graft.Engine.cpus.toLong) * 8L * 1024 * 1024
    if (bytes < threshold) df.repartition(graft.Engine.cpus) else df
  }
}
