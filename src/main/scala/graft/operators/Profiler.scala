package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the first step of any training-data pipeline
  * run over a new corpus: per-column cardinality/bounds/null counts.
  * Implemented as unpivot → one hash aggregation, so the profile of
  * N columns costs one scan regardless of N (not N scans), and the
  * shuffle carries one row per column per partition (partial aggs).
  */
object Profiler {

  /** Profile numeric columns: one output row per column with exact
    * stats. */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stacked = df.select(
      explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("double").as("v"))): _*))
        .as("e"))
      .select(col("e.col_name").as("col_name"), col("e.v").as("v"))
    stacked.groupBy(col("col_name")).agg(
      count(lit(1)).as("n_rows"),
      count(col("v")).as("n_nonnull"),
      countDistinct(col("v")).as("n_distinct"),
      min(col("v")).as("vmin"),
      max(col("v")).as("vmax"))
  }

  /** Profile string columns — same one-scan unpivot shape as
    * numericProfile (the two profiles together cover a table's whole
    * schema in two scans total, never one per column): cardinality,
    * empty-value count, length bounds, and total bytes per column.
    * Length is measured in CHARACTERS (Spark `length` ↔ DuckDB
    * `length`), byte volume in UTF-8 bytes (`octet_length` on both
    * engines) — the sizing numbers a storage planner actually wants. */
  def stringProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stacked = df.select(
      explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*))
        .as("e"))
      .select(col("e.col_name").as("col_name"), col("e.v").as("v"))
    stacked.groupBy(col("col_name")).agg(
      count(lit(1)).as("n_rows"),
      count(col("v")).as("n_nonnull"),
      countDistinct(col("v")).as("n_distinct"),
      count(when(col("v") === "", 1)).as("n_empty"),
      min(length(col("v"))).as("len_min"),
      max(length(col("v"))).as("len_max"),
      sum(octet_length(col("v"))).as("total_bytes"))
  }
}
