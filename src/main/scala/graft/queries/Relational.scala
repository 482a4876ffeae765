package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Relational breadth queries over the star schema — the standard
  * operator set the reference lacks entirely (SURVEY.md §2.6 "absent
  * in reference"): hash aggregation, joins of every flavor, windows,
  * sorts/top-k, set ops, scalar functions. All Spark built-ins; the
  * engine work is the query surface + oracle parity, and the
  * scale-awareness notes on each query.
  *
  * Every query takes (spark, sfDir) and must hash-match its DuckDB
  * oracle — so every computed column is aliased identically on both
  * sides and every output is deterministically ordered.
  */
object Relational {

  /** q1: TPC-H Q1-style scan + hash aggregate on lineitem.
    * Scale: map-side partial aggregation over 6 groups — the shuffle is
    * a few KB regardless of input size; cost is the scan, with
    * ReadSchema pruned to the referenced columns only. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** q2: top-k by sort — global order + limit; Spark plans
    * TakeOrderedAndProject (per-partition heap + driver merge, no full
    * sort shuffle), which is the right plan at 100 TB. */
  def q2TopK(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(25)

  /** q6: selective filter + global agg (TPC-H Q6 shape). Predicates
    * push down to the parquet scan; result is a single row. */
  def q6FilterAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07
        && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
           count(lit(1)).as("n"))
}
