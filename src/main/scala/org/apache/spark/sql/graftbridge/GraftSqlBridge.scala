package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}

/** Minimal bridge to Spark's session-internal Dataset constructor,
  * needed to build a DataFrame from a custom LogicalPlan
  * (graft.plans.DetectNode). Lives in an org.apache.spark.sql
  * subpackage because the constructor is `private[sql]` — the
  * standard pattern for extension libraries that ship their own
  * plan nodes. Nothing else reaches into Spark internals.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
