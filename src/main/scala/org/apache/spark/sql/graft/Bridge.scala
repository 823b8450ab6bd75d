package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal bridge into the `private[sql]` Dataset constructor — the
  * standard extension-library technique for materializing a DataFrame
  * from a custom [[LogicalPlan]] node (the public API offers no entry
  * point). Kept to the one call the graft planner nodes need. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
