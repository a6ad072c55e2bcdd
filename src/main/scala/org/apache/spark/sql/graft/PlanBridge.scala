package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]` doorway a library-level custom operator needs:
  * wrapping a hand-built [[LogicalPlan]] back into a user-facing
  * DataFrame. `classic.Dataset.ofRows` is `private[sql]`, so this bridge
  * lives under `org.apache.spark.sql` — the standard extension idiom used
  * by Spark-native libraries; everything else in graft.plans sticks to
  * public catalyst/execution APIs. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
