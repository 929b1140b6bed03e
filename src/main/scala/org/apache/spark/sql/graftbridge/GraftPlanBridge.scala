package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the custom-operator API needs: turning
  * a hand-built [[LogicalPlan]] (graft.plans.AsofJoinPlan) back into a
  * DataFrame. Spark exposes this to extensions through package-private
  * `Dataset.ofRows`, so the standard practice for planner-extension
  * libraries is a minimal bridge object inside an `org.apache.spark.sql`
  * subpackage — nothing else of Spark's internals is touched here. */
object GraftPlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
