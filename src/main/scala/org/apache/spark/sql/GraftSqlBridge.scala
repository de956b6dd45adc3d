package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-placed accessor for the one `private[sql]` entry point a
  * custom logical operator needs: turning a hand-built LogicalPlan
  * into a DataFrame through the full analyzer/optimizer/planner
  * pipeline. The standard extension-library pattern (every Spark
  * connector/extension that adds an operator does exactly this);
  * nothing else from the private surface is touched.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
