package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway graft's custom operator needs:
  * constructing a DataFrame from a custom LogicalPlan
  * (`classic.Dataset.ofRows` is package-private at the Scala level in
  * Spark 4). Standard practice for Spark plan extensions; nothing else
  * from the internal API is touched here. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
