package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The two `private[sql]` doorways graft needs:
  *   - constructing a DataFrame from a custom LogicalPlan
  *     (`classic.Dataset.ofRows` is package-private at the Scala level in
  *     Spark 4) — standard practice for Spark plan extensions;
  *   - eagerly unloading state-store provider instances
  *     (`StateStore.unloadAll`), so a multi-query process (the bench
  *     suite) releases RocksDB NATIVE memory when a streaming drain
  *     finishes instead of when the 60 s maintenance sweep notices.
  * Nothing else from the internal API is touched here. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def unloadStateStores(): Unit =
    execution.streaming.state.StateStore.unloadAll()
}
