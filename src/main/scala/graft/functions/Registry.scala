package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** One shared idempotent-registration helper for the native Catalyst
  * expressions — re-registering is harmless but logs a "replaced a
  * previously registered function" warning per operator invocation,
  * and the guard logic should exist once, not per function. */
object Registry {
  def registerOnce(spark: SparkSession, name: String)(
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
