package graft.ops.gold

import graft.engine.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality assertion operators (SURVEY §2.11 Q3): the dbt
  * `unique` / `not_null` tests as first-class DataFrame ops returning the
  * violating rows (empty result = test passed). Exercised here against a
  * deliberately-corrupted union so the violation path is non-vacuous.
  */
object Assertions {

  /** Rows violating key uniqueness: `SELECT key, n FROM t GROUP BY key
    * HAVING count(*) > 1` — the dbt-unique compile shape. */
  def uniqueViolations(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Null-count per required column — the dbt-not_null compile shape,
    * as one aggregate pass over all columns. */
  def notNullReport(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** q3a: unique-key check over events with the first 50 keys duplicated
    * (re-ingest simulation) — exactly those keys must be reported. */
  def uniqueCheck(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events.select("event_id", "user_id")
    val corrupted = ev.unionByName(ev.filter(col("event_id") < 50))
    uniqueViolations(corrupted, "event_id").orderBy("event_id")
  }

  val uniqueCheckOracle: String =
    """WITH corrupted AS (
      |  SELECT event_id, user_id FROM events
      |  UNION ALL
      |  SELECT event_id, user_id FROM events WHERE event_id < 50
      |)
      |SELECT event_id, count(*) AS n FROM corrupted
      |GROUP BY event_id HAVING count(*) > 1 ORDER BY event_id""".stripMargin

  /** q3b: not-null report over events plus one injected all-null row. */
  def notNullCheck(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("event_id"), col("user_id"), col("event_type"))
    val nullRow = ev.sparkSession.sql(
      "SELECT CAST(NULL AS BIGINT) event_id, CAST(NULL AS BIGINT) user_id, CAST(NULL AS STRING) event_type")
    notNullReport(ev.unionByName(nullRow), Seq("event_id", "user_id", "event_type"))
  }

  val notNullCheckOracle: String =
    """WITH t AS (
      |  SELECT event_id, user_id, event_type FROM events
      |  UNION ALL
      |  SELECT NULL, NULL, NULL
      |)
      |SELECT CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_id,
      |       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_id,
      |       CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_type
      |FROM t""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("q3a_unique_check", uniqueCheckOracle)(uniqueCheck),
    QueryDef.sql("q3b_not_null_check", notNullCheckOracle)(notNullCheck))
}
