package graft.ops.silver

import graft.engine.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's dbt model surface, verbatim-in-spirit, on Spark SQL —
  * the switch path for its SQL users. `stg_binance_trades`
  * (`dbt_project/models/staging/stg_binance_trades.sql:5-15`) and the
  * incremental `fact_trades`
  * (`dbt_project/models/marts/fact_trades.sql:13-27`) run as `spark.sql`
  * over a registered bronze source view (S6), materialized per dbt's
  * view/table defaults (S12/S13); the incremental filter is the compiled
  * `event_time > (SELECT max(event_time) FROM {{ this }})` shape (P10),
  * with MERGE-on-unique-key provided by Staging.incrementalMerge /
  * Pipelines.incrementalMergeStream (S14).
  */
object DbtModels {

  /** S6: register the bronze source (`{{ source('binance_source',
    * 'bronze_trades_raw') }}`) over the events fixture in the
    * bronze_trades_raw shape (FIXTURES.md §1). */
  def registerSources(spark: SparkSession, dir: String): Unit = {
    Tables(spark, dir).events
      .select(
        col("event_id").as("trade_id"), // numeric in bronze; stg casts to string
        col("ts").as("event_time"),
        col("event_type").as("symbol"),
        col("value").as("price"),
        get_json_object(col("props"), "$.k").cast("double").as("quantity"))
      .createOrReplaceTempView("bronze_trades_raw")
  }

  /** stg_binance_trades compiled SQL (view materialization). */
  val stgSql: String =
    """SELECT
      |  CAST(trade_id AS STRING)  AS trade_id,
      |  symbol,
      |  event_time,
      |  CAST(price AS DOUBLE)     AS price,
      |  CAST(quantity AS DOUBLE)  AS quantity,
      |  to_date(event_time)       AS event_date
      |FROM bronze_trades_raw""".stripMargin

  /** fact_trades compiled SQL on an incremental run: staging rows past
    * the target's high watermark, plus the derived notional. The
    * non-deterministic `current_timestamp() AS dbt_updated_at` column
    * exists in `buildFact` but is excluded from oracle-compared output. */
  def factSql(incrementalPredicate: String): String =
    s"""SELECT
       |  trade_id, symbol, event_time, price, quantity, event_date,
       |  price * quantity AS total_notional_usd
       |FROM stg_binance_trades
       |WHERE $incrementalPredicate""".stripMargin

  def buildFact(spark: SparkSession, dir: String): DataFrame = {
    registerSources(spark, dir)
    spark.sql(stgSql).createOrReplaceTempView("stg_binance_trades")
    spark.sql(factSql("event_time > (SELECT max(event_time) " +
      "FROM stg_binance_trades WHERE event_time < TIMESTAMP '2024-01-28 00:00:00')"))
      .withColumn("dbt_updated_at", current_timestamp())
  }

  /** Oracle-compared projection (timestamps as epoch, no audit column). */
  def factModel(spark: SparkSession, dir: String): DataFrame =
    buildFact(spark, dir)
      .select(
        col("trade_id"), col("symbol"),
        unix_millis(col("event_time").cast("timestamp")).as("event_time_ms"),
        col("price"), col("quantity"), col("event_date"),
        col("total_notional_usd"))
      .orderBy(col("trade_id").cast("long"))

  val factModelOracle: String =
    """WITH stg AS (
      |  SELECT CAST(event_id AS VARCHAR) AS trade_id, event_type AS symbol,
      |         ts AS event_time, value AS price,
      |         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS quantity,
      |         CAST(ts AS DATE) AS event_date
      |  FROM events
      |)
      |SELECT trade_id, symbol, epoch_ms(event_time) AS event_time_ms,
      |       price, quantity, event_date,
      |       price * quantity AS total_notional_usd
      |FROM stg
      |WHERE event_time > (SELECT max(event_time) FROM stg
      |                    WHERE event_time < TIMESTAMP '2024-01-28 00:00:00')
      |ORDER BY CAST(trade_id AS BIGINT)""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("dbt_fact_trades", factModelOracle)(factModel))
}
