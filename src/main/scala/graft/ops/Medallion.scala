package graft.ops

import graft.engine.Exact
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The full medallion pipeline as one orchestrated Spark application —
  * the reference's daily DAG (`binance_revenue_dag.py`: ingest >> dbt run
  * >> dbt test) as sequential stages sharing a session (SURVEY §2.11
  * Q1/Q2). Each stage is a pure function of parquet-in → parquet-out so
  * reruns are idempotent; the assertion stage fails the job on
  * violations, matching `dbt test`'s gate role.
  */
object Medallion {

  final case class Summary(
      bronzeRows: Long, silverRows: Long, goldRows: Long,
      uniqueViolations: Long, nullViolations: Long)

  /** Stage 1 — bronze: streaming ingest into event-time partitioned
    * parquet (exactly-once via checkpoint). */
  def bronze(spark: SparkSession, sfDir: String, base: String): String = {
    val out = s"$base/bronze"
    val q = graft.streaming.Pipelines.bronzeIngest(
      spark, sfDir, out, s"$base/bronze-ckpt")
    q.awaitTermination()
    out
  }

  /** Stage 2 — silver: stg projection (P6) + last-write-wins dedup on the
    * unique key (A4). */
  def silver(spark: SparkSession, bronzeDir: String, base: String): String = {
    val out = s"$base/silver"
    val w = Window.partitionBy("trade_id").orderBy(col("event_time_us").desc)
    spark.read.parquet(bronzeDir)
      .select(
        col("event_id").cast("string").as("trade_id"),
        col("event_type").as("symbol"),
        unix_micros(col("ts")).as("event_time_us"),
        col("value").as("price"),
        get_json_object(col("props"), "$.k").cast("double").as("quantity"),
        col("event_date"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .write.mode(SaveMode.Overwrite).parquet(out)
    out
  }

  /** Stage 3 — gold: daily notional rollup ⟕ broadcast fee/tax rules →
    * revenue columns (the flagship shape over the silver table). */
  def gold(spark: SparkSession, silverDir: String, base: String): String = {
    val out = s"$base/gold"
    val rules = graft.ops.gold.Revenue.rulesDf(spark)
      .withColumn("fee_rate", (col("fee_rate_bps") / 10000.0).cast(DecimalType(8, 6)))
      .withColumn("tax_rate", (col("tax_rate_bps") / 10000.0).cast(DecimalType(8, 6)))
    val zero = lit(0.0).cast(DecimalType(8, 6))
    spark.read.parquet(silverDir)
      .withColumn("notional", col("price") * coalesce(col("quantity"), lit(1.0)))
      .groupBy("event_date", "symbol")
      .agg(sum(col("notional").cast(DecimalType(25, 6))).cast(DecimalType(25, 6)).as("tn_dec"))
      .join(broadcast(rules), Seq("symbol"), "left_outer")
      .select(
        col("event_date"), col("symbol"),
        coalesce(col("region"), lit("EU")).as("region"),
        col("tn_dec").cast("double").as("traded_notional"),
        (col("tn_dec") * coalesce(col("fee_rate"), zero)).cast("double").as("fee_revenue"),
        (col("tn_dec") * coalesce(col("tax_rate"), zero)).cast("double").as("tax_collected"))
      .write.mode(SaveMode.Overwrite).partitionBy("event_date").parquet(out)
    out
  }

  /** The declarative contract for the silver table — the dbt
    * `schema.yml` analog (ref `dbt_project/models/staging/schema.yml:
    * 11-24` declares unique+not_null on the staging key columns). This
    * is DATA, not code: callers swap in their own expectations and the
    * same gate machinery runs them. */
  val silverContract: Seq[quality.TableContract] = Seq(
    quality.TableContract("silver", Seq(
      quality.ColumnSpec("trade_id", Seq(quality.Unique, quality.NotNull)),
      quality.ColumnSpec("symbol", Seq(quality.NotNull)),
      quality.ColumnSpec("event_time_us", Seq(quality.NotNull)))))

  /** Stage 4 — checks: the declared contract compiled onto the assertion
    * operators; returns (duplicate-key checks, null checks) violation
    * totals from one report action. */
  def check(spark: SparkSession, silverDir: String,
      contract: Seq[quality.TableContract] = silverContract): (Long, Long) = {
    val rows = quality.Contract
      .report(contract, _ => spark.read.parquet(silverDir)).collect()
    def total(check: String): Long =
      rows.filter(_.getString(2) == check).map(_.getLong(3)).sum
    (total("unique") + total("accepted_values") + total("relationships"),
      total("not_null"))
  }

  /** Run the full pipeline. The contract gate sits BETWEEN silver and
    * gold — a failing contract blocks gold materialization, exactly the
    * reference's `dbt run >> dbt test` ordering turned into the stricter
    * `test silver >> build gold` gate. */
  def run(spark: SparkSession, sfDir: String, base: String,
      contract: Seq[quality.TableContract] = silverContract): Summary = {
    val bronzeDir = bronze(spark, sfDir, base)
    val silverDir = silver(spark, bronzeDir, base)
    val (uv, nv) = check(spark, silverDir, contract)
    require(uv == 0 && nv == 0,
      s"data-quality gate failed, gold not built: $uv key/domain violations, $nv nulls")
    val goldDir = gold(spark, silverDir, base)
    Summary(
      spark.read.parquet(bronzeDir).count(),
      spark.read.parquet(silverDir).count(),
      spark.read.parquet(goldDir).count(),
      uv, nv)
  }
}
