package graft.ops.lake

import graft.engine.{Exact, Graft, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TIME TRAVEL and CHANGE DATA FEED over the snapshot log — the two
  * reads the immutable-manifest commit protocol ([[Snapshots]]) gives
  * for free and the reference cannot express at all (its overwrite
  * destroys history in place: `ingest_binance_last_3_days.py:141-144`
  * re-writes the GCS prefix, so yesterday's state is simply gone):
  *
  *   - s29 [[timeTravelRead]]: read snapshot v1 EXACTLY as committed,
  *     after a v2 partition-heal overwrote three dates — the audit /
  *     reproducibility read ("what did the table say before the
  *     backfill?"). Cost: the same pruned file listing any read pays;
  *     history is structural sharing, not copies.
  *   - s30 [[changeFeed]]: the v1→v2 delta as a file-granular CDC
  *     stream (delete+insert pairs for the healed dates, NOTHING for
  *     the untouched ones) — the incremental-consumer read that keeps
  *     a downstream index in sync for O(changed files) instead of a
  *     100 TB double scan.
  *
  * Both queries rebuild their table deterministically per invocation
  * (same discipline as s25/s26) so the oracle compare is exact.
  */
object TimeTravel {

  /** The heal window both queries share (same dates as q5/s25). */
  val HealDates: Set[String] = Set("2024-01-10", "2024-01-11", "2024-01-12")

  /** Build the two-version fixture table: v1 = full events by date,
    * v2 = [[HealDates]] re-staged with corrected (doubled) values via
    * one atomic remove+add commit. Returns the table path. */
  private[lake] def buildHealedTable(spark: SparkSession, dir: String, prefix: String): String = {
    val table = Graft.freshDir(prefix + dir.replaceAll("[^A-Za-z0-9.]", "_"))
    val ev = Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "value", "event_date")
    Snapshots.commit(table, Snapshots.stage(ev, table, "event_date"))
    val healed = ev.filter(col("event_date").between("2024-01-10", "2024-01-12"))
      .select(col("event_id"), (col("value") * 2.0).as("value"), col("event_date"))
    Snapshots.commit(table, Snapshots.stage(healed, table, "event_date"),
      remove = e => HealDates.contains(e._2))
    table
  }

  /** s29: the pre-heal state, read back AFTER the heal committed.
    * `readVersion(v=1)` resolves v1's manifest list — untouched
    * manifests are shared BY NAME with v2, removed files still exist
    * until vacuum — so the aggregate equals the ORIGINAL data exactly;
    * the oracle is the plain no-heal aggregate over events. */
  def timeTravelRead(spark: SparkSession, dir: String): DataFrame = {
    val table = buildHealedTable(spark, dir, "s29-travel-")
    Snapshots.readVersion(spark, table, 1)
      .groupBy("event_date")
      .agg(count(lit(1)).as("n"), Exact.decSum(col("value")).as("sum_value"))
      .orderBy("event_date")
  }

  val timeTravelReadOracle: String =
    """SELECT CAST(ts AS DATE) AS event_date, count(*) AS n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY event_date""".stripMargin

  /** s30: the v1→v2 heal as a CDC feed. [[Snapshots.changes]] emits
    * the healed dates' old files as deletes and their replacements as
    * inserts — the untouched dates' files are shared between the two
    * snapshots and are never opened — aggregated per (date, change
    * type) so the oracle can restate it from the raw events. */
  def changeFeed(spark: SparkSession, dir: String): DataFrame = {
    val table = buildHealedTable(spark, dir, "s30-cdc-")
    Snapshots.changes(spark, table, 1, 2)
      .groupBy(col("event_date"), col("_change_type").as("change_type"))
      .agg(count(lit(1)).as("n"), Exact.decSum(col("value")).as("sum_value"))
      .orderBy("event_date", "change_type")
  }

  val changeFeedOracle: String =
    """SELECT event_date, change_type, n, sum_value FROM (
      |  SELECT CAST(ts AS DATE) AS event_date, 'delete' AS change_type, count(*) AS n,
      |    CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_value
      |  FROM events
      |  WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12' GROUP BY 1
      |  UNION ALL
      |  SELECT CAST(ts AS DATE) AS event_date, 'insert' AS change_type, count(*) AS n,
      |    CAST(CAST(SUM(CAST(value * 2.0 AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_value
      |  FROM events
      |  WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12' GROUP BY 1
      |) ORDER BY event_date, change_type""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("s29_time_travel", timeTravelReadOracle)(timeTravelRead),
    QueryDef.sql("s30_change_feed", changeFeedOracle)(changeFeed))
}
