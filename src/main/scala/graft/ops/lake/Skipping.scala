package graft.ops.lake

import graft.engine.{Exact, Graft, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level DATA SKIPPING over the snapshot log — the Iceberg
  * min/max-stats shape on top of [[Snapshots]]: [[Snapshots.stageWithStats]]
  * range-clusters rows on `(tag, statsCol)` and records each staged
  * file's footer min/max as manifest-entry properties, so a range
  * predicate prunes FILES from the manifest before any of them is
  * opened — on top of the tag (partition) pruning the log already does.
  * At 100 TB this is the difference between "read the whole partition"
  * and "read the two files whose value range overlaps the predicate":
  * scan IO follows the predicate's selectivity, not the partition size.
  *
  * The reference has no metadata layer at all (its scans are full-table
  * BigQuery/pandas reads, e.g. `ingest_binance_last_3_days.py:141-144`);
  * this is the published Iceberg/Delta file-statistics design reduced to
  * the two moves that matter: cluster-on-write, prune-on-read.
  */
object Skipping {

  /** The s26 probe band: chosen inside the fixture's value tail so the
    * equal-count range clustering leaves most files entirely below it —
    * the pruning the spec asserts. Row-level filtering still applies
    * (skipping is IO elision, never semantics), so the result is
    * correct at ANY pruning rate. */
  val Lo = 300.0
  val Hi = 400.0

  /** s26: stats-pruned range scan. Builds the snapshot table fresh per
    * invocation (same determinism discipline as s25), staged with
    * per-file `value` stats, then answers a value-band aggregate
    * reading only manifest-surviving files. */
  def statsPrunedScan(spark: SparkSession, dir: String): DataFrame = {
    val table = Graft.tmpDir("s26-skip-" + dir.replaceAll("[^A-Za-z0-9.]", "_"))
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(wipe))
      f.delete()
    }
    wipe(new java.io.File(table)) // deterministic rebuild per invocation
    val ev = Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "event_type", "value", "event_date")
    Snapshots.commitAll(table,
      Snapshots.stageWithStats(ev, table, "event_date", "value"))
    Snapshots.read(spark, table,
        fileFilter = Snapshots.rangeOverlap("value", Lo, Hi))
      .filter(col("value") >= Lo && col("value") < Hi)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), Exact.decSum(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  /** The s27 2-D probe box (user_id x value), inside both columns'
    * interiors at EVERY fixture SF (sf0.001's user_id only reaches 14,
    * so the box must sit low in the id range) so neither predicate
    * alone is satisfied by whole-range files. */
  val UidLo = 5.0;  val UidHi = 10.0
  val ValLo = 50.0; val ValHi = 150.0

  /** s27: Z-ORDER pruned 2-D scan. The table is staged once with
    * [[Snapshots.stageZOrdered]] on `(user_id, value)` — Morton-curve
    * clustering, so each file covers a small box in BOTH dimensions —
    * and the conjunction of the two [[Snapshots.rangeOverlap]] stats
    * predicates prunes files for a 2-D box query where single-column
    * range clustering could only serve its leading column. Row-level
    * filters still apply: skipping is IO elision, never semantics. */
  def zorderPrunedScan(spark: SparkSession, dir: String): DataFrame = {
    val table = Graft.tmpDir("s27-zorder-" + dir.replaceAll("[^A-Za-z0-9.]", "_"))
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(wipe))
      f.delete()
    }
    wipe(new java.io.File(table))
    val ev = Tables(spark, dir).events
      .select("event_id", "event_type", "user_id", "value")
    Snapshots.commitAll(table,
      Snapshots.stageZOrdered(ev, table, "event_type", Seq("user_id", "value")))
    Snapshots.read(spark, table,
        fileFilter = Snapshots.allOf(
          Snapshots.rangeOverlap("user_id", UidLo, UidHi),
          Snapshots.rangeOverlap("value", ValLo, ValHi)))
      .filter(col("user_id") >= UidLo && col("user_id") <= UidHi &&
              col("value") >= ValLo && col("value") <= ValHi)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), Exact.decSum(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  val zorderPrunedScanOracle: String =
    s"""SELECT event_type, count(*) AS n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE user_id BETWEEN $UidLo AND $UidHi AND value BETWEEN $ValLo AND $ValHi
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  /** The s28 point-lookup probe ids — scattered across the id range so
    * they land in different value-clustered files. */
  val ProbeIds = Seq(17L, 4242L, 9876L)

  /** s28: BLOOM-pruned point lookup. The table is staged range-
    * clustered on `value` (the realistic ingest order) with a per-file
    * bloom filter over `event_id` — the column the layout is NOT
    * clustered by, so min/max stats span the whole id range in every
    * file and prune nothing. The IN-list probe prunes via
    * [[Snapshots.mightContainLong]] (no false negatives; false
    * positives only cost IO), then the row filter applies as always. */
  def bloomPrunedLookup(spark: SparkSession, dir: String): DataFrame = {
    val table = Graft.tmpDir("s28-bloom-" + dir.replaceAll("[^A-Za-z0-9.]", "_"))
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(wipe))
      f.delete()
    }
    wipe(new java.io.File(table))
    val ev = Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "event_type", "user_id", "value", "event_date")
    Snapshots.commitAll(table,
      Snapshots.withBloom(
        Snapshots.stageWithStats(ev, table, "event_date", "value"),
        table, "event_id", spark))
    Snapshots.read(spark, table,
        fileFilter = Snapshots.anyOf(
          ProbeIds.map(id => Snapshots.mightContainLong(table, "event_id", id)): _*))
      .filter(col("event_id").isin(ProbeIds: _*))
      .select("event_id", "event_type", "user_id", "value")
      .orderBy("event_id")
  }

  val bloomPrunedLookupOracle: String =
    s"""SELECT event_id, event_type, user_id, value FROM events
      |WHERE event_id IN (${ProbeIds.mkString(", ")})
      |ORDER BY event_id""".stripMargin

  val statsPrunedScanOracle: String =
    s"""SELECT event_type, count(*) AS n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_value
      |FROM events WHERE value >= $Lo AND value < $Hi
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("s26_stats_pruned_scan", statsPrunedScanOracle)(statsPrunedScan),
    QueryDef.sql("s27_zorder_pruned_scan", zorderPrunedScanOracle)(zorderPrunedScan),
    QueryDef.sql("s28_bloom_pruned_lookup", bloomPrunedLookupOracle)(bloomPrunedLookup))
}
