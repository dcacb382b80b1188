package graft.ops.bronze

import graft.engine.{Exact, Graft, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Batch backfill capabilities (SURVEY E2/S3/S11/Q5): the REST-paginated
  * ingest re-expressed as a distributed page-spec scan, append with
  * schema evolution, and partition-overwrite healing.
  */
object Backfill {

  /** S3: REST paginated scan model. The reference loops (day × hour ×
    * symbol) windows on the driver and fetches ≤1000 rows per window
    * (`ingest_binance_last_3_days.py:105-133`); the distributed form is a
    * `spark.range` over the page-spec grid flat-mapped through the
    * fetcher — here a deterministic stub fetch (no egress), with the real
    * per-page limit semantics (O1). Each page is one task: 1000
    * symbols × 72 windows parallelizes across the cluster instead of a
    * driver loop. */
  private val PageSymbols = Seq("BTCUSDT", "ETHUSDT")
  private val PageDays = 3
  private val PageSize = 5

  /** Deterministic stub fetch (no egress) with the real per-page limit
    * semantics; `failOn` injects per-page HTTP-failure behavior for the
    * resilient variant. */
  private def fetchPage(symbol: String, dayOffset: Int,
      failOn: Set[(String, Int)]): Seq[(Long, Double)] = {
    if (failOn((symbol, dayOffset)))
      throw new RuntimeException(s"HTTP 500 fetching $symbol day $dayOffset")
    (0 until PageSize).map { i =>
      (symbol.hashCode.toLong.abs % 1000 * 100000L + dayOffset * 1000L + i,
        100.0 + dayOffset + i * 0.5)
    }
  }

  private def pageSpecs(spark: SparkSession): DataFrame =
    spark.range(PageSymbols.size.toLong * PageDays)
      .select(
        element_at(typedLit(PageSymbols), (col("id") / PageDays).cast("int") + 1).as("symbol"),
        (col("id") % PageDays).cast("int").as("day_offset"))

  def paginatedScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pageSpecs(spark).as[(String, Int)].flatMap { case (symbol, dayOffset) =>
      fetchPage(symbol, dayOffset, failOn = Set.empty)
        .map { case (tradeId, price) => (symbol, dayOffset, tradeId, price) }
    }.toDF("symbol", "day_offset", "trade_id", "price")
      .orderBy("symbol", "day_offset", "trade_id")
  }

  /** The same grid × stub-fetch in SQL for the oracle. */
  val paginatedScanOracle: String =
    """WITH grid AS (
      |  SELECT s.symbol, d.day_offset
      |  FROM (VALUES ('BTCUSDT'), ('ETHUSDT')) s(symbol)
      |  CROSS JOIN (VALUES (0), (1), (2)) d(day_offset)
      |), pages AS (
      |  SELECT symbol, day_offset, i
      |  FROM grid CROSS JOIN (VALUES (0), (1), (2), (3), (4)) p(i)
      |)
      |SELECT symbol, day_offset,
      |       CAST(CASE symbol WHEN 'BTCUSDT' THEN 583 ELSE 65 END * 100000
      |            + day_offset * 1000 + i AS BIGINT) AS trade_id,
      |       100.0 + day_offset + i * 0.5 AS price
      |FROM pages ORDER BY symbol, day_offset, trade_id""".stripMargin

  /** The page the resilient scan's fetcher poisons — a deterministic
    * stand-in for a flaky upstream endpoint. */
  val PoisonedPage: (String, Int) = ("ETHUSDT", 1)

  /** S3 failure path: the reference swallows per-window HTTP errors into
    * empty pages and keeps going (`ingest_binance_last_3_days.py:44-46` —
    * `except: return []`). Distributed restatement: each page fetch is
    * wrapped per-task; a failed page contributes zero data rows but stays
    * visible as a `fetch_ok = false` marker row (the `parse_ok`-counter
    * pattern from p13), so completeness is auditable downstream instead
    * of silently absent. Every other page is unaffected — one bad window
    * cannot fail the job. */
  def paginatedScanResilient(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pageSpecs(spark).as[(String, Int)].flatMap { case (symbol, dayOffset) =>
      try fetchPage(symbol, dayOffset, failOn = Set(PoisonedPage))
        .map { case (tradeId, price) =>
          (symbol, dayOffset, Some(tradeId), Some(price), true)
        }
      catch {
        case scala.util.control.NonFatal(_) =>
          Seq((symbol, dayOffset, Option.empty[Long], Option.empty[Double], false))
      }
    }.toDF("symbol", "day_offset", "trade_id", "price", "fetch_ok")
      .orderBy(col("symbol"), col("day_offset"), col("trade_id").asc_nulls_first)
  }

  val paginatedScanResilientOracle: String =
    """WITH grid AS (
      |  SELECT s.symbol, d.day_offset
      |  FROM (VALUES ('BTCUSDT'), ('ETHUSDT')) s(symbol)
      |  CROSS JOIN (VALUES (0), (1), (2)) d(day_offset)
      |), pages AS (
      |  SELECT symbol, day_offset, i
      |  FROM grid CROSS JOIN (VALUES (0), (1), (2), (3), (4)) p(i)
      |)
      |SELECT symbol, day_offset, trade_id, price, fetch_ok FROM (
      |  SELECT symbol, day_offset,
      |         CAST(CASE symbol WHEN 'BTCUSDT' THEN 583 ELSE 65 END * 100000
      |              + day_offset * 1000 + i AS BIGINT) AS trade_id,
      |         CAST(100.0 + day_offset + i * 0.5 AS DOUBLE) AS price,
      |         TRUE AS fetch_ok
      |  FROM pages WHERE NOT (symbol = 'ETHUSDT' AND day_offset = 1)
      |  UNION ALL
      |  SELECT symbol, day_offset, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), FALSE
      |  FROM grid WHERE symbol = 'ETHUSDT' AND day_offset = 1
      |) ORDER BY symbol, day_offset, trade_id NULLS FIRST""".stripMargin

  /** S11: append with schema evolution (`ALLOW_FIELD_ADDITION` ≅
    * mergeSchema): v1 rows lack the column v2 adds; the evolved read
    * surfaces v1 rows with NULLs. */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val path = Graft.tmpDir("s11-evolve-" + dir.replaceAll("[^A-Za-z0-9.]", "_"))
    val ev = Tables(spark, dir).events
    val v1 = ev.filter(col("event_id") < 100)
      .select(col("event_id"), col("event_type"), col("value"))
    val v2 = ev.filter(col("event_id") >= 100 && col("event_id") < 200)
      .select(col("event_id"), col("event_type"), col("value"),
        col("user_id").as("added_user_id"))
    v1.write.mode(SaveMode.Overwrite).parquet(path)
    v2.write.mode(SaveMode.Append).parquet(path)
    spark.read.option("mergeSchema", "true").parquet(path)
      .select("event_id", "event_type", "value", "added_user_id")
      .orderBy("event_id")
  }

  val schemaEvolutionOracle: String =
    """SELECT event_id, event_type, value, CAST(NULL AS BIGINT) AS added_user_id
      |FROM events WHERE event_id < 100
      |UNION ALL
      |SELECT event_id, event_type, value, user_id AS added_user_id
      |FROM events WHERE event_id >= 100 AND event_id < 200
      |ORDER BY event_id""".stripMargin

  /** Q5: the 3-day re-ingest healing pattern — dynamic partition
    * overwrite replaces only the partitions present in the incoming
    * frame, leaving the rest of the table untouched. The re-ingested
    * window carries corrected values; the read-back must show corrections
    * inside the window and original data outside it. */
  def partitionOverwrite(spark: SparkSession, dir: String): DataFrame = {
    val path = Graft.tmpDir("q5-heal-" + dir.replaceAll("[^A-Za-z0-9.]", "_"))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val ev = Tables(spark, dir).events
        .withColumn("event_date", to_date(col("ts")))
      ev.select("event_id", "value", "event_date")
        .write.mode(SaveMode.Overwrite).partitionBy("event_date").parquet(path)
      // heal window: Jan 10–12 re-ingested with corrected values
      ev.filter(col("event_date").between("2024-01-10", "2024-01-12"))
        .select(col("event_id"), (col("value") * 2.0).as("value"), col("event_date"))
        .write.mode(SaveMode.Overwrite).partitionBy("event_date").parquet(path)
      spark.read.parquet(path)
        .groupBy(col("event_date").cast("date").as("event_date"))
        .agg(count(lit(1)).as("n"), Exact.decSum(col("value")).as("sum_value"))
        .orderBy("event_date")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  val partitionOverwriteOracle: String =
    """SELECT CAST(ts AS DATE) AS event_date, count(*) AS n,
      |  CAST(CAST(SUM(CAST(CASE WHEN CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
      |                          THEN value * 2.0 ELSE value END AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY event_date""".stripMargin

  /** s25: q5's backfill-heal re-expressed through the SNAPSHOT COMMIT
    * protocol ([[graft.ops.lake.Snapshots]]) — the atomic answer to the
    * torn-view window both q5's dynamic overwrite and s23's bucket
    * rewrite leave open: data files for the healed dates stage
    * invisibly, ONE manifest rename publishes the swap, and a reader
    * that resolved the previous manifest keeps reading intact old files
    * until a deferred vacuum (SnapshotsSpec pins old-XOR-new under a
    * concurrent reader and the crash cases). Same heal, same oracle
    * output as q5 — only the commit discipline differs. */
  def snapshotOverwrite(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.lake.Snapshots
    val table = Graft.tmpDir("s25-snap-" + dir.replaceAll("[^A-Za-z0-9.]", "_"))
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(wipe))
      f.delete()
    }
    wipe(new java.io.File(table)) // deterministic rebuild per invocation
    val ev = Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "value", "event_date")
    Snapshots.commit(table, Snapshots.stage(ev, table, "event_date"))
    val healDates = Set("2024-01-10", "2024-01-11", "2024-01-12")
    val healed = ev.filter(col("event_date").between("2024-01-10", "2024-01-12"))
      .select(col("event_id"), (col("value") * 2.0).as("value"), col("event_date"))
    Snapshots.commit(table, Snapshots.stage(healed, table, "event_date"),
      remove = e => healDates.contains(e._2))
    Snapshots.vacuum(table)
    Snapshots.read(spark, table)
      .groupBy("event_date")
      .agg(count(lit(1)).as("n"), Exact.decSum(col("value")).as("sum_value"))
      .orderBy("event_date")
  }

  /** s23's layout fan-out and delete targets. Keys are hash-bucketed so
    * a subject's rows collocate in exactly one partition directory. */
  val DeleteBuckets = 8
  val DeleteTargets: Seq[Long] = Seq(7L, 11L)

  /** s23: TARGETED DELETE (the GDPR right-to-be-forgotten job) as a
    * partition-scoped rewrite. The table is laid out bucketed by
    * `user_id % [[DeleteBuckets]]`, so a deletion subject's rows live
    * in ONE partition directory; the delete (1) derives the affected
    * bucket list driver-side from the target ids — O(#subjects), no
    * scan; (2) reads ONLY those partitions (pruned scan), anti-filters
    * the subjects, and dynamic-partition-overwrites them back. The
    * other partitions' files are never opened, moved, or rewritten —
    * SourcesSpec asserts their file listing is byte-identical — which
    * at a 100 TB table is the difference between touching 1/8th (or
    * with 10⁴ buckets, 1/10⁴th) of the lake and rewriting all of it.
    * Ref analog: none (the ref never deletes); this is the compliance
    * op any production lake needs. */
  def targetedDelete(spark: SparkSession, dir: String): DataFrame = {
    val path = targetedDeleteBuild(spark, dir)
    spark.read.parquet(path)
      .groupBy(col("user_bucket").cast("bigint").as("user_bucket"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        Exact.decSum(col("value")).as("sum_value"))
      .orderBy("user_bucket")
  }

  /** Builds the bucketed layout, runs the delete, returns the path
    * (split out so the spec can inspect the files each phase leaves). */
  private[graft] def targetedDeleteBuild(spark: SparkSession, dir: String): String = {
    val path = Graft.tmpDir("s23-del-" + dir.replaceAll("[^A-Za-z0-9.]", "_"))
    targetedDeleteLayout(spark, dir, path)
    targetedDeleteApply(spark, path)
    path
  }

  /** Phase 1: the subject-bucketed table layout. */
  private[graft] def targetedDeleteLayout(spark: SparkSession, dir: String, path: String): Unit =
    Tables(spark, dir).events
      .withColumn("user_bucket", col("user_id") % DeleteBuckets)
      .select("event_id", "user_id", "value", "user_bucket")
      .write.mode(SaveMode.Overwrite).partitionBy("user_bucket").parquet(path)

  /** Phase 2: the delete — prune to the subjects' buckets, anti-filter,
    * stage the survivors OUT of the table (a direct self-overwrite
    * would consume the very files it replaces), dynamic-overwrite the
    * surviving buckets back, and explicitly drop bucket directories
    * the delete emptied — dynamic overwrite only rewrites partitions
    * PRESENT in the written frame, so a bucket whose every row
    * belonged to a subject would otherwise silently keep its data
    * (the failure mode the spec's bucket-7-at-sf0.001 case pins:
    * there user 7 is its bucket's only occupant). */
  private[graft] def targetedDeleteApply(spark: SparkSession, path: String): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val staging = path + ".staging"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    try {
      val buckets = DeleteTargets.map(_ % DeleteBuckets).distinct
      spark.read.parquet(path)
        .filter(col("user_bucket").isin(buckets: _*)) // partition-pruned
        .filter(!col("user_id").isin(DeleteTargets: _*))
        .write.mode(SaveMode.Overwrite).parquet(staging)
      val staged = spark.read.parquet(staging)
      if (!staged.isEmpty) {
        staged.write.mode(SaveMode.Overwrite).partitionBy("user_bucket").parquet(path)
      }
      val survivors = staged.select("user_bucket").distinct()
        .collect().map(_.get(0).toString.toLong).toSet
      for (b <- buckets if !survivors.contains(b)) {
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/user_bucket=$b"), true)
      }
      // The overwrite + empty-bucket drop above is NOT atomic: a crash
      // mid-apply can leave subject rows partially present. The marker
      // protocol makes that state DETECTABLE and the op re-runnable:
      // the completion marker is written only after re-verifying (a
      // pruned scan of the affected buckets) that no subject row
      // survived, so marker-absent ⇒ the delete must be re-run (every
      // phase is idempotent), marker-present ⇒ the subjects are gone.
      val leftover = spark.read.parquet(path)
        .filter(col("user_bucket").isin(buckets: _*))
        .filter(col("user_id").isin(DeleteTargets: _*))
      require(leftover.isEmpty, "targeted delete left subject rows behind")
      val marker = new org.apache.hadoop.fs.Path(
        path, s"_delete_complete-${DeleteTargets.mkString("_")}")
      fs.create(marker, true).close()
    } finally {
      fs.delete(new org.apache.hadoop.fs.Path(staging), true)
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  val targetedDeleteOracle: String = {
    val targets = DeleteTargets.mkString(", ")
    s"""SELECT user_id % $DeleteBuckets AS user_bucket, count(*) AS n,
      |  count(DISTINCT user_id) AS n_users,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_value
      |FROM events WHERE user_id NOT IN ($targets)
      |GROUP BY 1 ORDER BY user_bucket""".stripMargin
  }

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("s3_paginated_scan", paginatedScanOracle)(paginatedScan),
    QueryDef.sql("s3b_resilient_scan", paginatedScanResilientOracle)(paginatedScanResilient),
    QueryDef.sql("s11_schema_evolution", schemaEvolutionOracle)(schemaEvolution),
    QueryDef.sql("q5_partition_overwrite", partitionOverwriteOracle)(partitionOverwrite),
    QueryDef.sql("s25_snapshot_overwrite", partitionOverwriteOracle)(snapshotOverwrite),
    QueryDef.sql("s23_targeted_delete", targetedDeleteOracle)(targetedDelete))
}
