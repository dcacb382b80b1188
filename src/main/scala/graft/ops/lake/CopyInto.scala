package graft.ops.lake

import graft.engine.{Exact, Graft, QueryDef, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** COPY INTO — IDEMPOTENT incremental file ingestion (the Delta verb):
  * load a directory of files into a snapshot table such that re-running
  * the same statement ingests ONLY files that arrived since the last
  * run, and a crash anywhere never duplicates a batch.
  *
  * Spark-first construction — no bespoke file ledger:
  *   - WHICH files are new is Spark's own file-source checkpoint state
  *     (`readStream` over the directory, drained with AvailableNow):
  *     the battle-tested seen-files log, kept under the table root
  *     (`<table>/_copy/<source-hash>/`) so it travels with the table
  *     and a second source directory gets its own cursor;
  *   - EXACTLY-ONCE across the crash window between a batch's commit
  *     and the checkpoint write is the applied-batch bookkeeping:
  *     `tbl.copy.applied.<source-hash> = batchId` rides the SAME
  *     snapshot commit as the batch's rows. INHERITED (`tbl.`
  *     namespace), deliberately unlike the mv./cdc. markers — copy
  *     progress must survive arbitrary unrelated commits (DML,
  *     OPTIMIZE) between runs, because a replayed file-source batch
  *     keeps its original batchId and must be recognizable forever,
  *     not just until the next commit.
  *
  * The checkpoint is PART OF THE TABLE: deleting `<table>/_copy`
  * re-bootstraps the cursor and re-reads everything as batch 0 — the
  * bookkeeping then skips it wholesale (applied ≥ 0), so stale-cursor
  * recovery never duplicates, but files added after the wipe land in
  * that same batch 0 and would be skipped with it. Don't delete the
  * cursor; it costs a few bytes per ingested file.
  *
  * Scale: each run is one AvailableNow drain — new files only, staged
  * through the size-budgeted rebalance, committed as ONE snapshot per
  * micro-batch with stats/bloom decoration preserved
  * ([[Snapshots.restageLike]]). A no-new-files run commits nothing.
  *
  * Ref analog: `ingest_binance_last_3_days.py:141-144` re-loads whole
  * day prefixes on every run — this is the incremental form. */
object CopyInto {

  private def md5h(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)

  /** Cursor identity for a source directory — CANONICALIZED
    * (absolute, symlink- and dot-segment-free), so `/data/in`,
    * `/data/in/` and a relative spelling of the same directory share
    * ONE cursor: spelling variance must not mint a fresh seen-files
    * log and silently re-ingest everything. MIGRATION: a table whose
    * cursor was recorded pre-canonicalization under THIS spelling's
    * raw hash keeps that identity (switching it to the canonical key
    * would orphan the old cursor and re-ingest the whole directory —
    * the exact failure the canonicalization prevents; a legacy cursor
    * re-run under a DIFFERENT spelling still mints the canonical key,
    * the pre-r12 behavior). */
  private[lake] def sourceHash(table: String, srcDir: String): String = {
    val canon = md5h(new java.io.File(srcDir).getCanonicalPath)
    val raw = md5h(srcDir)
    if (raw != canon && Snapshots.currentVersion(table) >= 1 &&
        Snapshots.snapshotProps(table, Snapshots.currentVersion(table))
          .contains(s"tbl.copy.applied.$raw")) raw
    else canon
  }

  /** Applied-batch prop key for `srcDir`'s cursor. */
  private[lake] def appliedKey(table: String, srcDir: String): String =
    s"tbl.copy.applied.${sourceHash(table, srcDir)}"

  /** Last file-source batch id committed from `srcDir` (−1 = none). */
  def appliedBatch(table: String, srcDir: String): Long =
    Snapshots.snapshotProps(table, Snapshots.currentVersion(table))
      .get(appliedKey(table, srcDir)).map(_.toLong).getOrElse(-1L)

  /** RESTORE interplay: rolling the table back across copy commits
    * rewinds the cursor WITH the rows (rollback restores the old
    * props), but the file-source CHECKPOINT does not rewind — it still
    * considers the rolled-back batches' files seen, so a plain re-run
    * would silently never re-ingest them. After such a rollback, reset
    * the cursor: drops both the checkpoint and the applied-batch prop,
    * so the next [[copyInto]] re-reads the whole directory as batch 0
    * against a table that no longer holds any of its rows. Only sound
    * when the rollback removed EVERY copy commit from this source —
    * resetting a cursor whose rows partially survive duplicates them
    * (the same discipline Delta documents for COPY INTO + RESTORE). */
  def resetCursor(table: String, srcDir: String): Long = {
    def deleteDir(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(deleteDir); f.delete()
    }
    deleteDir(new java.io.File(table, s"_copy/${sourceHash(table, srcDir)}"))
    Snapshots.commitProps(table, Map.empty, unset = Set(appliedKey(table, srcDir)))
  }

  /** Run one COPY INTO pass: drain every not-yet-seen file under
    * `srcDir` into `table`. Returns the table's version after the
    * drain (unchanged when nothing new). `format` is any Spark batch/
    * stream file format (parquet, csv, json); csv/json options ride
    * `options` (e.g. header -> true). */
  def copyInto(spark: SparkSession, table: String, srcDir: String,
               tagCol: String, format: String = "parquet",
               options: Map[String, String] = Map.empty): Long = {
    // schema pinned from a batch read of the CURRENT directory — the
    // file-source contract (streams need an explicit schema)
    val schema = spark.read.format(format).options(options).load(srcDir).schema
    val key = appliedKey(table, srcDir)
    val stream = spark.readStream.schema(schema).format(format)
      .options(options).load(srcDir)
    val q = stream.writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        // idempotent replay guard: a crash between this commit and the
        // checkpoint write replays the SAME batchId — recognized here
        // through the prop that rode the first commit
        if (batchId > appliedBatch(table, srcDir) && !df.isEmpty) {
          Snapshots.commitAll(table,
            Snapshots.restageLike(spark, df, table, tagCol),
            props = Map(key -> batchId.toString))
          ()
        }
      }
      .option("checkpointLocation", s"$table/_copy/${sourceHash(table, srcDir)}")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    Snapshots.currentVersion(table)
  }

  // ---- oracle-gated exercise ---------------------------------------

  private def freshTable(prefix: String, dir: String): String =
    Graft.freshDir(prefix + dir.replaceAll("[^A-Za-z0-9.]", "_"))

  /** s53: COPY INTO under the oracle gate — two source files land, the
    * first copy ingests both; a RE-RUN ingests nothing (idempotency in
    * the answer: rows would double); a third file lands and an
    * unrelated DELETE mutates the table in between; the second copy
    * ingests ONLY the new file. The final aggregate must equal the
    * DuckDB restatement of exactly that history. */
  def copyIntoFlow(spark: SparkSession, dir: String): DataFrame = {
    val table = freshTable("s53-tbl-", dir)
    val src = Graft.freshDir("s53-src-" + dir.replaceAll("[^A-Za-z0-9.]", "_"))
    val ev = Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "event_type", "value", "event_date")
    ev.filter(col("event_date") <= "2024-01-10")
      .write.mode("append").parquet(src)                  // files, wave 1
    ev.filter(col("event_date").between("2024-01-11", "2024-01-15"))
      .write.mode("append").parquet(src)                  // files, wave 1
    CopyInto.copyInto(spark, table, src, "event_date")
    CopyInto.copyInto(spark, table, src, "event_date")    // re-run: no-op
    Mutations.deleteWhere(spark, table,
      col("event_type") === "error")                      // unrelated DML
    ev.filter(col("event_date").between("2024-01-16", "2024-01-20"))
      .write.mode("append").parquet(src)                  // late arrivals
    CopyInto.copyInto(spark, table, src, "event_date")    // only the new file
    Mutations.readMerged(spark, table)
      .groupBy("event_date")
      .agg(count(lit(1)).as("n"), Exact.decSum(col("value")).as("sum_value"))
      .orderBy("event_date")
  }

  lazy val copyIntoFlowOracle: String =
    """WITH base AS (
      |  SELECT event_type, value, CAST(ts AS DATE) AS event_date
      |  FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-20'),
      |final AS (
      |  SELECT * FROM base
      |  WHERE event_date > DATE '2024-01-15' OR event_type <> 'error')
      |SELECT event_date, count(*) AS n,
      |       CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_value
      |FROM final GROUP BY event_date ORDER BY event_date""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("s53_copy_into", copyIntoFlowOracle)(copyIntoFlow))
}
