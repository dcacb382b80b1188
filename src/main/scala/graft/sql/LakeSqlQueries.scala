package graft.sql

import graft.engine.{Graft, QueryDef, Tables}
import graft.ops.lake.Snapshots

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-gated exercises of the SQL surface: the same mutation
  * semantics the DataFrame-API queries pin (s31–s38), driven ENTIRELY
  * through `spark.sql` statements — proving the parser → command →
  * kernel lowering and the registered-name resolution rule end to end
  * against the DuckDB restatement. */
object LakeSqlQueries {

  private def freshTable(prefix: String, dir: String): String =
    Graft.freshDir(prefix + dir.replaceAll("[^A-Za-z0-9.]", "_"))

  private def decSumSql(expr: String): String =
    graft.engine.Exact.decSumSql(expr)

  private def eventsSlim(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "event_type", "value", "event_date")

  /** s39: the s36 clause-MERGE shape plus an UPDATE and a DV DELETE,
    * every statement issued as SQL text: base days ≤ 01-20 commit, the
    * source re-states days 18–25 at +1000, MERGE fires all three clause
    * kinds, UPDATE adds an error penalty, DELETE drops the
    * high-value band (merge-on-read or COW per the kernel's crossover —
    * invisible to the reader), and the final aggregate SELECTs through
    * the resolution rule's merged read. */
  def sqlMergeDelete(spark: SparkSession, dir: String): DataFrame = {
    val table = freshTable("s39-sql-", dir)
    val ev = eventsSlim(spark, dir)
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      ev.filter(col("event_date") <= "2024-01-20"),
      table, "event_date", "event_id"))
    LakeSql.register(spark, "s39t", table, "event_date")
    ev.filter(col("event_date").between("2024-01-18", "2024-01-25"))
      .withColumn("value", col("value") + 1000.0)
      .createOrReplaceTempView("s39_src")

    spark.sql(
      """MERGE INTO s39t AS t USING s39_src AS s ON t.event_id = s.event_id
        |WHEN MATCHED AND s.value <= 1100.0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET value = s.value
        |WHEN NOT MATCHED AND s.event_type <> 'error' THEN INSERT *""".stripMargin)
    spark.sql("UPDATE s39t SET value = value + 500.0 WHERE event_type = 'error'")
    spark.sql("DELETE FROM s39t WHERE value > 1200.0")

    spark.sql(
      s"""SELECT event_date, count(*) AS n, ${decSumSql("value")} AS sum_value
         |FROM s39t GROUP BY event_date ORDER BY event_date""".stripMargin)
  }

  val sqlMergeDeleteOracle: String =
    s"""WITH base AS (
      |  SELECT event_id, event_type, value, CAST(ts AS DATE) AS event_date
      |  FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-20'),
      |src AS (
      |  SELECT event_id, event_type, value + 1000.0 AS value,
      |         CAST(ts AS DATE) AS event_date
      |  FROM events
      |  WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-18' AND DATE '2024-01-25'),
      |merged AS (
      |  SELECT b.event_id, b.event_type,
      |         CASE WHEN s.event_id IS NOT NULL AND s.value > 1100.0
      |              THEN s.value ELSE b.value END AS value,
      |         b.event_date
      |  FROM base b LEFT JOIN src s ON b.event_id = s.event_id
      |  WHERE s.event_id IS NULL OR s.value > 1100.0
      |  UNION ALL
      |  SELECT s.event_id, s.event_type, s.value, s.event_date FROM src s
      |  WHERE s.event_type <> 'error'
      |    AND s.event_id NOT IN (SELECT event_id FROM base)),
      |upd AS (
      |  SELECT event_date,
      |         CASE WHEN event_type = 'error' THEN value + 500.0
      |              ELSE value END AS value
      |  FROM merged)
      |SELECT event_date, count(*) AS n, ${decSumSql("value")} AS sum_value
      |FROM upd WHERE NOT value > 1200.0
      |GROUP BY event_date ORDER BY event_date""".stripMargin

  /** s40: time travel through Spark's own `VERSION AS OF` grammar — v1
    * commits everything, a SQL DELETE (deletion vectors) drops the
    * error events at v2, and ONE statement reads both eras: the pinned
    * v1 aggregate and the live merged read, union-tagged. The v1 side
    * must resurrect nothing less / nothing more than the pre-delete
    * table — the reproducibility anchor a training pipeline pins. */
  def sqlTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val table = freshTable("s40-sql-", dir)
    val ev = eventsSlim(spark, dir)
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      ev, table, "event_date", "event_id"))
    LakeSql.register(spark, "s40t", table, "event_date")
    spark.sql("DELETE FROM s40t WHERE event_type = 'error'")

    spark.sql(
      s"""SELECT era, event_date, n, sum_value FROM (
         |  SELECT 'pinned' AS era, event_date, count(*) AS n,
         |         ${decSumSql("value")} AS sum_value
         |  FROM s40t VERSION AS OF 1 GROUP BY event_date
         |  UNION ALL
         |  SELECT 'live' AS era, event_date, count(*) AS n,
         |         ${decSumSql("value")} AS sum_value
         |  FROM s40t GROUP BY event_date
         |) ORDER BY era, event_date""".stripMargin)
  }

  val sqlTimeTravelOracle: String =
    s"""SELECT era, event_date, n, sum_value FROM (
      |  SELECT 'pinned' AS era, CAST(ts AS DATE) AS event_date,
      |         count(*) AS n, ${decSumSql("value")} AS sum_value
      |  FROM events GROUP BY 2
      |  UNION ALL
      |  SELECT 'live' AS era, CAST(ts AS DATE) AS event_date,
      |         count(*) AS n, ${decSumSql("value")} AS sum_value
      |  FROM events WHERE event_type <> 'error' GROUP BY 2
      |) ORDER BY era, event_date""".stripMargin

  /** s41: the maintenance verbs as one SQL session — two half-commits
    * fragment every day tag, a bad SQL UPDATE doubles a band (v3), SQL
    * RESTORE rolls it back (v4), SQL OPTIMIZE merges the fragments
    * (v5), SQL VACUUM reclaims the bad rewrite's files — and the final
    * SELECT must be EXACTLY the original data: maintenance is layout,
    * never semantics. */
  def sqlMaintenance(spark: SparkSession, dir: String): DataFrame = {
    val table = freshTable("s41-sql-", dir)
    val ev = eventsSlim(spark, dir)
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      ev.filter(col("event_id") % 2 === 0), table, "event_date", "event_id"))
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      ev.filter(col("event_id") % 2 === 1), table, "event_date", "event_id"))
    LakeSql.register(spark, "s41t", table, "event_date")

    spark.sql(
      """UPDATE s41t SET value = value * 2.0
        |WHERE event_date BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
        |""".stripMargin)
    spark.sql("RESTORE s41t TO VERSION AS OF 2")
    spark.sql("OPTIMIZE s41t")
    spark.sql("VACUUM s41t")

    spark.sql(
      s"""SELECT event_date, count(*) AS n, ${decSumSql("value")} AS sum_value
         |FROM s41t GROUP BY event_date ORDER BY event_date""".stripMargin)
  }

  val sqlMaintenanceOracle: String =
    s"""SELECT CAST(ts AS DATE) AS event_date, count(*) AS n,
      |  ${decSumSql("value")} AS sum_value
      |FROM events GROUP BY 1 ORDER BY event_date""".stripMargin

  /** s42: CHECK constraints gate the write boundary — a constraint is
    * added over the base days, a violating INSERT (negated values) MUST
    * be rejected leaving zero trace, a conforming INSERT lands, and the
    * final aggregate equals the full restatement — which it can only do
    * if the rejected batch left the table bit-identical. */
  def sqlConstraints(spark: SparkSession, dir: String): DataFrame = {
    val table = freshTable("s42-sql-", dir)
    val ev = eventsSlim(spark, dir)
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      ev.filter(col("event_date") <= "2024-01-20"),
      table, "event_date", "event_id"))
    LakeSql.register(spark, "s42t", table, "event_date")
    ev.filter(col("event_date") > "2024-01-20").createOrReplaceTempView("s42_src")

    spark.sql(
      "ALTER GRAFT TABLE s42t ADD CONSTRAINT vals CHECK (value >= 0.0)")
    val rejected =
      try {
        spark.sql(
          """INSERT INTO s42t SELECT event_id + 1000000000, event_type,
            |-value - 1.0, event_date FROM s42_src""".stripMargin)
        false
      } catch { case _: Exception => true }
    require(rejected, "s42: the violating INSERT must be rejected")
    spark.sql(
      """INSERT INTO s42t SELECT event_id, event_type, value, event_date
        |FROM s42_src""".stripMargin)

    spark.sql(
      s"""SELECT event_date, count(*) AS n, ${decSumSql("value")} AS sum_value
         |FROM s42t GROUP BY event_date ORDER BY event_date""".stripMargin)
  }

  val sqlConstraintsOracle: String =
    s"""SELECT CAST(ts AS DATE) AS event_date, count(*) AS n,
      |  ${decSumSql("value")} AS sum_value
      |FROM events GROUP BY 1 ORDER BY event_date""".stripMargin

  /** s43: schema evolution composed with DML, all through SQL text —
    * RENAME COLUMN value→amount and DROP COLUMN note are metadata-only
    * commits, then a MERGE with a MULTI-CONJUNCT ON (composite key) and
    * an EXPLICIT-COLUMN INSERT lands against the renamed schema: the
    * parser's key extraction, the kernel's logical-name resolution on
    * the restage path, and the insert projection's NULL-fill/cast all
    * have to agree for the final aggregate to match the restatement. */
  def sqlRenameMerge(spark: SparkSession, dir: String): DataFrame = {
    val table = freshTable("s43-sql-", dir)
    val ev = eventsSlim(spark, dir)
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      ev.filter(col("event_date") <= "2024-01-20").withColumn("note", lit("x")),
      table, "event_date", "event_id"))
    LakeSql.register(spark, "s43t", table, "event_date")
    ev.filter(col("event_date").between("2024-01-18", "2024-01-25"))
      .withColumn("amount", col("value") + 1000.0).drop("value")
      .createOrReplaceTempView("s43_src")

    spark.sql("ALTER GRAFT TABLE s43t RENAME COLUMN value TO amount")
    spark.sql("ALTER GRAFT TABLE s43t DROP COLUMN note")
    spark.sql(
      """MERGE INTO s43t AS t USING s43_src AS s
        |ON t.event_id = s.event_id AND t.event_type = s.event_type
        |WHEN MATCHED THEN UPDATE SET amount = s.amount
        |WHEN NOT MATCHED THEN INSERT (event_id, event_type, amount, event_date)
        |VALUES (s.event_id, s.event_type, s.amount + 10.0, s.event_date)""".stripMargin)

    spark.sql(
      s"""SELECT event_date, count(*) AS n, ${decSumSql("amount")} AS sum_amount
         |FROM s43t GROUP BY event_date ORDER BY event_date""".stripMargin)
  }

  val sqlRenameMergeOracle: String =
    s"""WITH base AS (
      |  SELECT event_id, event_type, value AS amount,
      |         CAST(ts AS DATE) AS event_date
      |  FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-20'),
      |src AS (
      |  SELECT event_id, event_type, value + 1000.0 AS amount,
      |         CAST(ts AS DATE) AS event_date
      |  FROM events
      |  WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-18' AND DATE '2024-01-25'),
      |merged AS (
      |  SELECT b.event_id, b.event_type,
      |         CASE WHEN s.event_id IS NOT NULL THEN s.amount
      |              ELSE b.amount END AS amount,
      |         b.event_date
      |  FROM base b LEFT JOIN src s
      |    ON b.event_id = s.event_id AND b.event_type = s.event_type
      |  UNION ALL
      |  SELECT s.event_id, s.event_type, s.amount + 10.0, s.event_date
      |  FROM src s
      |  WHERE NOT EXISTS (SELECT 1 FROM base b
      |    WHERE b.event_id = s.event_id AND b.event_type = s.event_type))
      |SELECT event_date, count(*) AS n, ${decSumSql("amount")} AS sum_amount
      |FROM merged GROUP BY event_date ORDER BY event_date""".stripMargin

  /** s44: the FULL Delta MERGE trio as one sync statement — "make days
    * ≥ 15 of the table look exactly like the source": matched rows
    * update, new rows insert, and stale target rows (no source match)
    * DELETE under the BY SOURCE clause's scoping condition. Rows before
    * the scope date must be untouched — the condition is what keeps the
    * whole-table quantifier affordable, and the oracle proves the
    * boundary. */
  def sqlMergeSync(spark: SparkSession, dir: String): DataFrame = {
    val table = freshTable("s44-sql-", dir)
    val ev = eventsSlim(spark, dir)
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      ev.filter(col("event_date") <= "2024-01-20"),
      table, "event_date", "event_id"))
    LakeSql.register(spark, "s44t", table, "event_date")
    ev.filter(col("event_date").between("2024-01-18", "2024-01-25"))
      .withColumn("value", col("value") + 1000.0)
      .createOrReplaceTempView("s44_src")

    spark.sql(
      """MERGE INTO s44t AS t USING s44_src AS s ON t.event_id = s.event_id
        |WHEN MATCHED THEN UPDATE SET value = s.value
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE AND t.event_date >= DATE '2024-01-15'
        |THEN DELETE""".stripMargin)

    spark.sql(
      s"""SELECT event_date, count(*) AS n, ${decSumSql("value")} AS sum_value
         |FROM s44t GROUP BY event_date ORDER BY event_date""".stripMargin)
  }

  val sqlMergeSyncOracle: String =
    s"""WITH base AS (
      |  SELECT event_id, event_type, value, CAST(ts AS DATE) AS event_date
      |  FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-20'),
      |src AS (
      |  SELECT event_id, event_type, value + 1000.0 AS value,
      |         CAST(ts AS DATE) AS event_date
      |  FROM events
      |  WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-18' AND DATE '2024-01-25'),
      |merged AS (
      |  SELECT b.event_id, b.event_type,
      |         CASE WHEN s.event_id IS NOT NULL THEN s.value
      |              ELSE b.value END AS value,
      |         b.event_date
      |  FROM base b LEFT JOIN src s ON b.event_id = s.event_id
      |  WHERE s.event_id IS NOT NULL OR b.event_date < DATE '2024-01-15'
      |  UNION ALL
      |  SELECT s.event_id, s.event_type, s.value, s.event_date FROM src s
      |  WHERE s.event_id NOT IN (SELECT event_id FROM base))
      |SELECT event_date, count(*) AS n, ${decSumSql("value")} AS sum_value
      |FROM merged GROUP BY event_date ORDER BY event_date""".stripMargin

  /** s45: METADATA-ONLY COUNT — `count(*)` over the registered table
    * folds to a constant from the manifest's per-entry `rows` props
    * (the Delta OptimizeMetadataOnlyDeltaQuery shape; PlanRulesSpec
    * pins that the optimized plan is a LocalRelation with NO scan),
    * while the filtered count beside it must NOT fold and still scans.
    * Both land in one row the oracle restates — the fold has to be
    * invisible in the answer, visible only in the plan. */
  def sqlMetaCount(spark: SparkSession, dir: String): DataFrame = {
    val table = freshTable("s45-sql-", dir)
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      eventsSlim(spark, dir), table, "event_date", "event_id"))
    LakeSql.register(spark, "s45t", table, "event_date")
    spark.sql(
      """SELECT (SELECT count(*) FROM s45t) AS n_all,
        |       (SELECT count(*) FROM s45t WHERE event_type = 'click') AS n_click
        |""".stripMargin)
  }

  val sqlMetaCountOracle: String =
    """SELECT (SELECT count(*) FROM events) AS n_all,
      |       (SELECT count(*) FROM events WHERE event_type = 'click') AS n_click
      |""".stripMargin

  /** s46: NULL-COUNT + PREFIX data skipping under the oracle gate — a
    * nullable label column (`nullif(event_type, 'error')`) is the
    * string stats column, so every file carries `nulls.<col>` (+
    * bounds where derivable) and the three predicate shapes this round
    * taught [[graft.ops.lake.Pruning]] — `IS NULL`, `IS NOT NULL`,
    * `LIKE 'p%'` — all prune manifest entries on the SQL path, and the
    * bare `count(label)` folds to Σ(rows − nulls) driver-side
    * ([[graft.plans.MetadataCountRule]], real nonzero null counts).
    * The oracle proves the skipping never drops a matching row:
    * unsound pruning shows up as a count/sum mismatch, not a plan
    * detail. */
  def sqlNullPrefix(spark: SparkSession, dir: String): DataFrame = {
    val table = freshTable("s46-sql-", dir)
    val ev = eventsSlim(spark, dir)
      .withColumn("label", expr("nullif(event_type, 'error')"))
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      ev, table, "event_date", "label"))
    LakeSql.register(spark, "s46t", table, "event_date")
    spark.sql(
      s"""SELECT
         |  (SELECT count(*) FROM s46t WHERE label IS NULL) AS n_null,
         |  (SELECT count(label) FROM s46t) AS n_labeled,
         |  (SELECT ${decSumSql("value")} FROM s46t WHERE label IS NOT NULL)
         |    AS sum_labeled,
         |  (SELECT count(*) FROM s46t WHERE label LIKE 'cl%') AS n_cl,
         |  (SELECT count(*) FROM s46t
         |   WHERE label IS NOT NULL AND label LIKE 'zzz%') AS n_none
         |""".stripMargin)
  }

  val sqlNullPrefixOracle: String =
    s"""WITH t AS (SELECT nullif(event_type, 'error') AS label, value FROM events)
      |SELECT
      |  (SELECT count(*) FROM t WHERE label IS NULL) AS n_null,
      |  (SELECT count(label) FROM t) AS n_labeled,
      |  (SELECT ${decSumSql("value")} FROM t WHERE label IS NOT NULL)
      |    AS sum_labeled,
      |  (SELECT count(*) FROM t WHERE label LIKE 'cl%') AS n_cl,
      |  (SELECT count(*) FROM t
      |   WHERE label IS NOT NULL AND label LIKE 'zzz%') AS n_none
      |""".stripMargin

  /** s47: SHALLOW CLONE as an isolation boundary, all through SQL — the
    * clone is created metadata-only (zero data copied; the spec level
    * pins that), then BOTH tables diverge: a DELETE on the clone (whose
    * deletion vector lands under the clone's own root, leaving the
    * shared source files byte-identical) and an UPDATE on the source
    * (whose COW/DV rewrite must be invisible through the clone's
    * pinned entries). The union-tagged aggregate proves the divergence
    * isolation in BOTH directions against the DuckDB restatement. */
  def sqlShallowClone(spark: SparkSession, dir: String): DataFrame = {
    val srcT = freshTable("s47-src-", dir)
    val dstT = freshTable("s47-dst-", dir)
    val ev = eventsSlim(spark, dir)
    Snapshots.commitAll(srcT, Snapshots.stageWithStats(
      ev.filter(col("event_date") <= "2024-01-20"),
      srcT, "event_date", "event_id"))
    LakeSql.register(spark, "s47src", srcT, "event_date")
    spark.sql(s"CREATE GRAFT TABLE s47dst SHALLOW CLONE s47src LOCATION '$dstT'")
    spark.sql("DELETE FROM s47dst WHERE event_type = 'error'")
    spark.sql("UPDATE s47src SET value = value + 100.0 WHERE event_type = 'click'")
    spark.sql(
      s"""SELECT side, event_date, n, sum_value FROM (
         |  SELECT 'src' AS side, event_date, count(*) AS n,
         |         ${decSumSql("value")} AS sum_value
         |  FROM s47src GROUP BY event_date
         |  UNION ALL
         |  SELECT 'clone' AS side, event_date, count(*) AS n,
         |         ${decSumSql("value")} AS sum_value
         |  FROM s47dst GROUP BY event_date
         |) ORDER BY side, event_date""".stripMargin)
  }

  val sqlShallowCloneOracle: String =
    s"""WITH base AS (
      |  SELECT event_id, event_type, value, CAST(ts AS DATE) AS event_date
      |  FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-20')
      |SELECT side, event_date, n, sum_value FROM (
      |  SELECT 'src' AS side, event_date, count(*) AS n,
      |         ${decSumSql(
           "CASE WHEN event_type = 'click' THEN value + 100.0 ELSE value END")}
      |    AS sum_value
      |  FROM base GROUP BY event_date
      |  UNION ALL
      |  SELECT 'clone' AS side, event_date, count(*) AS n,
      |         ${decSumSql("value")} AS sum_value
      |  FROM base WHERE event_type <> 'error' GROUP BY event_date
      |) ORDER BY side, event_date""".stripMargin

  /** s51: INSERT OVERWRITE (the Delta replaceWhere shape) — a scoped
    * overwrite atomically replaces exactly the two named partition
    * tags with the query's rescaled restatement; every other day's
    * file carries by name (spec-pinned), and an out-of-scope
    * replacement row aborts the statement (spec-pinned). The final
    * aggregate reads through the resolution rule's merged scan. */
  def sqlInsertOverwrite(spark: SparkSession, dir: String): DataFrame = {
    val table = freshTable("s51-sql-", dir)
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      eventsSlim(spark, dir).filter(col("event_date") <= "2024-01-20"),
      table, "event_date", "event_id"))
    LakeSql.register(spark, "s51t", table, "event_date")
    spark.sql(
      """INSERT OVERWRITE s51t
        |WHERE event_date IN ('2024-01-15', '2024-01-16')
        |SELECT event_id, event_type, value * 2.0, event_date FROM s51t
        |WHERE event_date IN ('2024-01-15', '2024-01-16')
        |  AND event_type <> 'error'""".stripMargin)
    spark.sql(
      s"""SELECT event_date, count(*) AS n, ${decSumSql("value")} AS sum_value
         |FROM s51t GROUP BY event_date ORDER BY event_date""".stripMargin)
  }

  val sqlInsertOverwriteOracle: String =
    s"""WITH base AS (
      |  SELECT event_id, event_type, value, CAST(ts AS DATE) AS event_date
      |  FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-20'),
      |final AS (
      |  SELECT event_id, event_type, value, event_date FROM base
      |  WHERE event_date NOT IN (DATE '2024-01-15', DATE '2024-01-16')
      |  UNION ALL
      |  SELECT event_id, event_type, value * 2.0, event_date FROM base
      |  WHERE event_date IN (DATE '2024-01-15', DATE '2024-01-16')
      |    AND event_type <> 'error')
      |SELECT event_date, count(*) AS n, ${decSumSql("value")} AS sum_value
      |FROM final GROUP BY event_date ORDER BY event_date""".stripMargin

  /** s52: the s48 CDC-mirror flow driven ENTIRELY through SQL — every
    * mutation (UPDATE, DV DELETE, three-clause MERGE) and both
    * catch-ups (`APPLY CHANGES INTO`) are statements, and the final
    * aggregate reads the MIRROR through the resolution rule; proves
    * the parser → command → ChangeApply lowering end to end against
    * the same DuckDB restatement as the DataFrame-API twin. */
  def sqlApplyChanges(spark: SparkSession, dir: String): DataFrame = {
    val srcT = freshTable("s52-src-", dir)
    val tgtT = freshTable("s52-tgt-", dir)
    Snapshots.commitAll(srcT, Snapshots.stageWithStats(
      eventsSlim(spark, dir).filter(col("event_date") <= "2024-01-20"),
      srcT, "event_date", "event_id"))                                 // v1
    LakeSql.register(spark, "s52src", srcT, "event_date")
    LakeSql.register(spark, "s52tgt", tgtT, "event_date")
    spark.sql("APPLY CHANGES INTO s52tgt FROM s52src KEYS (event_id)")
    spark.sql("UPDATE s52src SET value = value + 100.0 WHERE event_type = 'click'")
    spark.sql("DELETE FROM s52src WHERE event_type = 'error'")
    eventsSlim(spark, dir)
      .filter(col("event_date").between("2024-01-18", "2024-01-25"))
      .withColumn("value", col("value") + 1000.0)
      .createOrReplaceTempView("s52_merge_src")
    spark.sql(
      """MERGE INTO s52src t USING s52_merge_src s ON t.event_id = s.event_id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.sql("APPLY CHANGES INTO s52tgt FROM s52src KEYS (event_id)")
    spark.sql(
      s"""SELECT event_date, count(*) AS n, ${decSumSql("value")} AS sum_value
         |FROM s52tgt GROUP BY event_date ORDER BY event_date""".stripMargin)
  }

  lazy val sqlApplyChangesOracle: String =
    graft.ops.lake.ChangeApply.cdcMirrorOracle

  /** s54: the WHOLE medallion driven by SQL statements alone — the
    * "a SQL-only user can run the pipeline" claim, end to end:
    * bronze = CTAS off the raw view (stats-clustered), silver = CTAS
    * cleaning bronze, late data lands in bronze via INSERT INTO, a
    * MERGE catch-up folds it into silver (updates the overlap band,
    * inserts the new days), gold = CTAS aggregate, and the answer
    * SELECTs from gold. Every hop — CTAS staging/registration, INSERT
    * restage, MERGE clause lowering, resolution-rule reads — sits
    * inside one DuckDB-restated oracle. */
  def sqlMedallion(spark: SparkSession, dir: String): DataFrame = {
    val bronzeT = freshTable("s54-bronze-", dir)
    val silverT = freshTable("s54-silver-", dir)
    val goldT = freshTable("s54-gold-", dir)
    eventsSlim(spark, dir).createOrReplaceTempView("s54_raw")

    spark.sql(
      s"""CREATE GRAFT TABLE s54b LOCATION '$bronzeT'
         |PARTITIONED BY (event_date) STATS BY (event_id)
         |AS SELECT * FROM s54_raw WHERE event_date <= DATE '2024-01-20'""".stripMargin)
    spark.sql(
      s"""CREATE GRAFT TABLE s54s LOCATION '$silverT'
         |PARTITIONED BY (event_date) STATS BY (event_id)
         |AS SELECT event_id, event_type, value, event_date
         |FROM s54b WHERE event_type <> 'error'""".stripMargin)
    spark.sql(
      """INSERT INTO s54b
        |SELECT * FROM s54_raw
        |WHERE event_date BETWEEN DATE '2024-01-21' AND DATE '2024-01-25'""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW s54_fix AS
        |SELECT event_id, event_type, value + 100.0 AS value, event_date
        |FROM s54b
        |WHERE event_type <> 'error' AND event_date >= DATE '2024-01-18'""".stripMargin)
    spark.sql(
      """MERGE INTO s54s AS t USING s54_fix AS s ON t.event_id = s.event_id
        |WHEN MATCHED THEN UPDATE SET value = s.value
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.sql(
      s"""CREATE GRAFT TABLE s54g LOCATION '$goldT'
         |PARTITIONED BY (event_date)
         |AS SELECT event_date, count(*) AS n, ${decSumSql("value")} AS sum_value
         |FROM s54s GROUP BY event_date""".stripMargin)
    spark.sql("SELECT event_date, n, sum_value FROM s54g ORDER BY event_date")
  }

  lazy val sqlMedallionOracle: String =
    s"""WITH silver AS (
      |  SELECT event_id, event_type,
      |         CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-18'
      |              THEN value + 100.0 ELSE value END AS value,
      |         CAST(ts AS DATE) AS event_date
      |  FROM events
      |  WHERE event_type <> 'error' AND CAST(ts AS DATE) <= DATE '2024-01-25')
      |SELECT event_date, count(*) AS n, ${decSumSql("value")} AS sum_value
      |FROM silver GROUP BY event_date ORDER BY event_date""".stripMargin

  /** s60: DYNAMIC FILE PRUNING on the SQL surface under the oracle gate
    * (r14, the r13 verdict's top item) — a 320-file key-clustered lake
    * fact joins a dim its own filter cut to ~0.2% of the key space,
    * through PLAIN `spark.sql` with zero graft-specific syntax. The
    * [[graft.plans.SqlDfpRule]] pre-CBO rule collects the dim's runtime
    * keys and plants them as a fact-side filter, which Spark's own
    * pushdown carries into the manifest prune — and the joined
    * aggregate must equal DuckDB's full join row-for-row (the prune may
    * only ever drop provably-unmatched files). The opened-files claim
    * lives in SqlDfpSpec; this query pins correctness. The fact is
    * committed at 320 files so it clears the rule's cost gate naturally
    * (no conf override leaks into sibling queries). */
  def sqlDfpJoin(spark: SparkSession, dir: String): DataFrame = {
    val table = freshTable("s60-sql-", dir)
    val ev = eventsSlim(spark, dir)
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      ev, table, "event_date", "event_id", buckets = 320))
    LakeSql.register(spark, "s60t", table, "event_date")
    ev.filter(col("event_id") % 500 === 0)
      .select(col("event_id").as("dim_id"),
        concat(lit("seg-"), (col("event_id") % 3).cast("string")).as("segment"))
      .distinct()
      .createOrReplaceTempView("s60_dim")
    spark.sql(
      s"""SELECT d.segment, count(*) AS n, ${decSumSql("f.value")} AS sum_value
         |FROM s60t f JOIN s60_dim d ON f.event_id = d.dim_id
         |GROUP BY d.segment ORDER BY d.segment""".stripMargin)
  }

  val sqlDfpJoinOracle: String =
    """WITH dim AS (
      |  SELECT DISTINCT event_id AS dim_id,
      |         'seg-' || CAST(event_id % 3 AS VARCHAR) AS segment
      |  FROM events WHERE event_id % 500 = 0)
      |SELECT segment, count(*) AS n,
      |       CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_value
      |FROM events e JOIN dim d ON e.event_id = d.dim_id
      |GROUP BY segment ORDER BY segment""".stripMargin

  /** s67: the over-cap SQL DFP join with the BLOOM conjunct (r14, the
    * s66 twin on the SQL front door) — the dim's ~14% key coverage is
    * forced over a 50-key cap, the planted range keeps nearly every
    * file of the dense-key fact, and the bloom row filter (folded into
    * the same agg as the range) is the only pre-shuffle cut. Conf
    * window with restore: Verify runs queries sequentially, and the
    * plan is FORCED inside the window (the pre-CBO rule runs at
    * optimization time, which is lazy — returning an unoptimized frame
    * would let the restored confs erase the shape under test). */
  def sqlBloomDfpJoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.SqlDfp
    val table = freshTable("s67-sql-", dir)
    val ev = eventsSlim(spark, dir)
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      ev, table, "event_date", "event_id", buckets = 320))
    LakeSql.register(spark, "s67t", table, "event_date")
    ev.filter(col("event_id") % 7 === 0)
      .select(col("event_id").as("dim_id"),
        concat(lit("seg-"), (col("event_id") % 3).cast("string")).as("segment"))
      .distinct()
      .createOrReplaceTempView("s67_dim")
    val keys = Seq(SqlDfp.MaxKeysKey, SqlDfp.BloomKeysKey)
    val old = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set(SqlDfp.MaxKeysKey, "50")
    spark.conf.set(SqlDfp.BloomKeysKey, "20000")
    try {
      val df = spark.sql(
        s"""SELECT d.segment, count(*) AS n, ${decSumSql("f.value")} AS sum_value
           |FROM s67t f JOIN s67_dim d ON f.event_id = d.dim_id
           |GROUP BY d.segment ORDER BY d.segment""".stripMargin)
      df.queryExecution.optimizedPlan // rule fires inside the window
      df
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("s60_sql_dfp_join", sqlDfpJoinOracle)(sqlDfpJoin),
    QueryDef.sql("s67_sql_bloom_dfp_join",
      graft.ops.lake.DynamicFilter.bloomDfpJoinOracle)(sqlBloomDfpJoin),
    QueryDef.sql("s54_sql_medallion", sqlMedallionOracle)(sqlMedallion),
    QueryDef.sql("s52_sql_apply_changes", sqlApplyChangesOracle)(sqlApplyChanges),
    QueryDef.sql("s51_sql_insert_overwrite", sqlInsertOverwriteOracle)(sqlInsertOverwrite),
    QueryDef.sql("s45_sql_meta_count", sqlMetaCountOracle)(sqlMetaCount),
    QueryDef.sql("s46_sql_null_prefix", sqlNullPrefixOracle)(sqlNullPrefix),
    QueryDef.sql("s47_sql_shallow_clone", sqlShallowCloneOracle)(sqlShallowClone),
    QueryDef.sql("s39_sql_merge_delete", sqlMergeDeleteOracle)(sqlMergeDelete),
    QueryDef.sql("s40_sql_time_travel", sqlTimeTravelOracle)(sqlTimeTravel),
    QueryDef.sql("s41_sql_maintenance", sqlMaintenanceOracle)(sqlMaintenance),
    QueryDef.sql("s42_sql_constraints", sqlConstraintsOracle)(sqlConstraints),
    QueryDef.sql("s43_sql_rename_merge", sqlRenameMergeOracle)(sqlRenameMerge),
    QueryDef.sql("s44_sql_merge_sync", sqlMergeSyncOracle)(sqlMergeSync))
}
