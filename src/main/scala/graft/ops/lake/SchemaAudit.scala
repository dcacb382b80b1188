package graft.ops.lake

import graft.engine.{Graft, QueryDef, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** SCHEMA DRIFT AUDIT — column-level evolution history from the
  * snapshot log alone: for every version in a range, what was ADDED,
  * DROPPED, RENAMED, or RETYPED relative to the previous existing
  * version. The governance question a 100 TB lake answers constantly
  * ("when did this column appear / vanish / change meaning?"), and the
  * log already holds everything needed: the name-keyed union schema
  * rides each commit ([[Snapshots.SchemaDdlProp]], the schema-in-the-
  * log move) and renames/drops are version-scoped mapping props — so
  * the audit is a pure DRIVER walk over props, zero data or footer IO
  * on schema-logged tables (pre-log versions fall back to one
  * footer-union read each).
  *
  * Diffing works at PHYSICAL-name granularity — the stable column
  * identity name mapping guarantees — so a rename reports as RENAME
  * (old logical → new logical), never as the drop+add a logical-name
  * diff would fabricate. Reported names are the LOGICAL names users
  * saw at each version.
  *
  * Ref analog: none — the reference's only schema management is
  * BigQuery autodetect (SURVEY §2.2 S11); drift there is discovered in
  * production, not audited from a log. */
object SchemaAudit {

  /** (physical name → (logical name, type DDL)) at version `v`,
    * dropped columns excluded. Prefers the log-recorded union schema;
    * falls back to the footer-union read for pre-schema-log versions.
    * Version 0 is the empty table. */
  private def fieldsAt(spark: SparkSession, table: String,
                       v: Long): Map[String, (String, String)] = {
    if (v == 0) return Map.empty
    val (ren, dropped) = Snapshots.schemaMapping(table, v)
    val physical: Option[StructType] =
      Snapshots.snapshotProps(table, v).get(Snapshots.SchemaDdlProp)
        .flatMap(ddl => scala.util.Try(StructType.fromDDL(ddl)).toOption)
    physical match {
      case Some(st) =>
        st.fields.iterator
          .filterNot(f => dropped.contains(f.name))
          .map(f => f.name -> (ren.getOrElse(f.name, f.name), f.dataType.sql))
          .toMap
      case None =>
        // pre-log version: the merged read's schema is already logical;
        // recover the physical identity through the version's mapping
        val lg = Snapshots.readVersion(spark, table, v, mergeSchema = true)
          .schema.fields
        val back = ren.map(_.swap)
        lg.iterator
          .map(f => back.getOrElse(f.name, f.name) -> (f.name, f.dataType.sql))
          .toMap
    }
  }

  /** One row per column-level change over `(fromV, toV]`:
    * `(version, change, column, detail)` where change ∈
    * add / drop / rename / retype; `column` is the LOGICAL name after
    * the change, `detail` is the type (add/drop), the old logical name
    * (rename), or `oldType -> newType` (retype). Missing versions
    * (batch-committer gaps) are non-commits and are skipped, exactly
    * like the change feed does. */
  def schemaDrift(spark: SparkSession, table: String,
                  fromV: Long, toV: Long): DataFrame = {
    import spark.implicits._
    require(fromV >= 0 && fromV <= toV,
      s"schemaDrift($table): bad range ($fromV, $toV]")
    val out = Seq.newBuilder[(Long, String, String, String)]
    var prev = fieldsAt(spark, table, fromV)
    var v = fromV + 1
    while (v <= toV) {
      if (Snapshots.versionExists(table, v)) {
        val cur = fieldsAt(spark, table, v)
        cur.foreach { case (p, (lg, tp)) =>
          prev.get(p) match {
            case None => out += ((v, "add", lg, tp))
            case Some((plg, ptp)) =>
              if (plg != lg) out += ((v, "rename", lg, plg))
              if (ptp != tp) out += ((v, "retype", lg, s"$ptp -> $tp"))
          }
        }
        prev.foreach { case (p, (plg, ptp)) =>
          if (!cur.contains(p)) out += ((v, "drop", plg, ptp))
        }
        prev = cur
      }
      v += 1
    }
    out.result().toDF("version", "change", "column", "detail")
      .orderBy("version", "change", "column")
  }

  // ---- oracle-gated exercise -----------------------------------------

  private def freshTable(prefix: String, dir: String): String =
    Graft.freshDir(prefix + dir.replaceAll("[^A-Za-z0-9.]", "_"))

  /** s59: the drift audit under the oracle gate — a table evolves
    * through the engine's whole DDL surface (bootstrap, additive
    * append, RENAME, DROP) and the audit must restate exactly that
    * history: bootstrap columns as v1 adds, the widened append as a v2
    * add, the rename as a RENAME (not drop+add), the drop as a drop
    * carrying the dropped column's type. The oracle is the expected
    * history as a literal table — deterministic because every change
    * is one the query itself performed. */
  def schemaDriftAudit(spark: SparkSession, dir: String): DataFrame = {
    val table = freshTable("s59-tbl-", dir)
    val ev = Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "event_type", "value", "event_date")
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      ev.filter(col("event_date") <= "2024-01-10"),
      table, "event_date", "event_id"))                                // v1
    Snapshots.commit(table, Snapshots.stage(
      ev.filter(col("event_date").between("2024-01-11", "2024-01-12"))
        .withColumn("source", lit("backfill")),
      table, "event_date"))                                            // v2: +source
    Snapshots.renameColumn(spark, table, "value", "amount")            // v3
    Snapshots.dropColumn(spark, table, "source")                       // v4
    schemaDrift(spark, table, 0, Snapshots.currentVersion(table))
  }

  lazy val schemaDriftAuditOracle: String =
    """SELECT * FROM (VALUES
      |  (CAST(1 AS BIGINT), 'add', 'event_date', 'DATE'),
      |  (1, 'add', 'event_id', 'BIGINT'),
      |  (1, 'add', 'event_type', 'STRING'),
      |  (1, 'add', 'value', 'DOUBLE'),
      |  (2, 'add', 'source', 'STRING'),
      |  (3, 'rename', 'amount', 'value'),
      |  (4, 'drop', 'source', 'STRING')
      |) AS t(version, change, "column", detail)
      |ORDER BY version, change, "column" """.stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("s59_schema_drift", schemaDriftAuditOracle)(schemaDriftAudit))
}
