package graft.ops.lake

import graft.engine.{Graft, QueryDef, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** SCHEMA DRIFT AUDIT — column-level evolution history from the
  * snapshot log alone: for every version in a range, what was ADDED,
  * DROPPED, or RENAMED relative to the previous existing version. The
  * governance question a 100 TB lake answers constantly ("when did
  * this column appear / vanish / change meaning?"), and the log
  * already holds everything needed: the name-keyed union schema rides
  * each commit ([[Snapshots.SchemaDdlProp]], the schema-in-the-log
  * move) and renames/drops are version-scoped mapping props — so the
  * audit is a pure DRIVER walk over props, zero data or footer IO on
  * schema-logged tables (pre-log versions fall back to one
  * footer-union read each; an unreadable pre-log version carries the
  * previous state forward instead of failing the whole audit).
  *
  * Diffing works at PHYSICAL-name granularity — the stable column
  * identity name mapping guarantees — so a rename reports as RENAME
  * (old logical → new logical), never as the drop+add a logical-name
  * diff would fabricate. Reported names are the LOGICAL names users
  * saw at each version. Two deliberate trust rules (r13 review
  * finds):
  *
  *   - DROPS come only from the EXPLICIT dropped-column props, never
  *     from a name missing in a version's recorded DDL — the union
  *     schema can only grow, so a vanished name is a pre-log-transition
  *     artifact (the first logged commit records only its own files'
  *     union) and the previous state carries forward;
  *   - TYPE CHANGES are outside the engine's evolution surface
  *     (schema merge rejects conflicts), so the audit reports the
  *     log-recorded type; a `retype` row appears only if a recorded
  *     type ever legitimately moves (e.g. nullable widening the merge
  *     accepts).
  *
  * Ref analog: none — the reference's only schema management is
  * BigQuery autodetect (SURVEY §2.2 S11); drift there is discovered in
  * production, not audited from a log. */
object SchemaAudit {

  /** Live-version prop recording the recovered physical schema DDL of
    * a PRE-LOG version `v` ([[backfillSchemaLog]]) — `schema.`-family,
    * so it inherits across every later commit like the mapping props. */
  private def backfillKey(v: Long) = s"schema.ddl.backfill.$v"
  private val BackfillPrefix = "schema.ddl.backfill."

  /** Pre-log recovery: the version's merged-read schema is LOGICAL;
    * physical identity comes back through the version's rename
    * mapping. None for unreadable (pre-log zero-file) versions. This
    * is the one footer-priced path in the audit — [[backfillSchemaLog]]
    * exists to pay it once per table instead of once per audit. */
  private def footerPhysical(spark: SparkSession, table: String, v: Long,
                             ren: Map[String, String]): Option[StructType] =
    scala.util.Try {
      val back = ren.map(_.swap)
      StructType(Snapshots.readVersion(spark, table, v, mergeSchema = true)
        .schema.fields.map(f => f.copy(name = back.getOrElse(f.name, f.name))))
    }.toOption

  /** Audit state at version `v`: (physical → (logical, type DDL),
    * dropped physical names). ONE snapshot-props read per version
    * (deriving mapping and DDL from the same map); `backfill` holds
    * the live version's recovered pre-log DDLs, consulted before the
    * footer fallback. None when the version records no schema AND the
    * pre-log footer fallback cannot read it (e.g. a pre-log zero-file
    * commit) — the walk carries the previous state forward. Version 0
    * is the empty table. */
  private def stateAt(spark: SparkSession, table: String, v: Long,
                      backfill: Map[Long, String]): Option[(Map[String, (String, String)], Set[String])] = {
    if (v == 0) return Some((Map.empty, Set.empty))
    val props = Snapshots.snapshotProps(table, v)
    val ren = props.collect {
      case (k, lg) if k.startsWith(Snapshots.LogicalPropPrefix) =>
        k.drop(Snapshots.LogicalPropPrefix.length) -> lg
    }
    val dropped = props.collect {
      case (k, _) if k.startsWith(Snapshots.DroppedPropPrefix) =>
        k.drop(Snapshots.DroppedPropPrefix.length)
    }.toSet
    val physical: Option[StructType] =
      props.get(Snapshots.SchemaDdlProp)
        .orElse(backfill.get(v))
        .flatMap(ddl => scala.util.Try(StructType.fromDDL(ddl)).toOption)
        .orElse(footerPhysical(spark, table, v, ren))
    physical.map { st =>
      (st.fields.iterator
        .filterNot(f => dropped.contains(f.name))
        .map(f => f.name -> (ren.getOrElse(f.name, f.name), f.dataType.sql))
        .toMap,
        dropped)
    }
  }

  /** ONE-TIME schema-log backfill (r14, r13 verdict item 8): recover
    * the physical schema of every PRE-LOG version (committed before the
    * schema-in-the-log move) through one footer-union read each, and
    * record the DDLs as inherited live-version props — after which
    * EVERY later [[schemaDrift]] is a pure driver props walk with zero
    * footer IO, instead of paying O(pre-log versions) footer reads per
    * audit forever. Idempotent (already-recovered and schema-logged
    * versions are skipped); unreadable versions record nothing and keep
    * the audit's carry-forward semantics. Returns the number of
    * versions recovered; 0 means no metadata commit was made. */
  def backfillSchemaLog(spark: SparkSession, table: String): Int = {
    val cur = Snapshots.currentVersion(table)
    require(cur >= 1, s"backfillSchemaLog($table): no committed snapshot")
    val live = Snapshots.snapshotProps(table, cur)
    val recovered = (1L to cur).iterator
      .filter(v => Snapshots.versionExists(table, v))
      .filter(v => !live.contains(backfillKey(v)))
      .filter(v => !Snapshots.snapshotProps(table, v).contains(Snapshots.SchemaDdlProp))
      .flatMap { v =>
        val ren = Snapshots.schemaMapping(table, v)._1
        footerPhysical(spark, table, v, ren).map(_.toDDL)
          // same control-char guard as the data-commit DDL prop: a name
          // with a prop-format metacharacter must not corrupt the log
          .filter(!_.exists(c => c == '\t' || c == '\n' || c == '\u0001' || c == '\u0002'))
          .map(backfillKey(v) -> _)
      }.toMap
    // the live version's recovered DDL also seeds the REGULAR schema
    // log: the backfill commit itself becomes schema-logged, and every
    // later data commit merge-inherits from it — without this, the
    // metadata commit would be one more pre-log version needing a
    // footer read whenever an audit range covers it
    val seedLive: Map[String, String] =
      if (live.contains(Snapshots.SchemaDdlProp)) Map.empty
      else recovered.get(backfillKey(cur))
        .map(Snapshots.SchemaDdlProp -> _).toMap
    if (recovered.nonEmpty) Snapshots.commitProps(table, recovered ++ seedLive)
    recovered.size
  }

  /** One row per column-level change over `(fromV, toV]`:
    * `(version, change, column, detail)` where change ∈
    * add / drop / rename / retype; `column` is the LOGICAL name after
    * the change, `detail` is the type (add/drop), the old logical name
    * (rename), or `oldType -> newType` (retype). Missing versions
    * (batch-committer gaps, vacuumed history) are skipped — including
    * a `fromV` that names one: the anchor walks down to the last
    * existing version, like the change feed does. */
  def schemaDrift(spark: SparkSession, table: String,
                  fromV: Long, toV: Long): DataFrame = {
    import spark.implicits._
    require(fromV >= 0 && fromV <= toV,
      s"schemaDrift($table): bad range ($fromV, $toV]")
    val out = Seq.newBuilder[(Long, String, String, String)]
    // recovered pre-log DDLs ([[backfillSchemaLog]]): ONE live-props
    // read serves the whole walk — on a backfilled table no version
    // needs the footer fallback again
    val backfill: Map[Long, String] =
      Snapshots.snapshotProps(table, Snapshots.currentVersion(table))
        .collect { case (k, ddl) if k.startsWith(BackfillPrefix) =>
          k.drop(BackfillPrefix.length).toLong -> ddl }
    var anchor = fromV
    while (anchor > 0 && !Snapshots.versionExists(table, anchor)) anchor -= 1
    var prevState: (Map[String, (String, String)], Set[String]) =
      stateAt(spark, table, anchor, backfill).getOrElse((Map.empty, Set.empty))
    var v = fromV + 1
    while (v <= toV) {
      if (Snapshots.versionExists(table, v)) stateAt(spark, table, v, backfill) match {
        case None => // unreadable pre-log version: carry forward
        case Some((rec, droppedNow)) =>
          val (prev, droppedBefore) = prevState
          // drops are EXPLICIT: the dropped-prop diff, with the type
          // reported from the last state that carried the column
          val newlyDropped = droppedNow -- droppedBefore
          newlyDropped.foreach { p =>
            prev.get(p).foreach { case (plg, ptp) => out += ((v, "drop", plg, ptp)) }
          }
          // the union schema only grows — a name missing from this
          // version's recorded DDL (pre-log transition) carries forward
          val cur = (prev -- droppedNow) ++ rec
          cur.foreach { case (p, (lg, tp)) =>
            prev.get(p) match {
              case None if !droppedBefore.contains(p) => out += ((v, "add", lg, tp))
              case None => // re-using a dropped physical name is rejected at stage
              case Some((plg, ptp)) =>
                if (plg != lg) out += ((v, "rename", lg, plg))
                if (ptp != tp) out += ((v, "retype", lg, s"$ptp -> $tp"))
            }
          }
          prevState = (cur, droppedNow)
      }
      v += 1
    }
    // local sort — the result is a handful of driver-side tuples; an
    // orderBy here would launch a shuffle job for nothing (r13 review)
    out.result().sortBy { case (ver, ch, c, _) => (ver, ch, c) }
      .toDF("version", "change", "column", "detail")
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
