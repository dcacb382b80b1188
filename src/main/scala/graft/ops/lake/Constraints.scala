package graft.ops.lake

import graft.engine.Graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CHECK CONSTRAINTS over snapshot tables — the Delta `ALTER TABLE …
  * ADD CONSTRAINT … CHECK` shape: a named boolean SQL expression stored
  * in snapshot props (`constraint.<name>`, INHERITED by every commit
  * like the schema mapping) and enforced at WRITE time on every path
  * that stages data files. Enforcement points:
  *
  *   - [[add]] validates the EXISTING table first (one aggregate scan
  *     over the merged read) — a constraint the live data already
  *     violates is refused, so `active` constraints are always an
  *     invariant of the whole table, not just of future writes;
  *   - [[Snapshots.stage]]/`stageWithStats`/`stageZOrdered` re-read the
  *     files they just wrote and count violations per constraint
  *     (read-back of the staged batch, NOT a second pass over the
  *     upstream plan — the batch is columnar on local disk and only the
  *     referenced columns load). On violation the staged files are
  *     deleted and the write throws BEFORE any commit exists, so a
  *     failed MERGE/UPDATE/INSERT leaves the table bit-identical —
  *     atomicity comes free from stage-then-commit.
  *
  * Scale: the props lookup is metadata-only, so tables without
  * constraints pay literally nothing; tables with constraints pay
  * O(batch) per write — the same bound Delta accepts — never O(table).
  * NULL semantics follow SQL CHECK: a NULL check value PASSES (only
  * `FALSE` violates), which is why enforcement filters on
  * `NOT coalesce(check, true)`.
  *
  * Expressions are stored in LOGICAL column terms and evaluated against
  * the current version's logical view, so constraints and
  * rename-mapping compose; [[Snapshots.renameColumn]]/`dropColumn`
  * refuse to change a column an active constraint mentions (drop the
  * constraint first, re-add under the new name — the explicit-over-
  * clever trade Delta also makes).
  *
  * Reference analog: the reference's only write-validation is dbt's
  * post-hoc `unique`/`not_null` tests (`dbt_project/models/marts/
  * schema.yml`), which run AFTER bad data lands; this enforces at the
  * write boundary instead.
  */
object Constraints {

  val Prefix = "constraint."

  private val NameRe = "^[A-Za-z_][A-Za-z0-9_]*$".r

  /** Active named checks at the current version (logical-name terms). */
  def active(table: String): Map[String, String] =
    Snapshots.snapshotProps(table, Snapshots.currentVersion(table))
      .collect { case (k, v) if k.startsWith(Prefix) => k.stripPrefix(Prefix) -> v }

  /** Add a named CHECK. Validates existing data first; the constraint
    * lands as a props-only commit (no file touched). Returns the new
    * version. */
  def add(spark: SparkSession, table: String, name: String,
          check: String): Long = {
    require(NameRe.findFirstIn(name).isDefined,
      s"constraint name must be a bare identifier, got '$name'")
    require(!active(table).contains(name),
      s"constraint '$name' already exists on $table (drop it first)")
    // snapshot props are single-line tab-free records; SQL whitespace
    // is insignificant, so normalizing is semantics-preserving
    val text = check.trim.replaceAll("\\s+", " ")
    val bad = violations(Snapshots.readMerged(spark, table), Map(name -> text))
    require(bad.isEmpty,
      s"cannot add constraint '$name' CHECK ($text) to $table: existing " +
        s"data violates it (${bad(name)} rows)")
    Snapshots.commitProps(table, Map(Prefix + name -> text))
  }

  /** Retire a named CHECK (props-only commit). Time travel semantics
    * match the schema mapping: each version enforces nothing (reads
    * never check) but CARRIES its own constraint set, so RESTORE
    * restores the set as of the restored version. */
  def drop(spark: SparkSession, table: String, name: String): Long = {
    require(active(table).contains(name),
      s"no constraint '$name' on $table (have ${active(table).keys.mkString(", ")})")
    Snapshots.commitProps(table, Map.empty, unset = Set(Prefix + name))
  }

  /** Violation counts per constraint over `df` — ONE aggregate job for
    * all constraints; empty map when everything passes. */
  private[lake] def violations(df: DataFrame,
                               checks: Map[String, String]): Map[String, Long] = {
    if (checks.isEmpty) return Map.empty
    val names = checks.keys.toSeq.sorted
    val aggs = names.map { n =>
      sum(when(not(coalesce(expr(checks(n)), lit(true))), 1L).otherwise(0L)).as(n)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    names.zipWithIndex
      .map { case (n, i) => n -> (if (row.isNullAt(i)) 0L else row.getLong(i)) }
      .filter(_._2 > 0).toMap
  }

  /** Stage-time gate: called by [[Snapshots]] after writing a staged
    * directory, BEFORE the entries become commit-eligible. Reads back
    * the staged files under the current logical view, counts
    * violations, and on any hit deletes the staged directory and
    * throws. No-op (no IO at all) when the table has no constraints. */
  private[lake] def enforceStaged(spark: SparkSession, table: String,
                                  stagedDir: String): Unit = {
    val checks = active(table)
    if (checks.isEmpty) return
    val v = Snapshots.currentVersion(table)
    val staged = Snapshots.applyLogical(
      spark.read.parquet(stagedDir).drop("__tag"), table, v)
    val bad = violations(staged, checks)
    if (bad.nonEmpty) {
      Graft.wipeDir(stagedDir)
      throw new IllegalArgumentException(
        s"write to $table rejected by CHECK constraint(s): " +
          bad.toSeq.sorted.map { case (n, c) =>
            s"$n (${checks(n)}) — $c violating rows"
          }.mkString("; ") + ". No commit was made; the table is unchanged.")
    }
  }
}
