package org.apache.spark.sql

import graft.ops.lake.{Pruning, Snapshots}

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** MANIFEST-PRUNED scan relation for lake tables — the FileIndex
  * doorway Delta and Iceberg use: Spark's scan planning hands every
  * custom [[FileIndex]] the PUSHED-DOWN data filters at `listFiles`
  * time, so a `WHERE day = X AND id BETWEEN …` arriving through plain
  * `spark.sql` prunes manifest entries (tag match, min/max stats,
  * bloom sketches — [[Pruning.compile]]) BEFORE any file is opened.
  * This is what makes SQL SELECTs over a 10⁶-file table open only the
  * matching files instead of every footer; the same query through the
  * un-indexed relation would rely on per-file row-group stats, i.e.
  * one footer read per file.
  *
  * Lives in the `org.apache.spark.sql` package alongside
  * [[GraftSqlBridge]] because `HadoopFsRelation`/`LogicalRelation`
  * construction is `private[sql]` at the Scala level — the same
  * documented doorway policy (nothing else internal is touched; the
  * pruning logic itself is plain [[graft.ops.lake.Pruning]]).
  *
  * Scale notes: the entry list is the driver-resident manifest — the
  * same O(#files) driver state every log-backed table format carries —
  * and `listFiles` is a pure in-memory filter over it; no filesystem
  * LISTING ever happens (the log IS the listing). Per-file `FileStatus`
  * construction (one fs stat each — a HEAD per file on object storage)
  * happens ONLY for entries that SURVIVE pruning, at listFiles time;
  * `sizeInBytes` folds the manifest's recorded per-entry sizes (`sz`
  * props, r17) — zero filesystem IO — with a lazy stat fallback only
  * for legacy entries, amortized by the per-(table, version) index
  * cache.
  */
class GraftFileIndex(
    table: String,
    tagCol: String,
    entries: Seq[Snapshots.Entry]) extends FileIndex {

  /** The manifest entries this index scans — read by the
    * metadata-count optimizer rule ([[graft.plans.MetadataCountRule]]):
    * with per-entry `rows` props a bare count over this index folds to
    * a constant without opening a file. */
  def manifestEntries: Seq[Snapshots.Entry] = entries

  /** The lake table this index serves — the SQL DFP rule
    * ([[graft.plans.SqlDfpRule]]) keys recorded-stats lookups
    * (NDV/histograms) by it. */
  def tablePath: String = table

  private val statusCache =
    new java.util.concurrent.ConcurrentHashMap[String, FileStatus]()

  private def status(e: Snapshots.Entry): FileStatus =
    statusCache.computeIfAbsent(e.rel, { _ =>
      val f = new java.io.File(table, e.rel)
      new FileStatus(f.length(), false, 1, f.length(), f.lastModified(),
        new Path(f.toURI))
    })

  override def rootPaths: Seq[Path] = Seq(new Path(new java.io.File(table).toURI))

  // no partition columns: the tag is pruned from entry metadata, not
  // from directory-derived partition values — every column stays a
  // data column, so the relation's schema is exactly the table's
  override def partitionSchema: StructType = StructType(Nil)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val keep = Pruning.compile(dataFilters, tagCol, table)
    Seq(PartitionDirectory(InternalRow.empty,
      entries.collect { case e if keep(e) => status(e) }.toArray))
  }

  override def inputFiles: Array[String] =
    entries.map(e => new java.io.File(table, e.rel).toURI.toString).toArray

  override def refresh(): Unit = statusCache.clear()

  // CBO asks for this while planning; folds the manifest's recorded
  // per-entry sizes (r17 `sz` props) — zero filesystem IO; a stat-backed
  // FileStatus fills in only for legacy entries missing the prop
  override lazy val sizeInBytes: Long =
    entries.map(e => Snapshots.entryBytes(table, e)).sum
}

object GraftRelations {

  // pruned-relation indexes are immutable per (table, version, caller
  // pre-filter); cache them so every query against the same snapshot
  // slice shares one index (and its memoized file statuses). A SHA-256
  // digest of the rel sequence keys the ENTRY SUBSET: kernel reads pass
  // tagFilter/fileFilter survivors, so two reads of the same version
  // with different caller filters must not share an index — and a
  // 32-bit hashCode (pre-r10) could collide two subsets and serve the
  // wrong file set to kernel reads (r10 advisor find); a cryptographic
  // digest cannot. Bounded: clear when it outgrows a working set —
  // re-statting after eviction is correctness-neutral.
  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, String, String), GraftFileIndex]()
  private val MaxCached = 256

  private def relsDigest(rels: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    rels.foreach { r =>
      md.update(r.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.update(0.toByte)
    }
    java.util.Base64.getEncoder.encodeToString(md.digest())
  }

  private def index(table: String, version: Long, tagCol: String,
                    entries: Seq[Snapshots.Entry]): GraftFileIndex = {
    if (indexCache.size > MaxCached) indexCache.clear()
    indexCache.computeIfAbsent(
      (table, version, tagCol, relsDigest(entries.map(_.rel))),
      { _ => new GraftFileIndex(table, tagCol, entries) })
  }

  /** Logical plan scanning exactly `entries` of `table`@`version` with
    * manifest-level pruning driven by pushed-down filters. The caller
    * guarantees: parquet files, identity schema mapping (logical ==
    * physical), uniform schema intent (no mergeSchema). `tagCol` may be
    * "" when the tag column name is unknown (kernel reads — the caller
    * already pruned tags explicitly; stats/bloom pruning still apply).
    * Deletion-vector props on entries are irrelevant here — this IS the
    * raw-file scan; merge-on-read callers go through the kernel's
    * anti-join plan instead. */
  def prunedParquetPlan(spark: SparkSession, table: String, tagCol: String,
                        version: Long, entries: Seq[Snapshots.Entry],
                        dataSchema: StructType): LogicalPlan = {
    val relation = HadoopFsRelation(
      location = index(table, version, tagCol, entries),
      partitionSchema = StructType(Nil),
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark.asInstanceOf[classic.SparkSession])
    LogicalRelation(relation)
  }
}
