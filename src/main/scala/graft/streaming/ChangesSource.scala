package graft.streaming

import graft.ops.lake.Snapshots

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.Source
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** STREAMING source over a lake table's CHANGE DATA FEED — the Delta
  * "CDF as a stream" shape (ref has no analog; its consumers re-read
  * whole prefixes):
  *
  * {{{
  * spark.readStream.format("graft-changes").load(tableDir)
  *   .writeStream ... // rows = table schema + _change_type
  * }}}
  *
  * Offsets ARE snapshot versions: each micro-batch covers the version
  * range `(start, end]` and its rows are [[Snapshots.changes]] for that
  * range — O(changed files) IO, unchanged files never open, so a
  * trigger that fires with nothing new costs two metadata reads. The
  * feed is derived purely from the immutable log, so a replayed range
  * (restart between batch and checkpoint commit) reproduces byte-equal
  * rows — with Spark's checkpointed offset log on top, consumers get
  * the exactly-once batch semantics the hand-rolled
  * [[graft.ops.lake.ChangeFeed]] cursor can only give at-least-once.
  *
  * Options:
  *   - `path` (or `.load(dir)`): the table directory (required);
  *   - `startingVersion` (default 0): version the stream's FIRST batch
  *     starts AFTER — 0 bootstraps the full current snapshot as
  *     inserts, `currentVersion` tails only post-start changes;
  *   - `maxVersionsPerBatch` (optional): admission cap per micro-batch
  *     — a stream starting far behind a busy table catches up in
  *     bounded chunks instead of one giant batch. Works under every
  *     trigger: the source implements `SupportsTriggerAvailableNow`
  *     (the Delta pattern — admission control mixed into a DSv1
  *     Source), so `Trigger.AvailableNow` pins the end target once and
  *     drains to it in capped batches before stopping.
  *   - `maxFilesPerBatch` (optional): admission cap by CHANGED FILES —
  *     versions are admitted until their cumulative changed-file count
  *     (adds + removes + vector moves; pure driver metadata off the
  *     manifest diffs) would exceed the cap. A version cap alone lets
  *     one fat commit (a backfill touching 10⁵ files) blow the batch;
  *     this bounds batch IO by actual work. FLOOR: offsets are
  *     versions, so a single version larger than the cap cannot be
  *     split — it is admitted ALONE and that batch exceeds the cap by
  *     exactly that version's size (the Delta maxFilesPerTrigger
  *     behavior). Composes with `maxVersionsPerBatch` (both apply).
  *
  * The schema is PINNED at stream start (current snapshot's logical
  * schema + `_change_type`); batches crossing a later ADDITIVE
  * evolution align by name (new columns invisible until restart), and
  * a rename/drop of a pinned column FAILS the query loudly — the
  * Delta contract; silently NULL-filling renamed data would blank it
  * into the sink. */
class ChangesSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-changes"

  private def tableOf(params: Map[String, String]): String =
    params.get("path").orElse(params.get("table")).getOrElse(
      throw new IllegalArgumentException(
        "graft-changes: pass the table directory via .load(dir) or .option(\"path\", dir)"))

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            params: Map[String, String]): (String, StructType) =
    (shortName(), ChangesSource.feedSchema(ctx.sparkSession, tableOf(params)))

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            params: Map[String, String]): Source = {
    val table = tableOf(params)
    val startingV = params.collectFirst {
      case (k, v) if k.equalsIgnoreCase("startingVersion") => v.toLong }
    // startingTimestamp (the Delta CDF option): resolve wall-clock to
    // the version live THEN and stream changes AFTER it — i.e. the
    // feed starts at that version, exclusive, matching
    // startingVersion's "already-applied" semantics. A timestamp
    // before the first commit starts from 0 (full bootstrap).
    // Parsed by SPARK's own timestamp cast, not Timestamp.valueOf:
    // valueOf rejected the date-only form Delta accepts AND resolved
    // in the JVM-default timezone, so the same option string meant a
    // different instant per server (r12 advisor find) — the session
    // timezone is the one the user configured.
    val startingTs = params.collectFirst {
      case (k, v) if k.equalsIgnoreCase("startingTimestamp") =>
        ChangesSource.parseStartingTimestamp(ctx.sparkSession, v) }
      .map(t =>
        try Snapshots.versionAtTime(table, t)
        catch { case e: IllegalArgumentException
            if e.getMessage.contains("before the first commit") => 0L })
    require(startingV.isEmpty || startingTs.isEmpty,
      "graft-changes: startingVersion and startingTimestamp are exclusive")
    val starting = startingV.orElse(startingTs).getOrElse(0L)
    val maxPer = params.collectFirst {
      case (k, v) if k.equalsIgnoreCase("maxVersionsPerBatch") => v.toLong }
    require(maxPer.forall(_ >= 1), "graft-changes: maxVersionsPerBatch must be >= 1")
    val maxFiles = params.collectFirst {
      case (k, v) if k.equalsIgnoreCase("maxFilesPerBatch") => v.toLong }
    require(maxFiles.forall(_ >= 1), "graft-changes: maxFilesPerBatch must be >= 1")
    new ChangesSource(ctx.sparkSession, table, starting, maxPer, maxFiles)
  }
}

object ChangesSource {
  /** `startingTimestamp` string → epoch millis, resolved in the SPARK
    * SESSION timezone through Spark's own string→timestamp cast — so
    * `2024-01-15` (date-only, midnight) and `2024-01-15 06:30:00` both
    * parse, and the instant tracks `spark.sql.session.timeZone` rather
    * than whatever the JVM default happens to be. Unparsable input
    * fails loudly with the offending string (a NULL here would silently
    * bootstrap from version 0 — the full corpus re-emitted). */
  private[graft] def parseStartingTimestamp(spark: SparkSession,
                                             v: String): Long = {
    import org.apache.spark.sql.functions.{lit, try_to_timestamp, unix_millis}
    val row = spark.range(1)
      .select(unix_millis(try_to_timestamp(lit(v))).as("ms")).head()
    require(!row.isNullAt(0),
      s"graft-changes: cannot parse startingTimestamp '$v' — use " +
        "'yyyy-MM-dd' or 'yyyy-MM-dd HH:mm:ss[.S]' (resolved in the " +
        "session timezone)")
    row.getLong(0)
  }

  /** Feed schema = the table's current logical UNION schema (merge-
    * read — a plain read would pin one footer on an evolved table and
    * a restart could never adopt added columns) plus the reserved
    * `_row_id` (row tracking, r12) and `_change_type` markers
    * ([[Snapshots.changes]]' contract, in the feed's column order). */
  def feedSchema(spark: SparkSession, table: String): StructType = {
    require(Snapshots.currentVersion(table) >= 1,
      s"graft-changes: $table holds no committed snapshot")
    Snapshots.read(spark, table, mergeSchema = true).schema
      .add(Snapshots.RowIdCol, LongType)
      .add("_change_type", StringType)
  }
}

class ChangesSource(spark: SparkSession, table: String,
                    startingVersion: Long, maxVersionsPerBatch: Option[Long],
                    maxFilesPerBatch: Option[Long] = None)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  override val schema: StructType = ChangesSource.feedSchema(spark, table)

  import org.apache.spark.sql.connector.read.streaming.{
    Offset => V2Offset, ReadLimit}

  /** End target pinned by `Trigger.AvailableNow`: Spark calls
    * [[prepareForTriggerAvailableNow]] once at start, then drains
    * batches until [[latestOffset]] reaches this version — which is
    * what lets the `maxVersionsPerBatch` cap chunk the drain WITHOUT
    * ending the query at the first chunk (the r10 DSv1-only
    * limitation, since lifted by mixing in the admission-control
    * interfaces the Delta source uses). */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(Snapshots.currentVersion(table))

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerBatch.map(m => ReadLimit.maxRows(m)) // versions, see latestOffset
      .getOrElse(ReadLimit.allAvailable())

  // per-version changed-file counts (immutable once committed) — the
  // admission walk re-visits the same versions across triggers, so the
  // diff is computed once per version per source instance
  private val changedFilesMemo =
    new java.util.concurrent.ConcurrentHashMap[(Long, Long), java.lang.Long]()

  /** Files CHANGED by commit `v` relative to `prevV` — the last
    * EXISTING version before it, which may not be `v - 1` under
    * [[Snapshots.batchCommitter]] gaps (adds + removes +
    * deletion-vector moves on shared rels). The admission currency,
    * matching what [[Snapshots.changes]] will actually open. */
  private def changedFiles(prevV: Long, v: Long): Long =
    changedFilesMemo.computeIfAbsent((prevV, v), { _ =>
      def state(x: Long): Map[String, Option[String]] =
        Snapshots.entriesAt(table, x)
          .map(e => e.rel -> e.props.get(Snapshots.DvRefProp)).toMap
      val from = state(prevV); val to = state(v)
      val added = to.keysIterator.count(!from.contains(_))
      val removed = from.keysIterator.count(!to.contains(_))
      val dvMoved = to.iterator.count { case (rel, dv) =>
        from.get(rel).exists(_ != dv) }
      (added + removed + dvMoved).toLong
    })

  /** Admission control: the next batch ends at most `maxVersionsPerBatch`
    * EXISTING versions past `start` (the checkpoint-authoritative
    * offset Spark hands back — no source-side high-water state needed),
    * shrunk further so cumulative changed files stay within
    * `maxFilesPerBatch` (first version always admitted — the
    * documented floor: version offsets cannot split one commit),
    * clamped to the AvailableNow target when one is pinned. MISSING
    * versions — [[Snapshots.batchCommitter]] gaps from empty batches —
    * are non-commits: the walk steps over them for free and they never
    * become an offset, so a capped stream on a gapped log neither
    * crashes on a phantom snapshot nor wedges before real data (r11
    * review find; the pre-r11 uncapped `startV + m` arithmetic could
    * land the OFFSET itself on a missing version). Null = no new
    * data. */
  override def latestOffset(start: V2Offset, limit: ReadLimit): V2Offset = {
    val startV = Option(start).map(longOf).getOrElse(startingVersion)
    val cur = availableNowTarget.getOrElse(Snapshots.currentVersion(table))
    if (maxVersionsPerBatch.isEmpty && maxFilesPerBatch.isEmpty)
      return if (cur <= startV) null else LongOffset(cur)
    var end = startV
    // the diff base: largest EXISTING version <= startV (a user-given
    // startingVersion may itself name a gap; offsets we produced are
    // always existing)
    var prev = {
      var p = startV
      while (p > 0 && !Snapshots.versionExists(table, p)) p -= 1
      p
    }
    var admitted = 0L
    var files = 0L
    var v = startV + 1
    var full = false
    while (!full && v <= cur) {
      if (!Snapshots.versionExists(table, v)) v += 1 // gap: free to cross
      else {
        val c = maxFilesPerBatch.fold(0L)(_ => changedFiles(prev, v))
        val versionOk = maxVersionsPerBatch.forall(admitted < _)
        val filesOk = maxFilesPerBatch.forall(cap =>
          admitted == 0 || files + c <= cap)
        if (versionOk && filesOk) {
          admitted += 1; files += c; end = v; prev = v; v += 1
        } else full = true
      }
    }
    if (end <= startV) null else LongOffset(end)
  }

  override def reportLatestOffset(): V2Offset =
    LongOffset(Snapshots.currentVersion(table))

  private def longOf(o: V2Offset): Long =
    o match {
      case l: LongOffset => l.offset
      case s: SerializedOffset => LongOffset(s).offset
      case other => other.json.toLong
    }

  /** Legacy polling entry — unreached once Spark sees the
    * admission-control interface, kept correct for completeness:
    * advertises everything available (Spark itself compares against the
    * committed offset, so an uncapped answer is always sound). */
  override def getOffset: Option[org.apache.spark.sql.execution.streaming.Offset] = {
    val cur = Snapshots.currentVersion(table)
    if (cur <= startingVersion) None else Some(LongOffset(cur))
  }

  override def getBatch(start: Option[org.apache.spark.sql.execution.streaming.Offset],
                        end: org.apache.spark.sql.execution.streaming.Offset): DataFrame = {
    // a user-supplied startingVersion may name a GAP (batchCommitter's
    // empty batches skip versions) — diff from the previous EXISTING
    // version instead of crashing on the phantom snapshot (offsets we
    // produced ourselves always exist); 0 stays the bootstrap
    val fromV = {
      var p = start.map(longOf(_)).getOrElse(startingVersion)
      while (p > 0 && !Snapshots.versionExists(table, p)) p -= 1
      p
    }
    val toV = longOf(end)
    val feed = Snapshots.changes(spark, table, fromV, toV)
    // align to the pinned schema BY NAME: a feed crossing an ADDITIVE
    // evolution presents the union schema — pinned columns keep their
    // start-time types, columns added later are invisible until
    // restart. A pinned column absent from the feed is judged against
    // the TABLE's schema at the batch's end version, not the feed (the
    // feed only carries the CHANGED files' columns — a batch touching
    // only pre-evolution files would otherwise wedge the stream with a
    // false rename report, review find): still in the table → this
    // batch's rows NULL-fill it (correct additive semantics); gone
    // from the table → a rename/drop landed, fail the query (the
    // Delta contract — silently blanking real data is worse).
    val missing = schema.fieldNames.filterNot(_ == "_change_type")
      .filterNot(feed.columns.contains)
    if (missing.nonEmpty) {
      val live = Snapshots.readVersion(spark, table, toV, mergeSchema = true)
        .schema.fieldNames.toSet
      val gone = missing.filterNot(live.contains)
      if (gone.nonEmpty)
        throw new IllegalStateException(
          s"graft-changes[$table]: column(s) ${gone.mkString(", ")} " +
            "left the table schema (RENAME/DROP COLUMN landed mid-stream) — " +
            "restart the stream to adopt the evolved schema")
    }
    val aligned = feed.select(schema.fields.toSeq.map { f =>
      (if (feed.columns.contains(f.name)) col(f.name).cast(f.dataType)
       else lit(null).cast(f.dataType)).as(f.name)
    }: _*)
    // MicroBatchExecution requires isStreaming=true on DSv1 batches —
    // same internalCreateDataFrame move FileStreamSource makes
    org.apache.spark.sql.GraftSqlBridge.streamingDataFrame(
      spark, aligned.queryExecution.toRdd, schema)
  }

  override def stop(): Unit = ()
}
