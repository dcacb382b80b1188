package graft.streaming

import graft.ops.lake.Snapshots

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

/** STREAMING SINK into a snapshot table — the write-side twin of the
  * `graft-changes` source, closing the loop: a lake table is both a
  * stream source and a stream sink with exactly-once on both ends.
  *
  *   spark.readStream.format("graft-changes").load(src)
  *     .drop("_row_id")   // feed lineage — reserved in any lake table
  *     .writeStream.format("graft").option("tagCol", "day").start(dst)
  *
  * (`_row_id` is the feed's row-tracking column; staging it into a
  * lake table is rejected loudly because the name is reserved for the
  * DESTINATION's own row identity — drop or rename it upstream.)
  *
  * Exactly-once is the applied-batch bookkeeping discipline (the Delta
  * `txnAppId`/`txnVersion` pattern, the same shape
  * [[graft.ops.lake.CopyInto]] uses): each committed micro-batch rides
  * its snapshot commit with `tbl.sink.applied.<query-hash> = batchId`.
  * A replayed batch (restart after a crash anywhere between the table
  * commit and Spark's own commit-log write) re-presents the SAME
  * batchId, is recognized through the prop, and no-ops — never
  * doubles. The prop is table-identity keyed on the query's CHECKPOINT
  * location (canonicalized), so the guard distinguishes a genuine
  * replay from a foreign commit: interleaved maintenance (OPTIMIZE, a
  * batch MERGE) between drains neither drops a batch nor trips the
  * guard, because progress is the inherited prop, not version
  * arithmetic. A FRESH checkpoint against the same table is a new
  * sink identity — its batches append (standard append-sink
  * semantics), loudly visible in the row counts rather than silently
  * dropped.
  *
  * Append-mode only: update/complete modes re-emit rows for keys the
  * sink has already committed, which an append-only versioned log
  * cannot represent (drive a MERGE via `foreachBatch` +
  * [[graft.ops.lake.Mutations.mergeIntoKeys]] for that shape, or
  * [[graft.ops.lake.ChangeApply]] for table-to-table sync). */
class GraftSinkProvider extends StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  override def createSink(ctx: SQLContext, params: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft sink: Append mode only (got $outputMode) — update/complete " +
        "re-emit committed keys; use foreachBatch + mergeIntoKeys for upserts")
    val table = params.get("path").getOrElse(throw new IllegalArgumentException(
      "graft sink: pass the table directory via .start(dir) or .option(\"path\", dir)"))
    val tagCol = params.collectFirst {
        case (k, v) if k.equalsIgnoreCase("tagCol") => v }
      .orElse(partitionColumns.headOption)
      .getOrElse(throw new IllegalArgumentException(
        "graft sink: pass the partition-tag column via .option(\"tagCol\", c) " +
          "or .partitionBy(c)"))
    // sink identity = the query's checkpoint (one checkpoint, one
    // batchId sequence); sinkId is the explicit override for the rare
    // conf-defaulted-checkpoint setup where the location never reaches
    // the options map
    val ident = params.collectFirst {
        case (k, v) if k.equalsIgnoreCase("sinkId") => v }
      .orElse(params.collectFirst {
        case (k, v) if k.equalsIgnoreCase("checkpointLocation") =>
          new java.io.File(v).getCanonicalPath })
      .getOrElse(throw new IllegalArgumentException(
        "graft sink: exactly-once needs a stable sink identity — set " +
          ".option(\"checkpointLocation\", dir) or .option(\"sinkId\", id)"))
    val forceAppend = params.collectFirst {
      case (k, v) if k.equalsIgnoreCase("sinkBootstrap") => v }
      .exists(_.equalsIgnoreCase("append"))
    new GraftSink(table, tagCol, GraftSink.appliedKey(ident), forceAppend)
  }
}

object GraftSink {
  private[graft] def appliedKey(ident: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(ident.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"tbl.sink.applied.$h"
  }
}

class GraftSink(table: String, tagCol: String, appliedKey: String,
                forceAppend: Boolean = false) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the streaming-tagged frame re-wraps as a batch frame over the
    // SAME computed rows (the ForeachBatchSink move) — restageLike then
    // writes it through the normal size-budgeted path, preserving
    // whatever stats/bloom decoration the table carries
    val df = GraftSqlBridge.batchDataFrame(data)
    val cur = Snapshots.currentVersion(table)
    val applied = Snapshots.snapshotProps(table, cur)
      .get(appliedKey).map(_.toLong).getOrElse(-1L)
    // batchIds are monotonic per checkpoint, so a batch BEHIND the
    // applied cursor (not merely equal — that is the genuine crash
    // replay, which must stay a silent no-op) means the checkpoint
    // directory was wiped and reused at the same path while the
    // table-side cursor survived. Silently no-oping batches 0..applied
    // would swallow the whole reprocess without any signal (r12
    // advisor find) — fail loudly; the SAFE reprocess identity is a
    // fresh sinkId/checkpoint path (always unambiguous).
    // sinkBootstrap=append instead re-appends IN PLACE, regressing the
    // cursor to this batch and appending forward — an AT-LEAST-ONCE
    // remediation, not a clean restart: rows from batches the table
    // already applied STAY in it, so a full replay duplicates every
    // previously-committed batch unless the table was truncated first
    // (r13 advisor find — the error below now says so). There is also
    // one honest limitation: a reborn batch whose id EQUALS the surviving cursor
    // is indistinguishable from a genuine crash replay of that batch
    // (both present batchId == applied), so exactly-once wins, the
    // batch no-ops, and the suppression is WARNED rather than silent
    // (r13 review find — the pre-r13 drop here had no signal at all).
    if (batchId < applied && !forceAppend)
      throw new IllegalStateException(
        s"graft sink($table): batch $batchId is behind the applied cursor " +
          s"$applied — the checkpoint was wiped and reused at the same path " +
          "(batchIds restarted) while the table's sink bookkeeping survived. " +
          "Reprocess under a fresh checkpoint path or .option(\"sinkId\", …) " +
          "(the unambiguous identity), or pass " +
          ".option(\"sinkBootstrap\", \"append\") to re-append in place — " +
          "NOTE: append-mode reprocess is at-least-once: rows from batches " +
          "this table already applied remain in it, so a full stream replay " +
          "DUPLICATES them unless the table is truncated first or the " +
          "stream targets a fresh sinkId/table.")
    if (forceAppend && batchId == applied && !df.isEmpty)
      System.err.println(
        s"[graft sink($table)] batch $batchId equals the applied cursor and " +
          "was suppressed as a crash replay despite sinkBootstrap=append — " +
          "if this is a wiped-checkpoint reprocess of a one-batch table, " +
          "use a fresh .option(\"sinkId\", …) instead")
    if ((batchId > applied || (forceAppend && batchId < applied)) && !df.isEmpty) {
      // AMBIGUOUS state, failed loudly rather than guessed (r12 review
      // find): no applied prop but the table version equals the LEGACY
      // sink's batch-derived invariant. Either (a) a crash replay
      // straddling the pre-prop upgrade — appending would DOUBLE the
      // batch — or (b) a fresh checkpoint whose batch number happens to
      // line up with an existing table — skipping would DROP data.
      // Both wrong answers are silent; the operator disambiguates:
      // .option("sinkBootstrap", "append") for a deliberate append.
      require(forceAppend || !(applied < 0 && cur == batchId + 1 && cur > 0),
        s"graft sink($table): table version $cur matches the legacy " +
          s"batch-derived invariant for batch $batchId but no applied-batch " +
          "bookkeeping exists — a legacy-sink crash replay (appending would " +
          "double it) is indistinguishable from a fresh checkpoint against " +
          "an existing table (skipping would drop it). Pass " +
          ".option(\"sinkBootstrap\", \"append\") to append deliberately.")
      Snapshots.commitAll(table,
        Snapshots.restageLike(df.sparkSession, df, table, tagCol),
        props = Map(appliedKey -> batchId.toString))
      ()
    }
  }

  override def toString: String = s"GraftSink[$table, tag=$tagCol]"
}
