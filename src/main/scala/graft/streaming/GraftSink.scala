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
  *     .writeStream.format("graft").option("tagCol", "day").start(dst)
  *
  * Exactly-once is [[Snapshots.batchCommitter]]'s contract lifted into
  * the DSv1 `Sink` API: micro-batch `batchId` commits as snapshot
  * version `batchId + 1` — a replayed batch (restart after a crash
  * anywhere between stage and commit) re-publishes byte-identically or
  * no-ops, never doubles; readers see each batch atomically. The sink
  * must OWN the table (versions are batch-derived — a concurrent
  * writer's commit makes the version race loud, not silent).
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
    new GraftSink(table, tagCol)
  }
}

class GraftSink(table: String, tagCol: String) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the streaming-tagged frame re-wraps as a batch frame over the
    // SAME computed rows (the ForeachBatchSink move) — stage() then
    // writes it through the normal size-budgeted path
    val df = GraftSqlBridge.batchDataFrame(data)
    if (Snapshots.currentVersion(table) < batchId + 1 && !df.isEmpty) {
      val p = Snapshots.prepare(table, Snapshots.stage(df, table, tagCol))
      Snapshots.commitPrepared(p.copy(version = batchId + 1))
    }
  }

  override def toString: String = s"GraftSink[$table, tag=$tagCol]"
}
