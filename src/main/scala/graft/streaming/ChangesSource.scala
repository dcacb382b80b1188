package graft.streaming

import graft.ops.lake.Snapshots

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.Source
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructType}

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
  *     bounded chunks instead of one giant batch. Use with a polling
  *     trigger: under `Trigger.AvailableNow` Spark captures the first
  *     (capped) offset as "everything available" and stops there (the
  *     DSv1 API can't advertise more than it admits; the DSv2
  *     SupportsAdmissionControl split would lift this).
  *
  * The schema is PINNED at stream start (current snapshot's logical
  * schema + `_change_type`); batches crossing a later rename/drop
  * align to it by name with NULL-fill — restart the stream to pick up
  * an evolved schema, the standard streaming-source contract. */
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
    val starting = params.collectFirst {
      case (k, v) if k.equalsIgnoreCase("startingVersion") => v.toLong }
      .getOrElse(0L)
    val maxPer = params.collectFirst {
      case (k, v) if k.equalsIgnoreCase("maxVersionsPerBatch") => v.toLong }
    require(maxPer.forall(_ >= 1), "graft-changes: maxVersionsPerBatch must be >= 1")
    new ChangesSource(ctx.sparkSession, table, starting, maxPer, metadataPath)
  }
}

object ChangesSource {
  /** Feed schema = the table's current logical schema plus the reserved
    * `_change_type` marker ([[Snapshots.changes]]' contract). */
  def feedSchema(spark: SparkSession, table: String): StructType = {
    require(Snapshots.currentVersion(table) >= 1,
      s"graft-changes: $table holds no committed snapshot")
    Snapshots.read(spark, table).schema.add("_change_type", StringType)
  }
}

class ChangesSource(spark: SparkSession, table: String,
                    startingVersion: Long, maxVersionsPerBatch: Option[Long],
                    metadataPath: String) extends Source {

  override val schema: StructType = ChangesSource.feedSchema(spark, table)

  /** Highest version handed out so far — ADMISSION state only (floors
    * [[getOffset]] so it never regresses below an already-checkpointed
    * batch, and caps the next batch under `maxVersionsPerBatch`);
    * correctness lives in the checkpointed offset log, which re-drives
    * [[getBatch]] with the authoritative range on restart. Persisted
    * under the source's own `metadataPath` (tmp + atomic move) so a
    * restarted stream's first [[getOffset]] is monotone even before
    * Spark replays any batch. */
  // metadataPath arrives as a URI string (file:/…); resolve it as one,
  // or a relative "file:/…" directory materializes under the CWD
  private val hwFile = {
    val dir = if (metadataPath.contains(":/"))
      new java.io.File(java.net.URI.create(metadataPath).getPath)
    else new java.io.File(metadataPath)
    new java.io.File(dir, "graft-changes-highwater")
  }
  @volatile private var highWater: Long = {
    val persisted =
      if (hwFile.exists())
        new String(java.nio.file.Files.readAllBytes(hwFile.toPath),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      else 0L
    math.max(startingVersion, persisted)
  }

  private def persistHighWater(v: Long): Unit = {
    Option(hwFile.getParentFile).foreach(_.mkdirs())
    val tmp = new java.io.File(hwFile.getParentFile, s".${hwFile.getName}.tmp")
    java.nio.file.Files.write(tmp.toPath,
      v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp.toPath, hwFile.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def longOf(o: org.apache.spark.sql.connector.read.streaming.Offset): Long =
    o match {
      case l: LongOffset => l.offset
      case s: SerializedOffset => LongOffset(s).offset
      case other => other.json.toLong
    }

  override def getOffset: Option[org.apache.spark.sql.execution.streaming.Offset] = {
    val cur = Snapshots.currentVersion(table)
    val target = maxVersionsPerBatch.fold(cur)(m => math.min(cur, highWater + m))
    if (target <= highWater) None else Some(LongOffset(target))
  }

  override def getBatch(start: Option[org.apache.spark.sql.execution.streaming.Offset],
                        end: org.apache.spark.sql.execution.streaming.Offset): DataFrame = {
    val fromV = start.map(longOf(_)).getOrElse(startingVersion)
    val toV = longOf(end)
    if (toV > highWater) { highWater = toV; persistHighWater(toV) }
    val feed = Snapshots.changes(spark, table, fromV, toV)
    // align to the pinned schema BY NAME: a feed crossing a schema
    // evolution presents the union schema — pinned columns keep their
    // start-time types, columns added later are invisible until restart
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
