package graft.ops.lake

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** GENERIC incremental consumer over the change feed — the piece that
  * turns [[Snapshots.changes]] into an operational pattern for
  * consumers the [[Mutations]] MV framework doesn't cover (sync a
  * search index, mirror to another store, audit a heal): a durable
  * VERSION CURSOR plus a poll step.
  *
  * Delivery contract: AT-LEAST-ONCE with deterministic ranges. The
  * cursor advances only AFTER `process` returns, so a crash between
  * processing and the cursor write replays the SAME `(fromV, toV)`
  * range with the SAME feed content (the feed is derived purely from
  * the immutable log) — `process` must be idempotent per range, which
  * is the standard CDC-consumer contract (Delta/Kafka consumers carry
  * the same one; exactly-once needs the sink to co-commit the cursor,
  * which is what [[Mutations.refreshCountSum]]'s co-atomic `mv.applied`
  * props do for lake-table sinks).
  *
  * Scale: one poll costs O(changed files) via the feed plus two fs
  * metadata reads for the cursor — a no-change poll touches no data at
  * all, so tight polling loops are cheap at any table size.
  */
object ChangeFeed {

  /** Current cursor position: the last version whose changes were
    * processed (0 before the first successful poll — the bootstrap
    * range then starts at 0, yielding the full snapshot as inserts). */
  def cursor(cursorFile: String): Long = {
    val f = new File(cursorFile)
    if (f.exists()) new String(Files.readAllBytes(f.toPath), UTF_8).trim.toLong
    else 0L
  }

  /** One poll: if the table advanced past the cursor, hand
    * `process` the feed for `(cursor, current]` and durably advance the
    * cursor. Returns the cursor after the poll (== before when there
    * was nothing new). A poll that observes a ROLLED-BACK cursor
    * (cursor > current version — possible only if someone vacuumed and
    * re-created the table under the same path) fails loudly instead of
    * silently re-reading history. */
  def followOnce(spark: SparkSession, table: String, cursorFile: String)
                (process: (DataFrame, Long, Long) => Unit): Long = {
    val fromV = cursor(cursorFile)
    val toV = Snapshots.currentVersion(table)
    require(fromV <= toV,
      s"followOnce($table): cursor $fromV is ahead of table version $toV — " +
        "the table was recreated under this path; delete the cursor to " +
        "re-bootstrap deliberately")
    if (fromV == toV) return fromV
    process(Snapshots.changes(spark, table, fromV, toV), fromV, toV)
    // durable advance: tmp + atomic move, fsync'd — a torn cursor could
    // otherwise skip or double-skip a range after a crash
    val f = new File(cursorFile)
    Option(f.getParentFile).foreach(_.mkdirs())
    val tmp = new File(f.getParentFile, s".${f.getName}.tmp")
    val ch = java.nio.channels.FileChannel.open(tmp.toPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    try { ch.write(java.nio.ByteBuffer.wrap(toV.toString.getBytes(UTF_8))); ch.force(true) }
    finally ch.close()
    Files.move(tmp.toPath, f.toPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    toV
  }
}
