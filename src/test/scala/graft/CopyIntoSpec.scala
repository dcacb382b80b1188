package graft

import graft.ops.lake.{CopyInto, Mutations, Snapshots}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** COPY INTO contracts: re-runs ingest only new files; the applied-
  * batch cursor survives unrelated commits (it is table metadata, not
  * checkpoint state); and the crash window between a batch's commit
  * and the checkpoint write replays WITHOUT duplicating — the exact
  * failure the `tbl.copy.applied` bookkeeping exists for. */
class CopyIntoSpec extends AnyFunSuite with SparkFixture {

  private def df(rows: (Long, String, Double)*) = {
    import spark.implicits._
    rows.toDF("id", "day", "v")
  }

  private def rows(t: String): Seq[(Long, String, Double)] =
    Mutations.readMerged(spark, t).select("id", "day", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq

  test("idempotent re-runs; cursor survives unrelated DML; crash-window replay") {
    val table = tmp("copy-tbl")
    val src = tmp("copy-src")
    df((1L, "a", 1.0), (2L, "b", 2.0)).write.mode("append").parquet(src)

    CopyInto.copyInto(spark, table, src, "day")
    assert(rows(table) == Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    assert(CopyInto.appliedBatch(table, src) == 0L)

    // re-run with nothing new: no commit at all
    val v1 = Snapshots.currentVersion(table)
    CopyInto.copyInto(spark, table, src, "day")
    assert(Snapshots.currentVersion(table) == v1)

    // unrelated DML between runs must not reset the cursor (tbl.-
    // namespace props inherit across every commit)
    Mutations.deleteWhere(spark, table, col("id") === 2L)
    assert(CopyInto.appliedBatch(table, src) == 0L)

    // crash-window simulation: snapshot the checkpoint BEFORE the next
    // batch, run it (commit + checkpoint advance), then restore the
    // stale checkpoint — the re-drain replays the same batchId and the
    // bookkeeping must skip it (rows committed once, not twice)
    val ckpt = new java.io.File(table, "_copy")
    val saved = tmp("copy-ckpt-saved")
    def copyDir(a: java.io.File, b: java.io.File): Unit = {
      b.mkdirs()
      Option(a.listFiles()).toSeq.flatten.foreach { f =>
        val d = new java.io.File(b, f.getName)
        if (f.isDirectory) copyDir(f, d)
        else java.nio.file.Files.copy(f.toPath, d.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    copyDir(ckpt, new java.io.File(saved))
    df((3L, "c", 3.0)).write.mode("append").parquet(src)
    CopyInto.copyInto(spark, table, src, "day")
    assert(rows(table) == Seq((1L, "a", 1.0), (3L, "c", 3.0)))
    assert(CopyInto.appliedBatch(table, src) == 1L)
    // restore the pre-batch checkpoint: the table remembers batch 1,
    // the checkpoint does not — replay must be a no-op
    def deleteDir(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(deleteDir); f.delete()
    }
    deleteDir(ckpt)
    copyDir(new java.io.File(saved), ckpt)
    val v2 = Snapshots.currentVersion(table)
    CopyInto.copyInto(spark, table, src, "day")
    assert(rows(table) == Seq((1L, "a", 1.0), (3L, "c", 3.0)),
      "a replayed batch must not duplicate rows")
    assert(Snapshots.currentVersion(table) == v2,
      "a replayed batch must not commit a new version")

    // after the replayed drain the checkpoint has re-advanced: genuinely
    // new files keep flowing
    df((4L, "d", 4.0)).write.mode("append").parquet(src)
    CopyInto.copyInto(spark, table, src, "day")
    assert(rows(table) ==
      Seq((1L, "a", 1.0), (3L, "c", 3.0), (4L, "d", 4.0)))
    assert(CopyInto.appliedBatch(table, src) == 2L)

    // two sources, independent cursors
    val src2 = tmp("copy-src2")
    df((9L, "z", 9.0)).write.mode("append").parquet(src2)
    CopyInto.copyInto(spark, table, src2, "day")
    assert(rows(table).map(_._1) == Seq(1L, 3L, 4L, 9L))
    assert(CopyInto.appliedBatch(table, src) == 2L)
    assert(CopyInto.appliedBatch(table, src2) == 0L)
  }

  test("RESTORE across copy commits: resetCursor re-bootstraps cleanly") {
    val table = tmp("copy-rb-tbl")
    val src = tmp("copy-rb-src")
    // v1 = a non-copy baseline, so the rollback target holds no copy rows
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      df((100L, "x", 100.0)), table, "day", "id"))
    df((1L, "a", 1.0)).write.mode("append").parquet(src)
    CopyInto.copyInto(spark, table, src, "day")                       // v2
    df((2L, "b", 2.0)).write.mode("append").parquet(src)
    CopyInto.copyInto(spark, table, src, "day")                       // v3
    assert(rows(table).map(_._1) == Seq(1L, 2L, 100L))
    // roll back past EVERY copy commit: rows and cursor rewind together,
    // but the checkpoint still considers both files seen — a plain
    // re-run must NOT silently skip them forever; resetCursor is the
    // documented recovery
    Snapshots.rollback(table, 1L)
    assert(rows(table).map(_._1) == Seq(100L))
    assert(CopyInto.appliedBatch(table, src) == -1L,
      "rollback rewinds the cursor with the rows")
    CopyInto.resetCursor(table, src)
    CopyInto.copyInto(spark, table, src, "day")
    assert(rows(table).map(_._1) == Seq(1L, 2L, 100L),
      "reset + re-run re-ingests the full directory exactly once")
  }

  test("a pre-canonicalization cursor keeps its raw-hash identity") {
    val table = tmp("copy-legacy-tbl")
    val src = tmp("copy-legacy-src")
    df((1L, "a", 1.0)).write.mode("append").parquet(src)
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      df((100L, "x", 0.0)), table, "day", "id"))
    // simulate a legacy cursor: the prop keyed on the RAW (un-
    // canonicalized) spelling's hash, as pre-r12 code wrote it
    val weird = src + "/." // spelling whose raw hash differs from canonical
    def md5h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    assert(md5h(weird) != md5h(new java.io.File(weird).getCanonicalPath))
    Snapshots.commitProps(table, Map(s"tbl.copy.applied.${md5h(weird)}" -> "5"))
    // same spelling: the legacy identity is adopted, not orphaned (an
    // orphaned cursor would read -1 and re-ingest the whole directory)
    assert(CopyInto.appliedBatch(table, weird) == 5L,
      "legacy raw-hash cursor must keep its identity under the same spelling")
    // a spelling with NO legacy cursor uses the canonical identity
    assert(CopyInto.appliedBatch(table, src) == -1L)
  }

  test("path spelling variants of one source share one cursor") {
    val table = tmp("copy-canon-tbl")
    val src = tmp("copy-canon-src")
    df((1L, "a", 1.0)).write.mode("append").parquet(src)
    CopyInto.copyInto(spark, table, src, "day")
    val v1 = Snapshots.currentVersion(table)
    // same directory, different spellings: trailing slash and a
    // dot-segment detour — a fresh cursor here would silently
    // re-ingest the file (r11 advisor find); canonicalization must
    // collapse all three to ONE seen-files log
    CopyInto.copyInto(spark, table, src + "/", "day")
    CopyInto.copyInto(spark, table,
      new java.io.File(src).getParent + "/./" + new java.io.File(src).getName,
      "day")
    assert(Snapshots.currentVersion(table) == v1,
      "a respelled source path minted a fresh cursor and re-ingested")
    assert(rows(table) == Seq((1L, "a", 1.0)))
    // and a genuinely NEW file still arrives through any spelling
    df((2L, "b", 2.0)).write.mode("append").parquet(src)
    CopyInto.copyInto(spark, table, src + "/", "day")
    assert(rows(table) == Seq((1L, "a", 1.0), (2L, "b", 2.0)))
  }
}
