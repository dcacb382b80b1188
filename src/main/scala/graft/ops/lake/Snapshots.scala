package graft.ops.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, StandardCopyOption}

/** Minimal lakehouse commit protocol — the snapshot/manifest layer the
  * rewrite ops (partition overwrite, targeted delete, compaction, dual
  * write) need so a reader concurrent with a rewrite sees the OLD table
  * or the NEW table, never a mix.
  *
  * The reference has no such layer (its rewrite is `mode=overwrite` to
  * GCS/BigQuery — `ingest_binance_last_3_days.py:141-144` — with the
  * same torn-view window); this is the published Delta/Iceberg commit
  * shape reduced to its two load-bearing moves:
  *
  *   1. DATA FILES ARE IMMUTABLE AND NEVER OVERWRITTEN. Every write
  *      stages NEW files under a fresh `data/<token>/` directory; a
  *      rewrite "replaces" rows only by publishing a manifest that
  *      stops listing the old files.
  *   2. THE MANIFEST RENAME IS THE COMMIT. A snapshot is a text file
  *      `_graft_log/manifest-<v>.txt` listing every data file in the
  *      table (one `relpath\ttag` line per file); the LIVE snapshot is
  *      simply the highest committed `v`. Writers prepare
  *      `manifest-<v>.tmp` and atomically rename it to its final FRESH
  *      name — readers ignore `.tmp`, and a crash at any earlier point
  *      leaves the previous snapshot live and only orphan data files
  *      behind (reclaimed by [[vacuum]], which deletes data files the
  *      CURRENT manifest doesn't reference — deferred, so in-flight
  *      readers of the old snapshot finish against intact files).
  *
  * The `tag` column is the file-level partition value (each staged file
  * holds exactly one tag — enforced at stage time): partition pruning
  * happens against MANIFEST LINES, before any file is opened, which is
  * the Iceberg file-skipping shape and degrades to nothing at 100 TB —
  * the log grows with file count, never row count, and the planner
  * reads one small text file per query.
  *
  * Single-writer per table is assumed (the Delta-without-a-locking-
  * service contract): two concurrent committers could both prepare
  * `v+1`, and the second atomic rename to the same fresh name would
  * fail — surfaced, not silent.
  */
object Snapshots {

  private def logDir(table: String): File = new File(table, "_graft_log")

  // anchored, \d{9,}: a version past 10^9 outgrows the %09d padding and
  // an unanchored \d{9} would silently parse its first nine digits —
  // wrong version, not an error
  private val ManifestRe = raw"^manifest-(\d{9,})\.txt$$".r

  /** Highest committed snapshot version, 0 when the table is empty. */
  def currentVersion(table: String): Long =
    Option(logDir(table).listFiles()).toSeq.flatten
      .flatMap(f => ManifestRe.findFirstMatchIn(f.getName).map(_.group(1).toLong))
      .sorted.lastOption.getOrElse(0L)

  private def manifestFile(table: String, v: Long): File =
    new File(logDir(table), f"manifest-$v%09d.txt")

  /** The live snapshot's `(relpath, tag)` entries (empty ⇒ no commit yet). */
  def entries(table: String): Seq[(String, String)] = {
    val v = currentVersion(table)
    if (v == 0) Seq.empty else entriesOf(manifestFile(table, v))
  }

  private def entriesOf(mf: File): Seq[(String, String)] =
    new String(Files.readAllBytes(mf.toPath), UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty).map { line =>
        line.split("\t", 2) match {
          case Array(p, t) => (p, t)
          case Array(p)    => (p, "")
        }
      }

  /** Read the live snapshot — optionally pruned by file tag BEFORE any
    * file is opened (manifest-level partition pruning). */
  def read(spark: SparkSession, table: String,
           tagFilter: String => Boolean = _ => true): DataFrame =
    readVersion(spark, table, currentVersion(table), tagFilter)

  /** TIME TRAVEL: read snapshot `v` exactly as it was committed. Free
    * given the manifest log — every manifest is a complete file list,
    * and data files are immutable — valid until a [[vacuum]] (which
    * drops superseded manifests along with their unreferenced files,
    * the retention boundary).
    *
    * Known limitation: a committed snapshot whose manifest lists ZERO
    * files (a remove-everything commit) cannot be read back — parquet
    * needs at least one file to carry the schema, so the `require`
    * below fires. Delta/Iceberg solve this by persisting the schema in
    * the log; here a full-table delete should drop/recreate the table
    * instead. */
  def readVersion(spark: SparkSession, table: String, v: Long,
                  tagFilter: String => Boolean = _ => true): DataFrame = {
    val mf = manifestFile(table, v)
    require(mf.exists(), s"snapshot v$v of $table does not exist (vacuumed or never committed)")
    val fs = entriesOf(mf).collect { case (p, t) if tagFilter(t) => s"$table/$p" }
    require(fs.nonEmpty, s"snapshot read of $table v$v matched no files")
    spark.read.parquet(fs: _*)
  }

  /** Stage `df` as immutable data files under a fresh `data/<token>/`
    * dir, each file holding exactly ONE `tagCol` value — the invariant
    * manifest-level pruning needs. The guarantee comes from the WRITER
    * LAYOUT, not a post-hoc check: the tag is duplicated into a `__tag`
    * directory column and written `partitionBy(__tag)` (a `repartition`
    * by tag alone could hash two tags into one task ⇒ one mixed file),
    * while the original column stays IN the data files so explicit-file
    * reads keep the full schema. The tag per file then parses straight
    * from the path the writer encoded — no verification scan. Returns
    * the staged `(relpath, tag)` entries; NOTHING is visible to readers
    * until [[commit]] publishes them. */
  def stage(df: DataFrame, table: String, tagCol: String): Seq[(String, String)] = {
    import org.apache.spark.sql.functions._
    val token = "data/d" + java.util.UUID.randomUUID().toString.take(12)
    val dir = s"$table/$token"
    df.withColumn("__tag", col(tagCol).cast("string"))
      .repartition(col(tagCol)) // one file per tag per task, not per input task
      .write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
      .partitionBy("__tag").parquet(dir)
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    val root = new File(table).toPath
    walk(new File(dir))
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val rel = root.relativize(f.toPath).toString
        val tag = rel.split('/').collectFirst {
          case s if s.startsWith("__tag=") =>
            java.net.URLDecoder.decode(s.substring("__tag=".length), "UTF-8")
        }.getOrElse(sys.error(s"staged file $rel carries no tag segment"))
        (rel, tag)
      }.sortBy(_._1)
  }

  /** Prepared-but-uncommitted manifest: the full next file list and the
    * version it will commit as ([[commitPair]] persists these in the
    * intent record so a crashed cross-sink transaction can complete). */
  final case class Prepared(table: String, version: Long, lines: Seq[(String, String)])

  /** Compute snapshot `v+1` = (current entries NOT `remove`d) ++ `add`.
    * Pure metadata — no file IO beyond reading the current manifest. */
  def prepare(table: String, add: Seq[(String, String)],
              remove: ((String, String)) => Boolean = _ => false): Prepared =
    Prepared(table, currentVersion(table) + 1,
      entries(table).filterNot(remove) ++ add)

  /** Write bytes to `tmp` and FORCE them to storage before the caller's
    * atomic rename — without the `force(true)`, a power loss after the
    * rename can journal the directory entry but not the data, leaving a
    * committed-looking manifest with truncated content (process-crash
    * consistency never needed this; power-loss consistency does). */
  private def writeDurable(tmp: File, bytes: Array[Byte]): Unit = {
    val ch = java.nio.channels.FileChannel.open(tmp.toPath,
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE)
    try { ch.write(java.nio.ByteBuffer.wrap(bytes)); ch.force(true) }
    finally ch.close()
  }

  /** Publish a prepared manifest: write `.tmp`, force to storage,
    * ATOMIC rename to the fresh final name. Idempotent: if this exact
    * version is already committed (a recovery re-run), it is left
    * alone. Returns the committed version. */
  def commitPrepared(p: Prepared): Long = {
    val dir = logDir(p.table)
    dir.mkdirs()
    val dst = manifestFile(p.table, p.version)
    if (!dst.exists()) {
      val tmp = new File(dir, s"manifest-${p.version}.tmp-${java.util.UUID.randomUUID}")
      writeDurable(tmp, p.lines.map { case (f, t) => s"$f\t$t" }.mkString("\n").getBytes(UTF_8))
      Files.move(tmp.toPath, dst.toPath, StandardCopyOption.ATOMIC_MOVE)
    }
    p.version
  }

  /** Stage-free convenience: prepare + commit in one step. */
  def commit(table: String, add: Seq[(String, String)],
             remove: ((String, String)) => Boolean = _ => false): Long =
    commitPrepared(prepare(table, add, remove))

  /** Delete data files the CURRENT manifest no longer references, and
    * manifests older than the current one. Deferred by design: run it
    * only once concurrent readers of older snapshots have drained —
    * until then the old snapshot stays fully readable (that deferral IS
    * the old-XOR-new guarantee for in-flight readers). */
  def vacuum(table: String): Seq[String] = {
    val live = entries(table).map(_._1).toSet
    val cur = currentVersion(table)
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    val root = new File(table).toPath
    val dataDir = new File(table, "data")
    val orphans = walk(dataDir).filter { f =>
      val rel = root.relativize(f.toPath).toString
      f.getName.endsWith(".parquet") && !live.contains(rel)
    }
    orphans.foreach(_.delete())
    // drop now-empty staging dirs (deepest-first so nested __tag= dirs
    // empty out before their parents) and superseded manifests
    def dirsUnder(f: File): Seq[File] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.flatMap(dirsUnder) :+ f
      else Seq.empty
    dirsUnder(dataDir).dropRight(1) // keep data/ itself
      .filter(d => walk(d).forall(!_.getName.endsWith(".parquet")))
      .foreach { d => walk(d).foreach(_.delete()); d.delete() }
    Option(logDir(table).listFiles()).toSeq.flatten
      .filter(f => ManifestRe.findFirstMatchIn(f.getName)
        .exists(_.group(1).toLong < cur))
      .foreach(_.delete())
    orphans.map(f => root.relativize(f.toPath).toString)
  }

  /** OPTIMIZE for snapshot tables: bin-pack every tag fragmented across
    * >1 file into one file per tag, published as one atomic commit —
    * readers concurrent with the maintenance job keep the old snapshot
    * (and can still time-travel to it until vacuum). Content is
    * untouched: same rows, fewer files. Returns the committed version
    * (the current one if nothing is fragmented — no empty commits). */
  def compact(spark: SparkSession, table: String, tagCol: String): Long = {
    val fragmented = entries(table).groupBy(_._2).filter(_._2.size > 1)
    if (fragmented.isEmpty) currentVersion(table)
    else {
      val tags = fragmented.keySet
      val df = read(spark, table, tagFilter = tags.contains)
      commit(table, stage(df, table, tagCol), remove = e => tags.contains(e._2))
    }
  }

  /** Exactly-once STREAMING sink: each micro-batch stages invisibly and
    * commits as manifest version `batchId + 1` — [[commitPrepared]] is
    * a no-op for an already-committed version, so a replayed batch
    * (restart after a crash anywhere between stage and commit) can
    * never publish twice, and a reader sees each batch atomically or
    * not at all. Orphans from a replayed stage are vacuum fodder. The
    * sink must own the table (versions are batch-derived). Use with
    * `stream.writeStream.foreachBatch(Snapshots.batchCommitter(table,
    * tagCol))`. */
  def batchCommitter(table: String, tagCol: String)
      : (DataFrame, Long) => Unit = { (df, batchId) =>
    if (currentVersion(table) < batchId + 1 && !df.isEmpty) {
      val staged = stage(df, table, tagCol)
      commitPrepared(Prepared(table, batchId + 1,
        entries(table).filterNot(e => staged.exists(_._1 == e._1)) ++ staged))
    }
  }

  // ---- cross-sink transaction (exactly-once dual write) --------------

  /** Commit TWO tables' prepared manifests as one logical transaction.
    * The intent record (both prepared manifests, durable BEFORE either
    * commit) makes the pair recoverable: a crash between the two
    * commits leaves the intent on disk, and [[recoverPairs]] completes
    * the missing side from the recorded content — the sinks can lag,
    * but they can never diverge. This is what the reference's
    * S3+BigQuery fan-out lacks (both writes fire-and-forget). */
  def commitPair(txnDir: String, a: Prepared, b: Prepared): (Long, Long) = {
    val intent = writeIntent(txnDir, a, b)
    val ra = commitPrepared(a)
    val rb = commitPrepared(b)
    intent.delete()
    (ra, rb)
  }

  /** Durable intent record, written atomically BEFORE either commit
    * (split out so the spec can simulate a crash between the two
    * commits and prove [[recoverPairs]] converges the pair). */
  private[graft] def writeIntent(txnDir: String, a: Prepared, b: Prepared): File = {
    val dir = new File(txnDir)
    dir.mkdirs()
    val intent = new File(dir, s"txn-${java.util.UUID.randomUUID}.intent")
    val tmp = new File(dir, intent.getName + ".tmp")
    writeDurable(tmp, serialize(a, b).getBytes(UTF_8))
    Files.move(tmp.toPath, intent.toPath, StandardCopyOption.ATOMIC_MOVE)
    intent
  }

  /** Complete every interrupted [[commitPair]] under `txnDir`:
    * re-commit both sides (idempotent — already-committed versions are
    * skipped) and clear the intent. Run at writer startup. */
  def recoverPairs(txnDir: String): Int = {
    val intents = Option(new File(txnDir).listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".intent"))
    intents.foreach { f =>
      val (a, b) = deserialize(new String(Files.readAllBytes(f.toPath), UTF_8))
      commitPrepared(a)
      commitPrepared(b)
      f.delete()
    }
    intents.size
  }

  private def serialize(a: Prepared, b: Prepared): String =
    Seq(a, b).map { p =>
      (Seq(p.table, p.version.toString) ++
        p.lines.map { case (f, t) => s"$f\t$t" }).mkString("\u0001")
    }.mkString("\u0002")

  private def deserialize(s: String): (Prepared, Prepared) = {
    val Array(sa, sb) = s.split("\u0002")
    def one(x: String): Prepared = {
      val parts = x.split("\u0001").toSeq
      Prepared(parts.head, parts(1).toLong,
        parts.drop(2).map { line =>
          line.split("\t", 2) match {
            case Array(p, t) => (p, t)
            case Array(p)    => (p, "")
          }
        })
    }
    (one(sa), one(sb))
  }
}
