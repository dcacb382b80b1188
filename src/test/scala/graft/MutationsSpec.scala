package graft

import graft.ops.lake.{Mutations, Snapshots}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Row-level mutation contracts over the snapshot log: MERGE rewrites
  * exactly the files containing matched keys, deletion vectors never
  * touch data files, and the incremental MV refresh restates only the
  * tags its delta touched. */
class MutationsSpec extends AnyFunSuite with SparkFixture {

  private def df(rows: (Long, String, Double)*) = {
    import spark.implicits._
    rows.toDF("id", "day", "v")
  }

  private def sorted(d: org.apache.spark.sql.DataFrame): Seq[(Long, String, Double)] =
    d.select("id", "day", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq

  test("composite-key merge prunes candidates on EVERY key's stats") {
    import spark.implicits._
    val table = tmp("mut-merge-composite")
    // region (lead key) has 2 values — broad, prunes nothing; id is
    // selective. Z-order staging records per-file stats for BOTH, so
    // the r13 intersected prune can use the trailing key where the
    // pre-r13 lead-key-only prune kept every candidate (r12 verdict)
    val rows = (0L until 1024L).map(i => (i % 2, i, s"d${i % 4}", i.toDouble))
      .toDF("region", "id", "day", "v")
    Snapshots.commitAll(table, Snapshots.stageZOrdered(
      rows, table, "day", Seq("region", "id"), buckets = 16))
    val all = Snapshots.entriesAll(table)
    assert(all.size >= 8, s"fixture needs several files, got ${all.size}")
    val src = Seq((0L, 100L, "d0", 9.0), (1L, 101L, "d1", 9.1))
      .toDF("region", "id", "day", "v")
    val lead = Mutations.keyBoundsCandidates(src, table, "region")
    val both = Mutations.keyBoundsCandidatesAll(src, table, Seq("region", "id"))
    assert(all.count(lead) == all.size, "the broad lead key alone prunes nothing")
    assert(all.count(both) < all.size,
      s"the selective second key must prune: ${all.count(both)}/${all.size}")
    // and the merge stays correct through the intersected prune
    Mutations.mergeIntoKeys(spark, table, src, Seq("region", "id"), "day",
      whenMatchedUpdate = Some((lit(true), Map("v" -> col("s.v")))),
      whenNotMatchedInsert = Some(lit(true)))
    val got = Mutations.readMerged(spark, table)
      .filter(col("id").isin(100L, 101L)).select("region", "id", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((0L, 100L, 9.0), (1L, 101L, 9.1)))
  }

  test("merge on a dup-key target fails loudly; survivor dups don't trip it") {
    val table = tmp("mut-merge-dupkey")
    // a target VIOLATING the unique-key precondition: the r12 rid
    // pass-through multiplied source rows, the r13 lookup silently
    // COLLAPSED the dup block to one row (cardinality 2 → 1 — silent
    // data loss; r13 advisor find). Neither is what the caller
    // declared: a matched duplicate key now fails loudly, matching the
    // other ambiguity guards.
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (1L, "a", 2.0), (2L, "a", 3.0)),
      table, "day", "id"))
    val e = intercept[Exception] {
      Mutations.mergeInto(spark, table, df((1L, "a", 9.0)), "id", "day")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("unique target keys")),
      s"expected the dup-key MERGE guard, got: $e")
    // the failed merge must not have committed anything
    assert(sorted(Mutations.readMerged(spark, table)) ==
      Seq((1L, "a", 1.0), (1L, "a", 2.0), (2L, "a", 3.0)),
      "a refused merge leaves the target untouched")
    // a dup key among SURVIVORS (same touched file, not matched by the
    // source) is untouched by this merge and must NOT trip the guard
    Mutations.mergeInto(spark, table, df((2L, "a", 9.0)), "id", "day")
    assert(sorted(Mutations.readMerged(spark, table)) ==
      Seq((1L, "a", 1.0), (1L, "a", 2.0), (2L, "a", 9.0)),
      "survivor dup rows pass through verbatim; the matched key updates")
  }

  test("merge rewrites only files containing matched keys; inserts are append-only") {
    val table = tmp("mut-merge")
    // three single-day files; keys clustered per day so stats prune
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0), (11L, "b", 11.0),
         (20L, "c", 20.0), (21L, "c", 21.0)),
      table, "day", "id", buckets = 3))
    val before = Snapshots.entries(table).map(_._1).toSet

    // update key 10 (day b) + insert key 30 (day d): only b's file rewrites
    Mutations.mergeInto(spark, table,
      df((10L, "b", 100.0), (30L, "d", 30.0)), "id", "day")
    val after = Snapshots.entries(table).map(_._1).toSet
    val carried = before.intersect(after)
    val aTag = Snapshots.entriesAll(table).filter(e => carried(e.rel)).map(_.tag).toSet
    assert(!aTag.contains("b"), "the matched day's file must be rewritten")
    assert(aTag.intersect(Set("a", "c")).size == 2,
      s"untouched days' files must be carried by name; carried tags $aTag")
    assert(sorted(Snapshots.read(spark, table)) ==
      Seq((1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 100.0), (11L, "b", 11.0),
        (20L, "c", 20.0), (21L, "c", 21.0), (30L, "d", 30.0)))

    // pure-insert merge: no prior file rewritten at all
    val v2 = Snapshots.entries(table).map(_._1).toSet
    Mutations.mergeInto(spark, table, df((40L, "e", 40.0)), "id", "day")
    assert(v2.subsetOf(Snapshots.entries(table).map(_._1).toSet),
      "an unmatched source must reuse every prior file by name")

    // empty source: version unchanged, no empty commit
    val v = Snapshots.currentVersion(table)
    Mutations.mergeInto(spark, table, df(), "id", "day")
    assert(Snapshots.currentVersion(table) == v)
  }

  test("deletion vectors: no data file rewritten, deletes compose, history intact") {
    val table = tmp("mut-dv")
    Snapshots.commit(table, Snapshots.stage(
      df((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
         (10L, "b", 10.0), (11L, "b", 11.0)), table, "day"))
    val files = Snapshots.entries(table).map(_._1).toSet

    Mutations.deleteWhere(spark, table, col("v") < 2.0) // id 1
    Mutations.deleteWhere(spark, table, col("id") === 3L || col("id") === 10L)
    assert(Snapshots.entries(table).map(_._1).toSet == files,
      "deletion vectors must never rewrite or add data files")
    assert(sorted(Mutations.readMerged(spark, table)) ==
      Seq((2L, "a", 2.0), (11L, "b", 11.0)),
      "the second delete must fold the first file's existing vector")

    // time travel: v1 had no vectors, v2 only the first delete
    assert(sorted(Mutations.readMerged(spark, table, version = 1)).map(_._1) ==
      Seq(1L, 2L, 3L, 10L, 11L))
    assert(sorted(Mutations.readMerged(spark, table, version = 2)).map(_._1) ==
      Seq(2L, 3L, 10L, 11L))

    // no-match delete: no commit
    val v = Snapshots.currentVersion(table)
    Mutations.deleteWhere(spark, table, col("v") > 1e9)
    assert(Snapshots.currentVersion(table) == v)

    // vacuum reclaims superseded + crashed sidecars, keeps live ones:
    // every file's vector moved to the second delete's sidecar, so the
    // first delete's dir is unreferenced; the junk dir simulates a
    // delete that crashed before its commit
    new java.io.File(s"$table/dv/dv-crashed").mkdirs()
    val dvDirsBefore = new java.io.File(s"$table/dv").listFiles().length
    assert(dvDirsBefore == 3, s"expected 2 sidecars + 1 junk, got $dvDirsBefore")
    Snapshots.vacuum(table)
    val left = new java.io.File(s"$table/dv").listFiles().map(_.getName).toSeq
    assert(left.size == 1 && !left.contains("dv-crashed"),
      s"vacuum must keep exactly the live sidecar; left: $left")
    assert(sorted(Mutations.readMerged(spark, table)) ==
      Seq((2L, "a", 2.0), (11L, "b", 11.0)), "vectors intact after vacuum")
  }

  test("file ids disambiguate same-named part files across tag dirs (collision pin)") {
    val table = tmp("mut-collide")
    // a task writing several tags emits the SAME part-file NAME into
    // each of their __tag dirs; a name-keyed vector would cross-delete
    // (the r8 bug this pins). More tags than shuffle partitions forces
    // multi-tag tasks by pigeonhole, with or without AQE coalescing.
    val many = (1L to 64L).map(i => (i, s"d$i", i.toDouble))
    Snapshots.commit(table, Snapshots.stage(df(many: _*), table, "day"))
    val names = Snapshots.entries(table).map(_._1)
      .map(r => r.substring(r.lastIndexOf('/') + 1))
    assert(names.distinct.size < names.size,
      "fixture must actually produce colliding part-file names")
    Mutations.deleteWhere(spark, table, col("id") === 3L)
    assert(sorted(Mutations.readMerged(spark, table)).map(_._1) ==
      (1L to 64L).filterNot(_ == 3L),
      "a vector for one file must not delete positions in same-named files")
  }

  test("deletion vectors on a tag with spaces: URI-encoded paths still match rels") {
    // _metadata.file_path surfaces the URI form ('a b' -> 'a%20b');
    // manifest rels carry the literal filesystem name — fileIdCol's
    // url_decode must reconcile the two or vectors silently never apply
    val table = tmp("mut-dv-space")
    Snapshots.commit(table, Snapshots.stage(
      df((1L, "day one", 1.0), (2L, "day one", 2.0), (3L, "day two", 3.0)),
      table, "day"))
    Mutations.deleteWhere(spark, table, col("id") === 1L)
    assert(sorted(Mutations.readMerged(spark, table)).map(_._1) == Seq(2L, 3L),
      "the vector must apply to a file under a space-bearing tag dir")
  }

  test("deletion vectors on a tag with a literal '+': percent-decode must not eat it") {
    // url_decode alone is x-www-form-urlencoded and turns '+' into a
    // space — file ids derived from scan paths would then never match
    // manifest rels and the whole mutation layer silently no-ops (or
    // crashes) on '+'-bearing tags (review finding, r8)
    val table = tmp("mut-dv-plus")
    Snapshots.commit(table, Snapshots.stage(
      df((1L, "UTC+2", 1.0), (2L, "UTC+2", 2.0), (3L, "UTC-5", 3.0)),
      table, "day"))
    Mutations.deleteWhere(spark, table, col("id") === 1L)
    assert(sorted(Mutations.readMerged(spark, table)).map(_._1) == Seq(2L, 3L))
    // and a merge touches exactly the '+' tag's file, no duplicates
    Mutations.mergeInto(spark, table, df((2L, "UTC+2", 20.0)), "id", "day")
    assert(sorted(Mutations.readMerged(spark, table)) ==
      Seq((2L, "UTC+2", 20.0), (3L, "UTC-5", 3.0)))
  }

  test("merge with a string key: no stats prune, no crash, correct result") {
    import spark.implicits._
    val table = tmp("mut-merge-strkey")
    val data = Seq(("k1", "a", 1.0), ("k2", "b", 2.0)).toDF("id", "day", "v")
    Snapshots.commit(table, Snapshots.stage(data, table, "day"))
    Mutations.mergeInto(spark, table,
      Seq(("k2", "b", 20.0), ("k3", "c", 3.0)).toDF("id", "day", "v"), "id", "day")
    val got = Snapshots.read(spark, table).collect()
      .map(r => (r.getString(0), r.getDouble(2))).sortBy(_._1).toSeq
    assert(got == Seq(("k1", 1.0), ("k2", 20.0), ("k3", 3.0)))
  }

  test("incremental MV refresh: fold equals recompute, untouched tags carried by name") {
    val src = tmp("mut-mv-src")
    val mv = tmp("mut-mv")
    Snapshots.commit(src, Snapshots.stage(
      df((1L, "a", 1.0), (2L, "a", 2.5), (10L, "b", 10.0), (20L, "c", 20.0)),
      src, "day"))
    Mutations.refreshCountSum(spark, mv, src, 0, 1, "day", "v")
    // heal day b (replace 10.0 -> 40.0), leave a and c untouched
    Snapshots.commit(src, Snapshots.stage(df((10L, "b", 40.0)), src, "day"),
      remove = _._2 == "b")
    val aBefore = Snapshots.entriesAll(mv).filter(_.tag == "a").map(_.rel).toSet
    Mutations.refreshCountSum(spark, mv, src, 1, 2, "day", "v")
    assert(Snapshots.entriesAll(mv).filter(_.tag == "a").map(_.rel).toSet == aBefore,
      "an untouched tag's MV file must be carried by name, not recomputed")
    val got = Snapshots.read(spark, mv)
      .select(col("day"), col("n"), col("sum_v").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(got == Seq(("a", 2L, 3.5), ("b", 1L, 40.0), ("c", 1L, 20.0)))

    // applied-version bookkeeping rode each commit
    assert(Mutations.appliedVersion(mv) == 2L)

    // delete-everything delta folds a tag's count to zero -> row dropped
    Snapshots.commit(src, Snapshots.stage(df((99L, "z", 0.0)), src, "day"),
      remove = _._2 == "c")
    Mutations.refreshCountSum(spark, mv, src, 2, 3, "day", "v")
    val days = Snapshots.read(spark, mv).select("day")
      .collect().map(_.getString(0)).toSet
    assert(days == Set("a", "b", "z"), s"zero-count tag must drop from the MV; got $days")
  }

  test("updateWhere rewrites only files with matches; purge materializes vectors") {
    val table = tmp("mut-update")
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0), (11L, "b", 11.0)),
      table, "day", "id", buckets = 2))
    val before = Snapshots.entries(table).map(_._1).toSet
    Mutations.updateWhere(spark, table, col("id") === 10L,
      Map("v" -> (col("v") * 10.0)), "day",
      fileFilter = Snapshots.rangeOverlap("id", 10.0, 10.0))
    val after = Snapshots.entries(table).map(_._1).toSet
    assert(before.intersect(after).nonEmpty,
      "files without a match must be carried by name")
    assert(sorted(Snapshots.read(spark, table)) ==
      Seq((1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 100.0), (11L, "b", 11.0)))
    // no-match update: no commit
    val v = Snapshots.currentVersion(table)
    Mutations.updateWhere(spark, table, col("id") === 999L,
      Map("v" -> lit(0.0)), "day")
    assert(Snapshots.currentVersion(table) == v)

    // purge: delete -> vectors, purge -> plain files again
    Mutations.deleteWhere(spark, table, col("id") === 2L)
    Mutations.purgeVectors(spark, table, "day")
    assert(Snapshots.entriesAll(table).forall(!_.props.contains("ref.dv")),
      "purge must clear every vector reference")
    assert(sorted(Snapshots.read(spark, table)) ==
      sorted(Mutations.readMerged(spark, table)),
      "after purge the plain read IS the merged read")
    assert(sorted(Snapshots.read(spark, table)).map(_._1) == Seq(1L, 10L, 11L))
    Snapshots.vacuum(table)
    val dvLeft = Option(new java.io.File(s"$table/dv").listFiles()).toSeq.flatten
    assert(dvLeft.isEmpty, "purged sidecars must be vacuumable")
    // purge with no vectors: no commit
    val v2 = Snapshots.currentVersion(table)
    Mutations.purgeVectors(spark, table, "day")
    assert(Snapshots.currentVersion(table) == v2)
  }

  test("pruned delete: a stats filter bounds the match scan, semantics intact") {
    val table = tmp("mut-dv-pruned")
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0), (11L, "b", 11.0)),
      table, "day", "id", buckets = 2))
    // the pruning twin of id = 10: only file(s) whose id range covers 10
    // are scanned; the rest are never probed
    Mutations.deleteWhere(spark, table, col("id") === 10L,
      fileFilter = Snapshots.rangeOverlap("id", 10.0, 10.0))
    assert(sorted(Mutations.readMerged(spark, table)).map(_._1) == Seq(1L, 2L, 11L))
  }

  test("merge with schema evolution: a source carrying a new column NULL-fills survivors") {
    import spark.implicits._
    val table = tmp("mut-merge-evolve")
    Snapshots.commit(table, Snapshots.stage(
      df((1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0)), table, "day"))
    // source adds column w; key 2 matches (file a rewrites evolved),
    // key 30 inserts — untouched file b keeps its old schema
    Mutations.mergeInto(spark, table,
      Seq((2L, "a", 20.0, "x"), (30L, "c", 30.0, "y")).toDF("id", "day", "v", "w"),
      "id", "day", evolveSchema = true)
    val got = Snapshots.read(spark, table, mergeSchema = true)
      .select("id", "v", "w").collect()
      .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2))))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, 1.0, None), (2L, 20.0, Some("x")),
      (10L, 10.0, None), (30L, 30.0, Some("y"))),
      s"survivors NULL-fill, matched/inserted rows carry the new column; got $got")
    // a second evolved-schema merge over the now-mixed files still works
    Mutations.mergeInto(spark, table,
      Seq((10L, "b", 100.0, "z")).toDF("id", "day", "v", "w"),
      "id", "day", evolveSchema = true)
    val w10 = Snapshots.read(spark, table, mergeSchema = true)
      .filter(col("id") === 10L).select("v", "w").head()
    assert((w10.getDouble(0), w10.getString(1)) == ((100.0, "z")))
  }

  test("merge accepts a source whose column names differ only in case") {
    import spark.implicits._
    val table = tmp("mut-merge-case")
    Snapshots.commit(table, Snapshots.stage(
      df((1L, "a", 1.0), (2L, "a", 2.0)), table, "day"))
    // Spark resolution is case-insensitive (default caseSensitive=false):
    // a source carrying `V` for the target's `v` must merge, not trip
    // the unknown-column gate (r10 advisor find — the exact-case diff
    // demanded evolveSchema for a column the engine itself resolves)
    Mutations.mergeInto(spark, table,
      Seq((2L, "a", 200.0)).toDF("id", "day", "V"), "id", "day")
    assert(sorted(Mutations.readMerged(spark, table)) ==
      Seq((1L, "a", 1.0), (2L, "a", 200.0)))
  }

  test("schema evolution: mergeSchema read NULL-fills files staged before a column add") {
    import spark.implicits._
    val table = tmp("mut-evolve")
    Snapshots.commit(table, Snapshots.stage(
      Seq((1L, "a", 1.0)).toDF("id", "day", "v"), table, "day"))
    Snapshots.commit(table, Snapshots.stage(
      Seq((2L, "b", 2.0, "x")).toDF("id", "day", "v", "w"), table, "day"))
    val evolved = Snapshots.read(spark, table, mergeSchema = true)
    assert(evolved.columns.toSet == Set("id", "day", "v", "w"))
    val got = evolved.select("id", "w").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1).toSeq
    assert(got == Seq((1L, None), (2L, Some("x"))),
      "pre-evolution files must surface the new column as NULL")
  }

  test("change feed carries deletion-vector deletes; the MV self-corrects") {
    val src = tmp("mut-cdc-dv-src")
    val mv = tmp("mut-cdc-dv-mv")
    Snapshots.commit(src, Snapshots.stage(
      df((1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0)), src, "day"))
    Mutations.catchUp(spark, mv, src, "day", "v")

    // a DV delete commits new PROPS, not new rels — pre-fix the feed
    // was empty here and the MV kept the deleted row forever
    Mutations.deleteWhere(spark, src, col("id") === 2L)
    val feed = Snapshots.changes(spark, src, 1, 2)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(feed == Seq((2L, "delete")),
      s"the vector's newly-deleted row must surface as a delete; got $feed")
    Mutations.catchUp(spark, mv, src, "day", "v")
    val got = Snapshots.read(spark, mv)
      .select(col("day"), col("n"), col("sum_v").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(got == Seq(("a", 1L, 1.0), ("b", 1L, 10.0)),
      s"the MV must drop the deleted row's count/sum; got $got")

    // second delete on the SAME file: only the NEW position surfaces
    Mutations.deleteWhere(spark, src, col("id") === 1L)
    val feed2 = Snapshots.changes(spark, src, 2, 3)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(feed2 == Seq((1L, "delete")), s"vector growth must diff, not replay: $feed2")

    // a COW rewrite of the DV-bearing file: the delete side must NOT
    // resurrect rows the vector had already removed
    Mutations.updateWhere(spark, src, col("id") === 10L,
      Map("v" -> lit(99.0)), "day")
    val v = Snapshots.currentVersion(src)
    val feed3 = Snapshots.changes(spark, src, v - 1, v)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(r => (r._2, r._1)).toSeq
    assert(!feed3.exists(r => (r._1 == 1L || r._1 == 2L) && r._2 == "delete"),
      s"already-DV-deleted rows must not re-surface as deletes: $feed3")
    Mutations.catchUp(spark, mv, src, "day", "v")
    val got3 = Snapshots.read(spark, mv)
      .select(col("day"), col("n"), col("sum_v").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(got3 == Seq(("b", 1L, 99.0)), s"MV after delete+update fold: $got3")
  }

  test("catchUp is restartable exactly-once; gapped refreshes are rejected") {
    val src = tmp("mut-cu-src")
    val mv = tmp("mut-cu-mv")
    Snapshots.commit(src, Snapshots.stage(
      df((1L, "a", 1.0), (10L, "b", 10.0)), src, "day"))
    Mutations.catchUp(spark, mv, src, "day", "v")
    assert(Mutations.appliedVersion(mv) == 1L)
    val v = Snapshots.currentVersion(mv)
    // replay: already caught up -> no new commit (exactly-once)
    Mutations.catchUp(spark, mv, src, "day", "v")
    assert(Snapshots.currentVersion(mv) == v)

    // two source commits, ONE catch-up folds both
    Snapshots.commit(src, Snapshots.stage(df((2L, "a", 2.0)), src, "day"))
    Snapshots.commit(src, Snapshots.stage(df((10L, "b", 40.0)), src, "day"),
      remove = _._2 == "b")
    Mutations.catchUp(spark, mv, src, "day", "v")
    assert(Mutations.appliedVersion(mv) == 3L)
    val got = Snapshots.read(spark, mv)
      .select(col("day"), col("n"), col("sum_v").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(got == Seq(("a", 2L, 3.0), ("b", 1L, 40.0)))

    // a delta that skips or repeats versions is a contract violation
    val e = intercept[IllegalArgumentException] {
      Mutations.refreshCountSum(spark, mv, src, 1, 3, "day", "v")
    }
    assert(e.getMessage.contains("gap-free"), e.getMessage)
  }

  test("change feed across a rollback crossing a deleteWhere: resurrections surface") {
    val src = tmp("mut-rb-dv-src")
    val mv = tmp("mut-rb-dv-mv")
    Snapshots.commit(src, Snapshots.stage(
      df((1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0)), src, "day"))
    Mutations.catchUp(spark, mv, src, "day", "v")       // applied = 1
    Mutations.deleteWhere(spark, src, col("id") === 2L) // v2: DV on a's file
    Mutations.catchUp(spark, mv, src, "day", "v")       // folds the delete
    Snapshots.rollback(src, 1)                          // v3: the DV vanishes on a SHARED rel
    // pre-fix this threw NoSuchElementException (no to-side DV to .get);
    // the fixed feed emits the resurrected row as an insert
    val feed = Snapshots.changes(spark, src, 2, 3)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(feed == Seq((2L, "insert")),
      s"a rollback across a delete must resurrect the row in the feed; got $feed")
    Mutations.catchUp(spark, mv, src, "day", "v")
    def mvRows() = Snapshots.read(spark, mv)
      .select(col("day"), col("n"), col("sum_v").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(mvRows() == Seq(("a", 2L, 3.0), ("b", 1L, 10.0)),
      s"the MV must fold the resurrection; got ${mvRows()}")

    // MIXED case: one rel's vector shrinks while the delete that
    // rolled back had touched two files — only the folded-away
    // position resurrects, per (file, position)
    Mutations.deleteWhere(spark, src, col("id") === 1L || col("id") === 10L) // v4: DVs on a AND b
    Mutations.deleteWhere(spark, src, col("id") === 2L)                      // v5: folds a's vector
    Snapshots.rollback(src, 4)                                               // v6: a shrinks, b unchanged
    val feed2 = Snapshots.changes(spark, src, 5, 6)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(feed2 == Seq((2L, "insert")),
      s"only the folded-away position resurrects; got $feed2")
    Mutations.catchUp(spark, mv, src, "day", "v")
    assert(mvRows() == Seq(("a", 1L, 2.0)),
      s"MV after the mixed rollback; got ${mvRows()}")
  }

  test("wide delete writes a multi-shard sidecar; no data file rewritten") {
    val table = tmp("mut-dv-shard")
    val rows = (1L to 200L).map(i => (i, s"d${i % 8}", i.toDouble))
    Snapshots.commit(table, Snapshots.stage(df(rows: _*), table, "day"))
    val files = Snapshots.entries(table).map(_._1).toSet
    Mutations.deleteWhere(spark, table, col("id") % 2 === 0)
    assert(Snapshots.entries(table).map(_._1).toSet == files,
      "the vector path must never rewrite data files")
    val dvDirs = Option(new java.io.File(s"$table/dv").listFiles()).toSeq.flatten
      .filter(_.isDirectory)
    assert(dvDirs.size == 1)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    val parts = walk(dvDirs.head).count(_.getName.endsWith(".parquet"))
    assert(parts > 1, s"the sidecar must shard across tasks (r8 wrote 1 file); got $parts")
    assert(sorted(Mutations.readMerged(spark, table)).map(_._1) == (1L to 199L by 2))
  }

  test("deleteWhere crossover: large deletes route to copy-on-write, small stay MOR") {
    val table = tmp("mut-dv-cow")
    Snapshots.commit(table, Snapshots.stage(
      df((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
         (10L, "b", 10.0), (11L, "b", 11.0), (12L, "b", 12.0), (13L, "b", 13.0)),
      table, "day"))
    // 1 of b's 4 rows = 0.25 < 0.3 threshold: stays merge-on-read
    Mutations.deleteWhere(spark, table, col("id") === 10L, cowTagCol = Some("day"))
    assert(Snapshots.entriesAll(table).filter(_.tag == "b")
      .forall(_.props.contains("ref.dv")), "a small delete must stay on the vector path")
    // 2 of a's 3 rows = 0.67 >= 0.3: copy-on-write — file rewritten, no vector
    Mutations.deleteWhere(spark, table, col("id") <= 2L, cowTagCol = Some("day"))
    val aEntries = Snapshots.entriesAll(table).filter(_.tag == "a")
    assert(aEntries.nonEmpty && aEntries.forall(!_.props.contains("ref.dv")),
      "a large delete must materialize instead of growing a vector")
    assert(sorted(Mutations.readMerged(spark, table)) ==
      Seq((3L, "a", 3.0), (11L, "b", 11.0), (12L, "b", 12.0), (13L, "b", 13.0)))
    // a full-wipe COW would leave a zero-file (unreadable) snapshot:
    // such deletes stay on the vector path and read back empty
    Mutations.deleteWhere(spark, table, lit(true), cowTagCol = Some("day"))
    assert(Mutations.readMerged(spark, table).count() == 0,
      "full-table delete must stay readable (as empty) via the vector path")
    // reorg on the fully-deleted table must NOT materialize it into a
    // zero-file snapshot — same readable-as-empty policy
    val vWiped = Snapshots.currentVersion(table)
    Mutations.reorgIfNeeded(spark, table, "day")
    assert(Snapshots.currentVersion(table) == vWiped &&
      Mutations.readMerged(spark, table).count() == 0,
      "reorg of a fully-deleted table must no-op, keeping it readable")
  }

  test("zero-file commits are refused: clause merge and MV refresh guards") {
    // clause merge whose delete clause empties every file: refuse
    // BEFORE the commit, table untouched
    val table = tmp("mut-zero-merge")
    Snapshots.commit(table, Snapshots.stage(
      df((1L, "a", 1.0), (2L, "a", 2.0)), table, "day"))
    val v = Snapshots.currentVersion(table)
    val e1 = intercept[IllegalArgumentException] {
      Mutations.mergeIntoClauses(spark, table, df((1L, "a", 0.0), (2L, "a", 0.0)),
        "id", "day", whenMatchedDelete = Some(lit(true)))
    }
    assert(e1.getMessage.contains("zero-file"), e1.getMessage)
    assert(Snapshots.currentVersion(table) == v &&
      sorted(Snapshots.read(spark, table)).map(_._1) == Seq(1L, 2L),
      "the refused merge must leave the table untouched")

    // MV refresh whose delta empties every tag: refuse pre-commit,
    // applied version not advanced, retry after new data converges
    val src = tmp("mut-zero-src")
    val mv = tmp("mut-zero-mv")
    Snapshots.commit(src, Snapshots.stage(df((1L, "a", 1.0)), src, "day"))
    Mutations.catchUp(spark, mv, src, "day", "v")
    Mutations.deleteWhere(spark, src, lit(true))
    val e2 = intercept[IllegalArgumentException] {
      Mutations.catchUp(spark, mv, src, "day", "v")
    }
    assert(e2.getMessage.contains("zero-file"), e2.getMessage)
    assert(Mutations.appliedVersion(mv) == 1L, "nothing applied on refusal")
    // new data arrives; the retried catch-up folds the whole gap
    Snapshots.commit(src, Snapshots.stage(df((2L, "b", 5.0)), src, "day"))
    Mutations.catchUp(spark, mv, src, "day", "v")
    val got = Snapshots.read(spark, mv)
      .select(col("day"), col("n"), col("sum_v").cast("double")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(("b", 1L, 5.0)), s"retry must converge; got $got")

    // typo'd SET column: analysis error, not a silent no-op
    val e3 = intercept[IllegalArgumentException] {
      Mutations.mergeIntoClauses(spark, table, df((1L, "a", 9.0)), "id", "day",
        whenMatchedUpdate = Some((lit(true), Map("vv" -> lit(0.0)))))
    }
    assert(e3.getMessage.contains("unknown column"), e3.getMessage)
  }

  test("reorgIfNeeded converges heavy vectors to plain files; light ones keep theirs") {
    val table = tmp("mut-reorg")
    val rows = (1L to 10L).map(i => (i, "a", i.toDouble)) ++
      (11L to 20L).map(i => (i, "b", i.toDouble))
    Snapshots.commit(table, Snapshots.stage(df(rows: _*), table, "day"))
    // a: 2/10 = 0.2 below the 0.3 trigger -> reorg no-ops
    Mutations.deleteWhere(spark, table, col("id").isin(1L, 2L))
    val v = Snapshots.currentVersion(table)
    Mutations.reorgIfNeeded(spark, table, "day")
    assert(Snapshots.currentVersion(table) == v, "below-threshold vectors must stay put")
    // fold a to 4/10 = 0.4 (heavy), give b 1/10 = 0.1 (light)
    Mutations.deleteWhere(spark, table, col("id").isin(3L, 4L, 11L))
    val vDel = Snapshots.currentVersion(table)
    Mutations.reorgIfNeeded(spark, table, "day")
    val vReorg = Snapshots.currentVersion(table)
    assert(vReorg == vDel + 1, "reorg must commit once")
    val es = Snapshots.entriesAll(table)
    assert(es.filter(_.tag == "a").forall(!_.props.contains("ref.dv")),
      "the heavy file must converge to vector-free")
    assert(es.filter(_.tag == "b").forall(_.props.contains("ref.dv")),
      "the light file must keep its vector")
    assert(sorted(Mutations.readMerged(spark, table)).map(_._1) ==
      ((5L to 10L) ++ (12L to 20L)))
    // time travel: the pre-reorg version still applies its vectors
    assert(sorted(Mutations.readMerged(spark, table, version = vDel)).map(_._1) ==
      ((5L to 10L) ++ (12L to 20L)))
    // the rewrite cancels in the change feed (delete+insert of the same rows)
    val fr = Snapshots.changes(spark, table, vDel, vReorg)
    val dels = fr.filter(col("_change_type") === "delete")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val ins = fr.filter(col("_change_type") === "insert")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(dels == ins && dels == (5L to 10L).toSeq,
      s"reorg must cancel in the feed; deletes $dels inserts $ins")
  }

  test("conditional MERGE: delete/update/insert clauses, s/t references, DV matched-ness") {
    val table = tmp("mut-clauses")
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0), (20L, "c", 20.0)),
      table, "day", "id", buckets = 3))
    val before = Snapshots.entries(table).map(_._1).toSet
    // key 1: matched, s.v < 5 -> DELETE; key 10: matched, s.v > t.v -> UPDATE;
    // key 30: unmatched, v >= 0 -> INSERT; key 40: unmatched, cond false -> dropped
    Mutations.mergeIntoClauses(spark, table,
      df((1L, "a", 0.0), (10L, "b", 100.0), (30L, "d", 30.0), (40L, "e", -1.0)),
      "id", "day",
      whenMatchedDelete = Some(col("s.v") < 5.0),
      whenMatchedUpdate = Some((col("s.v") > col("t.v"), Map("v" -> col("s.v")))),
      whenNotMatchedInsert = Some(col("v") >= 0.0))
    assert(sorted(Mutations.readMerged(spark, table)) ==
      Seq((2L, "a", 2.0), (10L, "b", 100.0), (20L, "c", 20.0), (30L, "d", 30.0)))
    val carriedTags = Snapshots.entriesAll(table)
      .filter(e => before(e.rel)).map(_.tag).toSet
    assert(carriedTags.contains("c"), "files without a matched key carry by name")

    // matched but no clause fires: row survives verbatim
    Mutations.mergeIntoClauses(spark, table, df((20L, "c", 5.0)), "id", "day",
      whenMatchedUpdate = Some((col("s.v") > col("t.v"), Map("v" -> col("s.v")))))
    assert(sorted(Mutations.readMerged(spark, table)).contains((20L, "c", 20.0)))

    // no matched clause at all: pure filtered-insert append, no rewrite
    val files2 = Snapshots.entries(table).map(_._1).toSet
    Mutations.mergeIntoClauses(spark, table,
      df((50L, "f", 50.0), (2L, "a", 99.0)), "id", "day",
      whenNotMatchedInsert = Some(lit(true)))
    assert(files2.subsetOf(Snapshots.entries(table).map(_._1).toSet),
      "an insert-only merge must reuse every prior file by name")
    val now = sorted(Mutations.readMerged(spark, table))
    assert(now.contains((2L, "a", 2.0)) && now.contains((50L, "f", 50.0)),
      s"matched row untouched, unmatched inserted; got $now")

    // matched-ness is decided on the MERGED state: a DV-deleted key re-inserts
    Mutations.deleteWhere(spark, table, col("id") === 30L)
    Mutations.mergeIntoClauses(spark, table, df((30L, "d", 33.0)), "id", "day",
      whenNotMatchedInsert = Some(lit(true)))
    assert(sorted(Mutations.readMerged(spark, table)).contains((30L, "d", 33.0)),
      "a key alive only in DV-deleted rows must NOT match")

    // all clauses condition away: no commit
    val v = Snapshots.currentVersion(table)
    Mutations.mergeIntoClauses(spark, table, df((60L, "g", -5.0)), "id", "day",
      whenNotMatchedInsert = Some(col("v") >= 0.0))
    assert(Snapshots.currentVersion(table) == v, "a no-op merge must not commit")
  }

  test("touched-tag recompute MV: min/max stay correct across heal and DV delete") {
    val src = tmp("mut-tagmv-src")
    val mv = tmp("mut-tagmv-mv")
    Snapshots.commit(src, Snapshots.stage(
      df((1L, "a", 5.0), (2L, "a", 9.0), (10L, "b", 10.0), (20L, "c", 20.0)),
      src, "day"))
    val aggs = Seq(count(lit(1)).as("n"),
      min(col("v")).cast("double").as("mn"), max(col("v")).cast("double").as("mx"))
    Mutations.catchUpTags(spark, mv, src, "day", aggs)
    def rows() = Snapshots.read(spark, mv).select("day", "n", "mn", "mx").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(rows() == Seq(("a", 2L, 5.0, 9.0), ("b", 1L, 10.0, 10.0), ("c", 1L, 20.0, 20.0)))

    // DV-delete the MAX of day a — exactly what a signed fold cannot
    // maintain; the touched-tag recompute must re-derive it
    Mutations.deleteWhere(spark, src, col("id") === 2L)
    val aFile = Snapshots.entriesAll(mv).filter(_.tag == "a").map(_.rel).toSet
    val cFile = Snapshots.entriesAll(mv).filter(_.tag == "c").map(_.rel).toSet
    Mutations.catchUpTags(spark, mv, src, "day", aggs)
    assert(rows() == Seq(("a", 1L, 5.0, 5.0), ("b", 1L, 10.0, 10.0), ("c", 1L, 20.0, 20.0)))
    assert(Snapshots.entriesAll(mv).filter(_.tag == "c").map(_.rel).toSet == cFile,
      "untouched tags' MV files must carry by name")
    assert(Snapshots.entriesAll(mv).filter(_.tag == "a").map(_.rel).toSet != aFile,
      "the touched tag must restate")

    // heal b (rel swap) + DV-delete ALL of c, one catch-up: b restates,
    // c's group vanishes so its MV rows drop
    Snapshots.commit(src, Snapshots.stage(df((10L, "b", 40.0)), src, "day"),
      remove = _._2 == "b")
    Mutations.deleteWhere(spark, src, col("id") === 20L)
    Mutations.catchUpTags(spark, mv, src, "day", aggs)
    assert(rows() == Seq(("a", 1L, 5.0, 5.0), ("b", 1L, 40.0, 40.0)))

    // exactly-once replay + gap guard (same contract as the abelian MV)
    val vv = Snapshots.currentVersion(mv)
    Mutations.catchUpTags(spark, mv, src, "day", aggs)
    assert(Snapshots.currentVersion(mv) == vv)
    val e = intercept[IllegalArgumentException] {
      Mutations.refreshTagsRecompute(spark, mv, src, 1, 2, "day", aggs)
    }
    assert(e.getMessage.contains("gap-free"))
  }

  test("bootstrap refresh onto an MV with rows but no bookkeeping is rejected") {
    val src = tmp("mut-guard-src")
    val mv = tmp("mut-guard-mv")
    Snapshots.commit(src, Snapshots.stage(df((1L, "a", 1.0)), src, "day"))
    Mutations.catchUp(spark, mv, src, "day", "v")
    // a props-dropping direct commit simulates maintenance outside the
    // MV protocol: appliedVersion falls back to 0 while the rows stay
    Snapshots.commit(mv, Seq.empty)
    Snapshots.commit(src, Snapshots.stage(df((2L, "a", 2.0)), src, "day"))
    val e = intercept[IllegalArgumentException] {
      Mutations.catchUp(spark, mv, src, "day", "v")
    }
    assert(e.getMessage.contains("bootstrap"),
      s"double-fold hole must be guarded, not silently double-counted: ${e.getMessage}")
  }

  test("full mutation surface tracks a pure model under a random op sequence") {
    val rnd = new scala.util.Random(1234)
    val table = tmp("mut-model")
    // model per committed VERSION (rollback needs history); rows keyed
    // by id — ids are unique across the whole run
    var model = Map.empty[Long, (String, Double)] // id -> (day, v)
    var history = Map.empty[Long, Map[Long, (String, Double)]] // version -> model
    var nextId = 0L
    def snapshot(): Unit = { history += Snapshots.currentVersion(table) -> model }
    def freshRows(tag: String, n: Int): Seq[(Long, String, Double)] =
      (1 to n).map { _ => nextId += 1; (nextId, tag, rnd.nextInt(1000).toDouble) }
    def check(step: Int): Unit = {
      val got = sorted(Mutations.readMerged(spark, table))
      val want = model.toSeq.map { case (id, (d, v)) => (id, d, v) }.sortBy(_._1)
      assert(got == want, s"diverged at step $step")
    }
    // seed
    val seed = freshRows("a", 3) ++ freshRows("b", 3)
    Snapshots.commit(table, Snapshots.stage(df(seed: _*), table, "day"))
    model = seed.map(r => r._1 -> ((r._2, r._3))).toMap
    snapshot()
    for (step <- 1 to 25) {
      val tag = Seq("a", "b", "c")(rnd.nextInt(3))
      rnd.nextInt(9) match {
        case 0 => // append
          val rows = freshRows(tag, 1 + rnd.nextInt(3))
          Snapshots.commit(table, Snapshots.stage(df(rows: _*), table, "day"))
          model ++= rows.map(r => r._1 -> ((r._2, r._3)))
        case 1 => // merge: update half of tag's rows, insert one
          val upd = model.collect { case (id, (d, v)) if d == tag && id % 2 == 0 =>
            (id, d, v + 10000.0) }.toSeq
          val ins = freshRows(tag, 1)
          Mutations.mergeInto(spark, table, df(upd ++ ins: _*), "id", "day")
          model ++= (upd ++ ins).map(r => r._1 -> ((r._2, r._3)))
        case 2 if model.nonEmpty => // delete of 1-2 random ids; the crossover
          // policy (randomly armed) may route it MOR or COW — content identical
          val ids = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(2))
          Mutations.deleteWhere(spark, table, col("id").isin(ids: _*),
            cowTagCol = if (rnd.nextBoolean()) Some("day") else None)
          model --= ids
        case 3 if model.nonEmpty => // COW update of one random id
          val id = rnd.shuffle(model.keys.toSeq).head
          Mutations.updateWhere(spark, table, col("id") === id,
            Map("v" -> (col("v") * 3.0)), "day")
          val (d, v) = model(id); model += id -> ((d, v * 3.0))
        case 4 => // purge vectors: content must not move
          Mutations.purgeVectors(spark, table, "day")
        case 5 => // compact: content must not move (raw read == model
          // only when no vectors are live, so purge first)
          Mutations.purgeVectors(spark, table, "day")
          Snapshots.compact(spark, table, "day")
        case 6 if history.size > 1 => // rollback to a random old version
          val v = rnd.shuffle(history.keys.toSeq).head
          Snapshots.rollback(table, v)
          model = history(v)
        case 7 if model.nonEmpty => // conditional merge: low source values
          // delete, high ones add onto the target, one fresh insert
          val ids = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(2))
          val srcUpd = ids.map { id =>
            val (d, _) = model(id); (id, d, rnd.nextInt(1000).toDouble) }
          val srcIns = freshRows(tag, 1)
          Mutations.mergeIntoClauses(spark, table, df(srcUpd ++ srcIns: _*),
            "id", "day",
            whenMatchedDelete = Some(col("s.v") < 300.0),
            whenMatchedUpdate = Some((lit(true),
              Map("v" -> (col("s.v") + col("t.v"))))),
            whenNotMatchedInsert = Some(lit(true)))
          srcUpd.foreach { case (id, d, sv) =>
            if (sv < 300.0) model -= id
            else { val (_, tv) = model(id); model += id -> ((d, sv + tv)) }
          }
          model ++= srcIns.map(r => r._1 -> ((r._2, r._3)))
        case 8 => // DV maintenance: content must not move
          Mutations.reorgIfNeeded(spark, table, "day", maxDvFraction = 0.2)
        case _ => ()
      }
      snapshot()
      check(step)
    }
    // vacuum must preserve the live state (and only that)
    Snapshots.vacuum(table)
    check(99)
  }

  test("streaming ingest + continuous MV: exactly-once end to end, replay-safe") {
    import org.apache.spark.sql.types._
    val src = tmp("mut-stream-src")
    val table = tmp("mut-stream-table")
    val mv = tmp("mut-stream-mv")
    df((1L, "a", 1.0), (2L, "a", 2.0)).coalesce(1).write.parquet(s"$src/f1")
    df((3L, "b", 30.0)).coalesce(1).write.parquet(s"$src/f2")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("day", StringType), StructField("v", DoubleType)))
    def drain(cp: String): Unit =
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1") // one batch per file
        .parquet(s"$src/*")
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch(Mutations.ingestWithMv(table, mv, "day", "v"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()

    drain(tmp("mut-stream-ckpt"))
    def mvRows() = Snapshots.read(spark, mv)
      .select(col("day"), col("n"), col("sum_v").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(Snapshots.currentVersion(table) == 2)
    assert(Mutations.appliedVersion(mv) == 2L)
    assert(mvRows() == Seq(("a", 2L, 3.0), ("b", 1L, 30.0)))

    // full replay from a FRESH checkpoint (batch ids restart at 0):
    // table commits no-op by version, MV catch-up no-ops by progress
    val mvV = Snapshots.currentVersion(mv)
    drain(tmp("mut-stream-ckpt2"))
    assert(Snapshots.currentVersion(table) == 2 &&
      Snapshots.currentVersion(mv) == mvV)
    assert(mvRows() == Seq(("a", 2L, 3.0), ("b", 1L, 30.0)))

    // crash WINDOW between table commit and MV catch-up: simulate by
    // committing straight to the table; the next catch-up converges
    Snapshots.commit(table, Snapshots.stage(df((4L, "b", 10.0)), table, "day"))
    Mutations.catchUp(spark, mv, table, "day", "v")
    assert(mvRows() == Seq(("a", 2L, 3.0), ("b", 2L, 40.0)))
  }

  test("MERGE on a string key with numeric-looking values: string stats never mis-prune") {
    import spark.implicits._
    // string stats ('100' < '2000' < '999' numerically but NOT
    // lexicographically) — the numeric key-bounds prune must ignore
    // them entirely (they live under smin./smax.), or matched rows
    // would be missed and the MERGE would insert duplicates
    val table = tmp("mut-strkey")
    val base = Seq(("100", "a", 1.0), ("500", "a", 5.0), ("999", "b", 9.0),
      ("2000", "b", 20.0)).toDF("k", "day", "v")
    Snapshots.commitAll(table,
      Snapshots.stageWithStats(base, table, "day", "k", buckets = 4))
    assert(Snapshots.entriesAll(table).forall(e =>
      !e.props.contains("min.k") && e.props.contains("smin.k")),
      "string stats must not land under numeric keys")

    Mutations.mergeInto(spark, table,
      Seq(("2000", "b", 777.0)).toDF("k", "day", "v"), "k", "day")
    val got = Mutations.readMerged(spark, table).collect()
      .map(r => (r.getString(0), r.getDouble(2))).sortBy(_._1).toSeq
    assert(got == Seq(("100", 1.0), ("2000", 777.0), ("500", 5.0), ("999", 9.0)),
      "the matched row must update exactly once — no duplicate insert")
  }

  test("mutations on a column-evolved table preserve evolved columns") {
    import spark.implicits._
    val table = tmp("mut-evokeep")
    Snapshots.commit(table, Snapshots.stage(
      Seq((1L, "a", 1.0), (2L, "a", 2.0)).toDF("id", "day", "v"), table, "day"))
    // era 2 adds w
    Snapshots.commit(table, Snapshots.stage(
      Seq((10L, "b", 10.0, 100L), (11L, "b", 11.0, 110L))
        .toDF("id", "day", "v", "w"), table, "day"))

    // a COW update touching an era-2 file must keep w in the rewrite
    Mutations.updateWhere(spark, table, col("id") === 10,
      Map("v" -> lit(99.0)), "day")
    val after = Snapshots.readMerged(spark, table, mergeSchema = true)
    assert(after.columns.contains("w"), "w must survive the rewrite")
    val r10 = after.filter(col("id") === 10).collect().head
    assert(r10.getDouble(after.columns.indexOf("v")) == 99.0 &&
      r10.getLong(after.columns.indexOf("w")) == 100L,
      "the rewritten row keeps its evolved column value")

    // a BY SOURCE condition on the evolved column resolves (NULL on
    // era-1 rows → clause does not fire there, per SQL)
    Mutations.mergeIntoKeys(spark, table,
      Seq((999L, "c", 0.0, 0L)).toDF("id", "day", "v", "w"), Seq("id"), "day",
      whenNotMatchedBySourceDelete = Some(col("t.w") > lit(105L)))
    val ids = Snapshots.readMerged(spark, table, mergeSchema = true)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 10L), "only the w>105 row deletes; era-1 rows stay")
  }

  test("delete touching 1000+ files: sidecar restriction scales past isin") {
    // 32 tags x 32 buckets = 1024 tiny files — the r9 verdict's
    // wide-delete shape, where an isin of every touched file id builds
    // an O(10^3)-literal expression tree; the broadcast semi-join
    // restriction must stay flat instead
    val table = tmp("mut-wide-1k")
    val rows = (0L until 2048L).map(i => (i, f"d${i % 32}%02d", i.toDouble))
    Snapshots.commitAll(table,
      Snapshots.stageWithStats(df(rows: _*), table, "day", "id", buckets = 1024))
    val files = Snapshots.entries(table).map(_._1).toSet
    assert(files.size >= 1000, s"need 10^3 files, got ${files.size}")

    Mutations.deleteWhere(spark, table, col("id") % 2 === 0)
    assert(Snapshots.entries(table).map(_._1).toSet == files,
      "the vector path must never rewrite data files")
    val got = Mutations.readMerged(spark, table)
      .agg(count("*").as("n"), sum("id").as("s")).collect().head
    assert(got.getLong(0) == 1024L, "exactly the odd ids remain")
    assert(got.getLong(1) == (1L until 2048L by 2).sum)

    // deletes COMPOSE at this width too: a second wide delete folds the
    // prior vectors through the same semi-join restriction
    Mutations.deleteWhere(spark, table, col("id") % 3 === 0)
    assert(Mutations.readMerged(spark, table).count() ==
      (1L until 2048L).count(i => i % 2 != 0 && i % 3 != 0))
  }

  test("STRING-keyed merges prune candidates by smin./smax. stats") {
    import spark.implicits._
    val table = tmp("mut-strkey")
    // two single-day files, string keys clustered per day: day a holds
    // doc-a*, day m holds doc-m* — per-file string stats are disjoint
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      Seq(("doc-a1", "a", 1.0), ("doc-a2", "a", 2.0),
          ("doc-m1", "m", 10.0), ("doc-m2", "m", 11.0))
        .toDF("k", "day", "v"),
      table, "day", "k", buckets = 2))
    val src = Seq(("doc-a1", "a", 100.0)).toDF("k", "day", "v")
    // unit pin on the filter itself: a string key must PRUNE the
    // non-overlapping file (previously string keys forfeited the prune
    // — a full footer-candidate scan per catch-up on doc_id corpora)
    val f = Mutations.keyBoundsCandidates(src, table, "k")
    val es = Snapshots.entriesAll(table)
    val aFile = es.find(_.tag == "a").get
    val mFile = es.find(_.tag == "m").get
    assert(aFile.props.contains("smin.k"), "string stats must be recorded")
    assert(f(aFile), "the key-bearing file must stay a candidate")
    assert(!f(mFile), "the disjoint-range file must be pruned")
    // end to end: the merge is correct AND the pruned file carries by name
    val before = Snapshots.entries(table).map(_._1).toSet
    Mutations.mergeInto(spark, table, src, "k", "day")
    val after = Snapshots.entries(table).map(_._1).toSet
    assert(before.intersect(after).contains(mFile.rel),
      "the pruned file must be carried by name, not rewritten")
    assert(Mutations.readMerged(spark, table).select("k", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toSeq ==
      Seq(("doc-a1", 100.0), ("doc-a2", 2.0), ("doc-m1", 10.0), ("doc-m2", 11.0)))
  }

  test("TIMESTAMP- and DATE-keyed merges compare bounds in the stats' space") {
    import spark.implicits._
    // timestamp stats are epoch MICROS; a seconds-valued bound would
    // prune files that CONTAIN matching keys (silent row loss) — the
    // typed dispatch must keep the key-bearing file a candidate and the
    // merge must land
    val table = tmp("mut-tskey")
    val ts = (h: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      Seq((ts(1), "a", 1.0), (ts(2), "a", 2.0), (ts(11), "m", 11.0))
        .toDF("ts", "day", "v"),
      table, "day", "ts", buckets = 2))
    val es = Snapshots.entriesAll(table)
    assert(es.exists(_.props.contains("min.ts")),
      "MICROS timestamp stats must be recorded")
    val src = Seq((ts(2), "a", 200.0)).toDF("ts", "day", "v")
    val f = Mutations.keyBoundsCandidates(src, table, "ts")
    assert(es.filter(_.tag == "a").forall(f),
      "the file containing the matched timestamp must stay a candidate")
    assert(es.filter(_.tag == "m").forall(e => !f(e)),
      "micros-space bounds must still prune the disjoint file")
    Mutations.mergeInto(spark, table, src, "ts", "day")
    assert(Mutations.readMerged(spark, table)
      .filter(col("ts") === ts(2)).select("v").head().getDouble(0) == 200.0,
      "the matched row must be updated, not duplicated or lost")
    assert(Mutations.readMerged(spark, table).count() == 3L)

    // DATE keys: bounds in epoch DAYS (the internal value the stats record)
    val table2 = tmp("mut-datekey")
    val d = (s: String) => java.sql.Date.valueOf(s)
    Snapshots.commitAll(table2, Snapshots.stageWithStats(
      Seq((d("2024-01-01"), "a", 1.0), (d("2024-06-01"), "m", 6.0))
        .toDF("dt", "day", "v"),
      table2, "day", "dt", buckets = 2))
    val src2 = Seq((d("2024-01-01"), "a", 10.0)).toDF("dt", "day", "v")
    val f2 = Mutations.keyBoundsCandidates(src2, table2, "dt")
    val es2 = Snapshots.entriesAll(table2)
    assert(es2.filter(_.tag == "a").forall(f2))
    assert(es2.filter(_.tag == "m").forall(e => !f2(e)))
    Mutations.mergeInto(spark, table2, src2, "dt", "day")
    assert(Mutations.readMerged(spark, table2).count() == 2L)
    assert(Mutations.readMerged(spark, table2)
      .filter(col("dt") === d("2024-01-01")).select("v").head().getDouble(0) == 10.0)
  }
}
