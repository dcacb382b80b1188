package graft

import graft.ops.lake.{ChangeApply, Mutations, Snapshots}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CDC APPLY contracts: the SCD1 mirror converges to the source's live
  * rows through every write shape (append, COW update, DV delete, keyed
  * merge) with exactly-once bookkeeping riding the apply commit; the
  * SCD2 mirror accumulates true history segments; and carry-over
  * delete+insert pairs from copy-on-write file rewrites never fabricate
  * changes in either flavor. */
class ChangeApplySpec extends AnyFunSuite with SparkFixture {

  private def df(rows: (Long, String, Double)*) = {
    import spark.implicits._
    rows.toDF("id", "day", "v")
  }

  private def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, String, Double)] =
    d.select("id", "day", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  private def mirrorOnce(tgt: String, src: String): Long =
    ChangeApply.mirror(spark, tgt, src, Seq("id"), "day")

  test("SCD1 mirror converges through append, COW update, DV delete, merge") {
    val src = tmp("ca-src")
    val tgt = tmp("ca-tgt")
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0), (11L, "b", 11.0)),
      src, "day", "id", buckets = 2))                                  // v1
    mirrorOnce(tgt, src)                                               // bootstrap
    assert(rows(Snapshots.read(spark, tgt)) == rows(Mutations.readMerged(spark, src)))
    assert(ChangeApply.appliedVersion(tgt) == 1L)

    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((20L, "c", 20.0)), src, "day", "id"))                         // v2 append
    Mutations.updateWhere(spark, src, col("id") === 1L,
      Map("v" -> lit(100.0)), "day")                                   // v3 COW
    Mutations.deleteWhere(spark, src, col("id") === 10L)               // v4 DV
    Mutations.mergeInto(spark, src, df((11L, "b", 111.0), (30L, "d", 30.0)),
      "id", "day")                                                     // v5 merge
    mirrorOnce(tgt, src)                                               // one batch, v2..v5
    assert(rows(Snapshots.read(spark, tgt)) ==
      Set((1L, "a", 100.0), (2L, "a", 2.0), (11L, "b", 111.0),
        (20L, "c", 20.0), (30L, "d", 30.0)))
    assert(ChangeApply.appliedVersion(tgt) == 5L)

    // caught up: another poll is a pure no-op (no empty commit churn)
    val tv = Snapshots.currentVersion(tgt)
    assert(mirrorOnce(tgt, src) == tv)
    assert(Snapshots.currentVersion(tgt) == tv)
  }

  test("SCD1 net collapse: insert→delete never lands; delete→reinsert lands once") {
    val src = tmp("ca-net-src")
    val tgt = tmp("ca-net-tgt")
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (2L, "a", 2.0)), src, "day", "id"))           // v1
    mirrorOnce(tgt, src)
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((3L, "a", 3.0)), src, "day", "id"))                           // v2: insert 3
    Mutations.deleteWhere(spark, src, col("id") === 3L)                // v3: delete 3
    Mutations.deleteWhere(spark, src, col("id") === 1L)                // v4: delete 1
    Mutations.mergeInto(spark, src, df((1L, "a", 11.0)), "id", "day")  // v5: reinsert 1
    Mutations.updateWhere(spark, src, col("id") === 2L,
      Map("v" -> lit(2.5)), "day")                                     // v6
    Mutations.updateWhere(spark, src, col("id") === 2L,
      Map("v" -> lit(2.75)), "day")                                    // v7: latest wins
    mirrorOnce(tgt, src)
    assert(rows(Snapshots.read(spark, tgt)) ==
      Set((1L, "a", 11.0), (2L, "a", 2.75)))
  }

  test("carry-over suppression: untouched-key target files carry by name") {
    val src = tmp("ca-carry-src")
    val tgt = tmp("ca-carry-tgt")
    // two single-day source files; the mirror lands one file per day
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0), (11L, "b", 11.0)),
      src, "day", "id", buckets = 2))
    mirrorOnce(tgt, src)
    val before = Snapshots.entriesAll(tgt).map(_.rel).toSet
    // COW-update day a's key 1 upstream: the rewrite re-states key 2's
    // row as a delete+insert pair the suppression must cancel — day b
    // of the MIRROR must carry by name (an unsuppressed apply would
    // also "update" key 2, but never day b; the sharper check is that
    // ONLY day a's mirror file rewrites)
    Mutations.updateWhere(spark, src, col("id") === 1L,
      Map("v" -> lit(9.0)), "day")
    mirrorOnce(tgt, src)
    val after = Snapshots.entriesAll(tgt)
    val carried = before.intersect(after.map(_.rel).toSet)
    val carriedTags = after.filter(e => carried(e.rel)).map(_.tag).toSet
    assert(carriedTags.contains("b"), s"day b must carry by name; carried=$carriedTags")
    assert(rows(Snapshots.read(spark, tgt)) ==
      Set((1L, "a", 9.0), (2L, "a", 2.0), (10L, "b", 10.0), (11L, "b", 11.0)))
  }

  test("exactly-once guards: gap, wrong source, broken bookkeeping, recreated source") {
    val src = tmp("ca-g-src")
    val src2 = tmp("ca-g-src2")
    val tgt = tmp("ca-g-tgt")
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((1L, "a", 1.0)), src, "day", "id"))
    Snapshots.commitAll(src2, Snapshots.stageWithStats(
      df((2L, "a", 2.0)), src2, "day", "id"))
    Snapshots.commitAll(src2, Snapshots.stageWithStats(
      df((3L, "a", 3.0)), src2, "day", "id")) // src2 at v2 ≠ tgt's applied v1
    mirrorOnce(tgt, src)
    // explicit range that skips ahead or replays must be refused
    Mutations.updateWhere(spark, src, col("id") === 1L,
      Map("v" -> lit(2.0)), "day")                                     // v2
    Mutations.updateWhere(spark, src, col("id") === 1L,
      Map("v" -> lit(3.0)), "day")                                     // v3
    intercept[IllegalArgumentException] {
      ChangeApply.applyOnce(spark, tgt, src, Seq("id"), "day", 2L, 3L) // gap
    }
    intercept[IllegalArgumentException] {
      ChangeApply.applyOnce(spark, tgt, src, Seq("id"), "day", 0L, 3L) // replay
    }
    // a different source table cannot interleave
    intercept[IllegalArgumentException] { mirrorOnce(tgt, src2) }
    mirrorOnce(tgt, src) // legitimate catch-up still fine after the rejects
    assert(rows(Snapshots.read(spark, tgt)) == Set((1L, "a", 3.0)))
    // a props-dropping commit breaks the chain loudly, not silently
    Snapshots.commitAll(tgt, Seq.empty) // drops cdc.* (non-inherited)
    Mutations.updateWhere(spark, src, col("id") === 1L,
      Map("v" -> lit(4.0)), "day")
    intercept[IllegalArgumentException] { mirrorOnce(tgt, src) }
    // cursor ahead of a recreated source fails loudly
    val tgt2 = tmp("ca-g-tgt2")
    intercept[IllegalArgumentException] {
      ChangeApply.applyOnce(spark, tgt2, src2, Seq("id"), "day", 5L, 1L)
    }
  }

  test("ambiguous same-commit differing rows for one key fail loudly") {
    val src = tmp("ca-amb-src")
    val tgt = tmp("ca-amb-tgt")
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (1L, "a", 2.0)), src, "day", "id"))
    intercept[IllegalArgumentException] { mirrorOnce(tgt, src) }
    // identical full-row duplicates collapse silently (keyed contract)
    val src2 = tmp("ca-amb-src2")
    val tgt2 = tmp("ca-amb-tgt2")
    Snapshots.commitAll(src2, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (1L, "a", 1.0)), src2, "day", "id"))
    mirrorOnce(tgt2, src2)
    assert(rows(Snapshots.read(spark, tgt2)) == Set((1L, "a", 1.0)))
  }

  test("props-only source commits advance the bookkeeping; compact keeps it") {
    val src = tmp("ca-props-src")
    val tgt = tmp("ca-props-tgt")
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (2L, "b", 2.0)), src, "day", "id"))
    mirrorOnce(tgt, src)
    Snapshots.commitProps(src, Map("tbl.note" -> "x"))                 // v2: no rows
    mirrorOnce(tgt, src)
    assert(ChangeApply.appliedVersion(tgt) == 2L,
      "a net-empty range must still advance the applied version")
    assert(rows(Snapshots.read(spark, tgt)) == rows(Mutations.readMerged(spark, src)))
    // layout maintenance must not reset the exactly-once chain
    Snapshots.commitAll(tgt, Snapshots.stageWithStats(
      df((9L, "a", 9.0)), tgt, "day", "id"),
      props = Map(ChangeApply.AppliedProp -> "2",
        ChangeApply.SourceProp -> src)) // fragment day a (keeps bookkeeping)
    Snapshots.compact(spark, tgt, "day")
    assert(ChangeApply.appliedVersion(tgt) == 2L,
      "compact must carry cdc.* forward")
    Snapshots.compactManifests(tgt, maxManifests = 1)
    assert(ChangeApply.appliedVersion(tgt) == 2L,
      "manifest compaction must carry cdc.* forward")
  }

  test("SCD2 history: segments, deletes, reinserts, suppression, incremental ≡ one-shot") {
    val src = tmp("ca2-src")
    val one = tmp("ca2-one")
    val inc = tmp("ca2-inc")
    def m2(t: String): Long = ChangeApply.mirrorScd2(spark, t, src, Seq("id"), "day")
    // k1,k3 share day a (one file) so v2's COW rewrite of k1 re-states
    // k3 — suppression must keep k3 a single open segment
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (3L, "a", 3.0), (2L, "b", 2.0)),
      src, "day", "id"))                                               // v1
    m2(inc)
    Mutations.updateWhere(spark, src, col("id") === 1L,
      Map("v" -> lit(10.0)), "day")                                    // v2 COW
    m2(inc)
    Mutations.deleteWhere(spark, src, col("id") === 2L)                // v3 DV
    m2(inc)
    Mutations.mergeInto(spark, src, df((2L, "b", 22.0)), "id", "day")  // v4 reinsert
    m2(inc)
    m2(one) // one-shot bootstrap folds v1..v4 in a single batch
    def hist(t: String): Set[(Long, String, Double, Long, Option[Long], Boolean)] =
      Snapshots.read(spark, t)
        .select(col("id"), col("day"), col("v"),
          col(ChangeApply.StartCol), col(ChangeApply.EndCol),
          col(ChangeApply.CurrentCol))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
          r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.getBoolean(5))).toSet
    val expected = Set(
      (1L, "a", 1.0, 1L, Some(2L), false),
      (1L, "a", 10.0, 2L, None, true),
      (3L, "a", 3.0, 1L, None, true),
      (2L, "b", 2.0, 1L, Some(3L), false),
      (2L, "b", 22.0, 4L, None, true))
    assert(hist(inc) == expected, "incremental history")
    assert(hist(one) == expected, "one-shot history must equal incremental")
    // current rows mirror the live source
    assert(rows(Snapshots.read(spark, inc).filter(col(ChangeApply.CurrentCol))) ==
      rows(Mutations.readMerged(spark, src)))
    // caught up: no-op
    val tv = Snapshots.currentVersion(inc)
    assert(m2(inc) == tv && Snapshots.currentVersion(inc) == tv)
    assert(ChangeApply.appliedVersion(inc) == 4L)
  }

  test("bootstrap records key stats; net-empty bootstrap stays at version 0") {
    val src = tmp("ca-bs-src")
    val t1 = tmp("ca-bs-t1")
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (2L, "b", 2.0)), src, "day", "id"))
    mirrorOnce(t1, src)
    val keys = Snapshots.entriesAll(t1).flatMap(_.props.keys).toSet
    assert(keys.exists(k => k == "min.id" || k == "nulls.id"),
      s"bootstrap must record key stats for later candidate pruning, " +
        s"props=$keys")
    // a source wiped empty before the first catch-up: BOTH flavors must
    // stay at version 0 (a zero-file snapshot would brick the target),
    // then converge once rows exist again
    val src2 = tmp("ca-bs-src2")
    val m1 = tmp("ca-bs-m1")
    val m2 = tmp("ca-bs-m2")
    Snapshots.commitAll(src2, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (2L, "a", 2.0)), src2, "day", "id"))          // v1
    Mutations.deleteWhere(spark, src2, lit(true))                      // v2 wipe
    // SCD1: the live mirror of an empty table is empty — stays at 0
    // (a zero-file snapshot would brick it; the range re-folds later)
    assert(mirrorOnce(m1, src2) == 0L)
    assert(Snapshots.currentVersion(m1) == 0L)
    // SCD2: history is the point — the pre-wipe rows commit as CLOSED
    // segments even though the live set is empty
    assert(ChangeApply.mirrorScd2(spark, m2, src2, Seq("id"), "day") == 1L)
    assert(rows(Snapshots.read(spark, m2).filter(col(ChangeApply.CurrentCol)))
      == Set.empty[(Long, String, Double)])
    Snapshots.commitAll(src2, Snapshots.stageWithStats(
      df((1L, "a", 10.0)), src2, "day", "id"))                         // v3
    mirrorOnce(m1, src2)
    ChangeApply.mirrorScd2(spark, m2, src2, Seq("id"), "day")
    assert(rows(Snapshots.read(spark, m1)) == Set((1L, "a", 10.0)))
    // SCD2 bootstrapped late still captures the pre-bootstrap churn:
    // [1,2) closed by the wipe, [3,∞) current
    val segs = Snapshots.read(spark, m2)
      .select(col("id"), col(ChangeApply.StartCol), col(ChangeApply.EndCol))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(segs == Set((1L, 1L, 2L), (2L, 1L, 2L), (1L, 3L, -1L)), s"segs=$segs")
  }

  test("SCD2: untouched-key target files carry by name") {
    val src = tmp("ca2-carry-src")
    val tgt = tmp("ca2-carry-tgt")
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0), (11L, "b", 11.0)),
      src, "day", "id", buckets = 2))
    ChangeApply.mirrorScd2(spark, tgt, src, Seq("id"), "day")
    val before = Snapshots.entriesAll(tgt).map(_.rel).toSet
    Mutations.updateWhere(spark, src, col("id") === 1L,
      Map("v" -> lit(9.0)), "day")
    ChangeApply.mirrorScd2(spark, tgt, src, Seq("id"), "day")
    val after = Snapshots.entriesAll(tgt)
    val carriedTags = after.filter(e => before(e.rel)).map(_.tag).toSet
    assert(carriedTags.contains("b"),
      s"day b's segment file must carry by name; carried=$carriedTags")
  }

  test("mirrors follow source schema evolution") {
    import spark.implicits._
    val src = tmp("ca-ev-src")
    val t1 = tmp("ca-ev-t1")
    val t2 = tmp("ca-ev-t2")
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (2L, "b", 2.0)), src, "day", "id"))            // v1
    mirrorOnce(t1, src)
    ChangeApply.mirrorScd2(spark, t2, src, Seq("id"), "day")
    // the source EVOLVES: a widening append lands an extra column, and
    // a later update touches a pre-evolution key
    Snapshots.commit(src, Snapshots.stage(
      Seq((9L, "a", 9.0, 42L)).toDF("id", "day", "v", "extra"),
      src, "day"))                                                      // v2
    Mutations.updateWhere(spark, src, col("id") === 1L,
      Map("v" -> lit(10.0)), "day")                                     // v3
    mirrorOnce(t1, src)
    ChangeApply.mirrorScd2(spark, t2, src, Seq("id"), "day")
    def full(t: String) = Mutations.readMerged(spark, t, mergeSchema = true)
      .select("id", "day", "v", "extra").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(full(t1) == full(src), "SCD1 mirror must evolve with the source")
    assert(full(t1) == Set((1L, "a", 10.0, -1L), (2L, "b", 2.0, -1L),
      (9L, "a", 9.0, 42L)))
    val cur2 = Mutations.readMerged(spark, t2, mergeSchema = true)
      .filter(col(ChangeApply.CurrentCol))
      .select("id", "day", "v", "extra").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(cur2 == full(src), "SCD2 current rows must evolve with the source")
  }

  test("target rollback restores rows AND bookkeeping together; catch-up re-folds") {
    val src = tmp("ca-rb-src")
    val tgt = tmp("ca-rb-tgt")
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (2L, "a", 2.0)), src, "day", "id"))            // v1
    mirrorOnce(tgt, src)                                                // tgt v1
    Mutations.updateWhere(spark, src, col("id") === 1L,
      Map("v" -> lit(10.0)), "day")                                     // v2
    mirrorOnce(tgt, src)                                                // tgt v2
    assert(ChangeApply.appliedVersion(tgt) == 2L)
    // roll the TARGET back: rollback restores the old snapshot's props
    // with its rows (inherit = false), so cdc.applied rewinds in the
    // same commit — the exactly-once chain cannot drift
    Snapshots.rollback(tgt, 1L)
    assert(ChangeApply.appliedVersion(tgt) == 1L,
      "bookkeeping must rewind WITH the rows")
    assert(rows(Snapshots.read(spark, tgt)) == Set((1L, "a", 1.0), (2L, "a", 2.0)))
    // the catch-up re-folds exactly the undone range and converges
    mirrorOnce(tgt, src)
    assert(rows(Snapshots.read(spark, tgt)) == rows(Mutations.readMerged(spark, src)))
    assert(ChangeApply.appliedVersion(tgt) == 2L)
  }

  test("mirror survives a full source wipe and recovers on reinsert") {
    val src = tmp("ca-wipe-src")
    val tgt = tmp("ca-wipe-tgt")
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (2L, "b", 2.0)), src, "day", "id"))            // v1
    mirrorOnce(tgt, src)
    Mutations.deleteWhere(spark, src, lit(true))                        // v2 wipe
    mirrorOnce(tgt, src)
    // the mirror represents the wipe as a remove-everything commit —
    // readable as empty on the recorded schema, bookkeeping advanced
    assert(rows(Mutations.readMerged(spark, tgt)).isEmpty)
    assert(ChangeApply.appliedVersion(tgt) == 2L)
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((3L, "a", 3.0)), src, "day", "id"))                            // v3
    mirrorOnce(tgt, src)
    assert(rows(Mutations.readMerged(spark, tgt)) == Set((3L, "a", 3.0)))
    assert(ChangeApply.appliedVersion(tgt) == 3L)
  }

  test("chunked catch-up (maxVersionsPerBatch = 1) equals one-shot") {
    val src = tmp("ca-ch-src")
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0)), src, "day", "id")) // v1
    Mutations.updateWhere(spark, src, col("id") === 1L,
      Map("v" -> lit(10.0)), "day")                                          // v2
    Mutations.deleteWhere(spark, src, col("id") === 2L)                      // v3
    Mutations.mergeInto(spark, src, df((4L, "b", 4.0)), "id", "day")         // v4
    val one = tmp("ca-ch-one"); val chn = tmp("ca-ch-chn")
    ChangeApply.mirror(spark, one, src, Seq("id"), "day")
    ChangeApply.mirror(spark, chn, src, Seq("id"), "day",
      maxVersionsPerBatch = 1)
    assert(rows(Snapshots.read(spark, chn)) == rows(Snapshots.read(spark, one)))
    assert(ChangeApply.appliedVersion(chn) == 4L)
    assert(Snapshots.currentVersion(chn) >= 4L,
      "cap 1 applies as separate per-version commits")
    val one2 = tmp("ca-ch-one2"); val chn2 = tmp("ca-ch-chn2")
    ChangeApply.mirrorScd2(spark, one2, src, Seq("id"), "day")
    ChangeApply.mirrorScd2(spark, chn2, src, Seq("id"), "day",
      maxVersionsPerBatch = 1)
    def hist2(t: String) = Snapshots.read(spark, t)
      .select(col("id"), col("v"), col(ChangeApply.StartCol),
        col(ChangeApply.EndCol), col(ChangeApply.CurrentCol))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
    assert(hist2(chn2) == hist2(one2), "chunked SCD2 history must equal one-shot")
  }

  test("mirror handles MapType columns (canonicalized for cancellation)") {
    import spark.implicits._
    val src = tmp("ca-map-src")
    val tgt = tmp("ca-map-tgt")
    val d1 = Seq(
      (1L, "a", Map("k1" -> "v1", "k2" -> "v2")),
      (2L, "a", Map("x" -> "y")))
      .toDF("id", "day", "props")
    Snapshots.commitAll(src, Snapshots.stageWithStats(d1, src, "day", "id"))
    ChangeApply.mirror(spark, tgt, src, Seq("id"), "day")
    // the COW update of id 1 re-states id 2's map row as a carry-over
    // pair — the cancellation groupBy must handle the map column (maps
    // are not valid grouping keys; they canonicalize to sorted entries)
    Mutations.updateWhere(spark, src, col("id") === 1L,
      Map("props" -> map(lit("k"), lit("v"))), "day")
    ChangeApply.mirror(spark, tgt, src, Seq("id"), "day")
    val got = Snapshots.read(spark, tgt).select("id", "props").collect()
      .map(r => r.getLong(0) -> r.getMap[String, String](1).toMap).toMap
    assert(got == Map(1L -> Map("k" -> "v"), 2L -> Map("x" -> "y")))

    // maps NESTED in structs cannot be canonicalized — entry order is
    // not comparable there, so the fingerprint cancellation refuses
    // LOUDLY (silently failing to cancel would fabricate history)
    val src2 = tmp("ca-map-nested-src")
    val nested = Seq((1L, "a", Map("k" -> "v")))
      .toDF("id", "day", "m")
      .withColumn("wrap", struct(col("m")))
      .drop("m")
    Snapshots.commitAll(src2, Snapshots.stageWithStats(nested, src2, "day", "id"))
    val e = intercept[IllegalArgumentException] {
      ChangeApply.mirror(spark, tmp("ca-map-nested-tgt"), src2, Seq("id"), "day")
    }
    assert(e.getMessage.contains("nested"), e.getMessage)

    // a map DIRECTLY inside the top-level map (map<k, map<…>>) hits the
    // same guard — the pre-r13 recursion skipped it, so the user got an
    // un-actionable Catalyst "not orderable" analysis error from
    // array_sort instead of this message (r12 verdict find)
    val src3 = tmp("ca-map-of-map-src")
    val mm = Seq((1L, "a", Map("k" -> Map("x" -> 1))))
      .toDF("id", "day", "m")
    Snapshots.commitAll(src3, Snapshots.stageWithStats(mm, src3, "day", "id"))
    val e2 = intercept[IllegalArgumentException] {
      ChangeApply.mirror(spark, tmp("ca-map-of-map-tgt"), src3, Seq("id"), "day")
    }
    assert(e2.getMessage.contains("restructure the column"), e2.getMessage)
  }

  test("mirror polling races a live writer: every poll applies a consistent prefix") {
    val src = tmp("ca-race-src")
    val tgt = tmp("ca-race-tgt")
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((1L, "a", 1.0)), src, "day", "id"))
    // writer thread: 12 sequential commits (appends + updates) while
    // the main thread polls the mirror — each poll pins its own
    // (applied, current] range over the immutable log, so a mid-commit
    // poll sees a consistent prefix, never a torn batch
    val writer = new Thread(() => {
      for (i <- 2 to 13) {
        if (i % 3 == 0)
          Mutations.updateWhere(spark, src, col("id") === 1L,
            Map("v" -> lit(i.toDouble)), "day")
        else
          Snapshots.commitAll(src, Snapshots.stageWithStats(
            df((i.toLong, "a", i.toDouble)), src, "day", "id"))
        Thread.sleep(15)
      }
    })
    writer.start()
    try {
      while (writer.isAlive) {
        mirrorOnce(tgt, src)
        // invariant at EVERY poll: the mirror equals the snapshot it
        // claims to have applied (not necessarily the live one)
        val applied = ChangeApply.appliedVersion(tgt)
        if (applied >= 1) {
          val want = rows(Mutations.readMerged(spark, src, version = applied))
          assert(rows(Snapshots.read(spark, tgt)) == want,
            s"mirror at applied=$applied diverged from that snapshot")
        }
      }
    } finally writer.join()
    mirrorOnce(tgt, src)
    assert(rows(Snapshots.read(spark, tgt)) == rows(Mutations.readMerged(spark, src)))
    assert(ChangeApply.appliedVersion(tgt) == Snapshots.currentVersion(src))
  }

  test("randomized model: mirror + SCD2 current rows track the source") {
    val rnd = new scala.util.Random(411)
    val src = tmp("ca-rnd-src")
    val t1 = tmp("ca-rnd-t1")
    val t2 = tmp("ca-rnd-t2")
    var nextId = 100L
    def someIds(): Seq[Long] = {
      val live = Mutations.readMerged(spark, src).select("id")
        .collect().map(_.getLong(0)).toSeq
      if (live.isEmpty) Seq.empty else rnd.shuffle(live).take(1 + rnd.nextInt(3))
    }
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)), src, "day", "id"))
    for (round <- 1 to 8) {
      rnd.nextInt(3) match {
        case 0 => // append fresh keys
          val d = Seq("a", "b", "c")(rnd.nextInt(3))
          val fresh = (0 to rnd.nextInt(2)).map { _ =>
            nextId += 1; (nextId, d, nextId.toDouble) }
          info(s"round $round: append $fresh")
          Snapshots.commitAll(src, Snapshots.stageWithStats(
            df(fresh: _*), src, "day", "id"))
        case 1 => // update some live keys
          val ids = someIds()
          info(s"round $round: update $ids")
          if (ids.nonEmpty)
            Mutations.updateWhere(spark, src, col("id").isin(ids: _*),
              Map("v" -> (col("v") + 0.5)), "day")
        case 2 => // delete some live keys — occasionally ALL of them
          // (the mirror represents a full wipe as a remove-everything
          // commit and recovers on reinsert)
          val live = Mutations.readMerged(spark, src).select("id")
            .collect().map(_.getLong(0)).toSeq
          val ids =
            if (live.nonEmpty && rnd.nextInt(8) == 0) live
            else rnd.shuffle(live).take(math.min(2, live.size - 2))
          info(s"round $round: delete $ids")
          if (ids.nonEmpty)
            Mutations.deleteWhere(spark, src, col("id").isin(ids: _*))
      }
      if (rnd.nextBoolean()) { // catch up at random points, not every step
        info(s"round $round: catch up at src v${Snapshots.currentVersion(src)}")
        mirrorOnce(t1, src)
        ChangeApply.mirrorScd2(spark, t2, src, Seq("id"), "day")
      }
    }
    mirrorOnce(t1, src)
    ChangeApply.mirrorScd2(spark, t2, src, Seq("id"), "day")
    val live = rows(Mutations.readMerged(spark, src))
    assert(rows(Snapshots.read(spark, t1)) == live, "SCD1 mirror diverged")
    assert(rows(Snapshots.read(spark, t2).filter(col(ChangeApply.CurrentCol))) == live,
      "SCD2 current rows diverged")
    // segment sanity: per key, at most one current row and no overlap gaps
    val segs = Snapshots.read(spark, t2)
      .select(col("id"), col(ChangeApply.StartCol), col(ChangeApply.EndCol))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) Long.MaxValue else r.getLong(2)))
      .groupBy(_._1).values
    segs.foreach { ss =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) =>
          assert(e1 <= s2, s"overlapping segments: $sorted")
        case _ =>
      }
      assert(sorted.count(_._3 == Long.MaxValue) <= 1, s"two open segments: $sorted")
    }
  }

  test("STRING-keyed catch-up opens only key-bearing target files") {
    import spark.implicits._
    val src = tmp("ca-str-src")
    val tgt = tmp("ca-str-tgt")
    def sdf(rows: (String, String, Double)*) = rows.toDF("doc_id", "day", "v")
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      sdf(("doc-a1", "a", 1.0), ("doc-a2", "a", 2.0),
          ("doc-m1", "m", 10.0), ("doc-m2", "m", 11.0)),
      src, "day", "doc_id", buckets = 2))                              // v1
    ChangeApply.mirrorScd2(spark, tgt, src, Seq("doc_id"), "day")
    // hard pin on the scan set: DELETE the disjoint-range target file
    // from disk — if the string-key candidate prune regressed to
    // keep-all (the r11 numeric-only try_cast shape), the catch-up's
    // discovery scan would open it and CRASH; with smin./smax. pruning
    // the file is never opened and carries by manifest name
    val mEntry = Snapshots.entriesAll(tgt).find(_.tag == "m").get
    assert(mEntry.props.contains("smin.doc_id"),
      "SCD2 bootstrap must record string key stats")
    val mPath = new java.io.File(tgt, mEntry.rel)
    assert(mPath.delete(), s"fixture: could not remove $mPath")
    Mutations.updateWhere(spark, src, col("doc_id") === "doc-a1",
      Map("v" -> lit(100.0)), "day")                                   // v2
    ChangeApply.mirrorScd2(spark, tgt, src, Seq("doc_id"), "day")
    assert(ChangeApply.appliedVersion(tgt) == 2L)
    val aRows = Snapshots.read(spark, tgt, fileFilter = _.tag == "a")
      .select("doc_id", ChangeApply.StartCol, ChangeApply.CurrentCol).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(aRows == Set(("doc-a1", 1L, false), ("doc-a1", 2L, true),
      ("doc-a2", 1L, true)),
      s"string-keyed SCD2 history diverged: $aRows")
    // the m-file entry is still referenced by name in the new version
    assert(Snapshots.entriesAll(tgt).exists(_.rel == mEntry.rel),
      "the pruned file must carry by manifest name")
  }

  test("cancellation fingerprints distinguish null-position variants") {
    import spark.implicits._
    // (k, a='x', b=NULL) -> (k, a=NULL, b='x'): a column-wise hash
    // SKIPS nulls (Spark hash expressions leave the seed untouched),
    // so both sides fingerprint identically and the real update
    // silently cancels (r12 review find); the canonical-JSON encoding
    // serializes nulls positionally and must keep both sides
    val src = tmp("ca-null-src")
    val tgt = tmp("ca-null-tgt")
    val base = Seq((1L, "d", Some("x"), None: Option[String]),
                   (2L, "d", Some("p"), Some("q")))
      .toDF("id", "day", "a", "b")
    Snapshots.commitAll(src, Snapshots.stageWithStats(base, src, "day", "id")) // v1
    ChangeApply.mirror(spark, tgt, src, Seq("id"), "day")
    Mutations.updateWhere(spark, src, col("id") === 1L,
      Map("a" -> lit(null).cast("string"), "b" -> lit("x")), "day")            // v2
    val rc = ChangeApply.realChanges(spark, src, 1, 2, Seq("id"))
      .select("id", "_change_type", "a", "b").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(rc == Set(
      (1L, "delete", Some("x"), None),
      (1L, "insert", None, Some("x"))),
      s"null-position update must survive cancellation: $rc")
    ChangeApply.mirror(spark, tgt, src, Seq("id"), "day")
    val got = Snapshots.read(spark, tgt).select("id", "a", "b").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2)))).toSet
    assert(got == Set((1L, None, Some("x")), (2L, Some("p"), Some("q"))))
  }

  test("chunked catch-up widens over a net-empty prefix instead of wedging") {
    val src = tmp("ca-wedge-src")
    val tgt = tmp("ca-wedge-tgt")
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (2L, "a", 2.0)), src, "day", "id"))           // v1
    Mutations.deleteWhere(spark, src, col("id").isNotNull)             // v2: wipe
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((3L, "b", 3.0)), src, "day", "id"))                           // v3
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((4L, "b", 4.0)), src, "day", "id"))                           // v4
    // cap=2: chunk (0,2] nets to NOTHING on the version-0 target —
    // applyOnce records no bookkeeping, so the cursor must hold and the
    // next chunk widen over the same start (advancing it wedged the
    // gap-free guard permanently, r11 advisor find)
    ChangeApply.mirror(spark, tgt, src, Seq("id"), "day",
      maxVersionsPerBatch = 2)
    assert(rows(Snapshots.read(spark, tgt)) ==
      Set((3L, "b", 3.0), (4L, "b", 4.0)))
    assert(ChangeApply.appliedVersion(tgt) == 4L)
  }

  test("a catch-up whose whole range nets to nothing terminates at v0, then recovers") {
    val src = tmp("ca-empty-src")
    val tgt = tmp("ca-empty-tgt")
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((1L, "a", 1.0)), src, "day", "id"))                           // v1
    Mutations.deleteWhere(spark, src, col("id").isNotNull)             // v2: wipe
    // the widened chunk reaches the range end and still nets empty:
    // the loop must STOP (target legitimately stays un-bootstrapped),
    // not spin widening forever
    ChangeApply.mirror(spark, tgt, src, Seq("id"), "day",
      maxVersionsPerBatch = 1)
    // cap=1's first chunk (0,1] bootstraps then (1,2] wipes to a
    // zero-file snapshot — both live-sets are empty either way
    assert(Snapshots.read(spark, tgt).count() == 0L)
    // SCD1 whole-range net-empty: a fresh mirror over (0,2] folds the
    // insert-then-wipe to nothing, must STOP at version 0 (not spin
    // widening forever) and recover when real data lands
    val tgt1b = tmp("ca-empty-tgt1b")
    ChangeApply.mirror(spark, tgt1b, src, Seq("id"), "day",
      maxVersionsPerBatch = 2)
    assert(Snapshots.currentVersion(tgt1b) == 0L,
      "a fully-cancelled SCD1 range leaves the target at version 0")
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((9L, "c", 9.0)), src, "day", "id"))                           // v3
    ChangeApply.mirror(spark, tgt1b, src, Seq("id"), "day",
      maxVersionsPerBatch = 2)
    assert(rows(Snapshots.read(spark, tgt1b)) == Set((9L, "c", 9.0)))
    assert(ChangeApply.appliedVersion(tgt1b) == 3L)
    // the SCD2 mirror, by contrast, RECORDS the wiped row as a closed
    // history segment even at bootstrap — insert-then-wipe is history,
    // not nothing (so the SCD2 un-advanced branch is only reachable
    // through changeless prefixes; the widening there is defensive
    // parity with SCD1)
    val tgt2 = tmp("ca-empty-tgt2")
    ChangeApply.mirrorScd2(spark, tgt2, src, Seq("id"), "day",
      maxVersionsPerBatch = 2)
    assert(rows(Snapshots.read(spark, tgt2)
      .filter(col(ChangeApply.CurrentCol))) == Set((9L, "c", 9.0)))
    assert(Snapshots.read(spark, tgt2)
      .filter(!col(ChangeApply.CurrentCol))
      .select("id", ChangeApply.StartCol, ChangeApply.EndCol).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      Set((1L, 1L, 2L)),
      "the wiped key must surface as a closed [1,2) segment")
    assert(ChangeApply.appliedVersion(tgt2) == 3L)
  }

  test("a props-only commit cannot wedge a mirror (bookkeeping carries)") {
    val src = tmp("ca-props-src")
    val tgt = tmp("ca-props-tgt")
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((1L, "a", 1.0)), src, "day", "id"))                           // v1
    mirrorOnce(tgt, src)
    // an innocuous SET TBLPROPERTIES-shaped commit on the mirror target
    // must carry cdc.* — stripping it reads as a broken exactly-once
    // chain and permanently refuses the catch-up (r11 advisor find)
    Snapshots.commitProps(tgt, Map("tbl.owner" -> "ops"))
    assert(ChangeApply.appliedVersion(tgt) == 1L,
      "props-only commit stripped the cdc.applied bookkeeping")
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      df((2L, "b", 2.0)), src, "day", "id"))                           // v2
    mirrorOnce(tgt, src)
    assert(rows(Snapshots.read(spark, tgt)) ==
      Set((1L, "a", 1.0), (2L, "b", 2.0)))
  }
}
