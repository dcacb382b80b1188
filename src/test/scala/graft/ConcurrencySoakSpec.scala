package graft

import graft.ops.lake.{ChangeApply, Mutations, Snapshots}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized N-writer soak (r11 verdict item 8): four threads
  * interleave appends, DV deletes, OPTIMIZE passes, and CDC catch-ups
  * against ONE table for dozens of operations. The OCC contract under
  * test: every operation either SERIALIZES (applies fully, exactly
  * once) or CONFLICTS LOUDLY (applies nothing) — never a partial or
  * silent outcome — so the final row set must equal the model derived
  * from the successful operations alone, and a CDC mirror fed only by
  * the change feed must converge to the same rows. */
class ConcurrencySoakSpec extends AnyFunSuite with SparkFixture {

  test("randomized 4-writer soak: serialize-or-conflict, zero lost rows") {
    import spark.implicits._
    val table = tmp("soak-tbl")
    def mk(keys: Seq[Long]) =
      keys.map(k => (k, s"d${k % 4}", k * 1.5)).toDF("id", "day", "v")
    // bootstrap: keys 0..99, stats-clustered so deletes/merges prune
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      mk(0L until 100L), table, "day", "id"))

    val nThreads = 4
    val opsPerThread = 14
    // per-thread ledgers: only SUCCESSFUL ops enter the model
    val inserted = Array.fill(nThreads)(
      scala.collection.mutable.Set.empty[Long])
    val deleted = Array.fill(nThreads)(
      scala.collection.mutable.Set.empty[Long])
    val conflicts = new java.util.concurrent.atomic.AtomicInteger(0)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()

    def worker(t: Int): Thread = new Thread(() => {
      val rnd = new scala.util.Random(1234 + t)
      var nextKey = 10000L * (t + 1)
      try {
        (0 until opsPerThread).foreach { _ =>
          val roll = rnd.nextInt(10)
          try {
            if (roll < 5) {
              // APPEND a fresh unique key block (disjoint across threads)
              val keys = (0 until (1 + rnd.nextInt(4))).map(_ => {
                nextKey += 1; nextKey
              })
              Snapshots.commitAllWithRetry(table,
                Snapshots.restageLike(spark, mk(keys), table, "day"))
              inserted(t) ++= keys
            } else if (roll < 8 && inserted(t).nonEmpty) {
              // DELETE a sample of keys THIS thread inserted (no
              // cross-thread ambiguity in the model)
              val victims = rnd.shuffle(inserted(t).toSeq)
                .take(1 + rnd.nextInt(2))
              Mutations.deleteWhere(spark, table,
                col("id").isin(victims: _*))
              deleted(t) ++= victims
            } else if (roll < 9) {
              Snapshots.compact(spark, table, "day")
            } else {
              Snapshots.compact(spark, table, "day", zorderBy = Seq("id"))
            }
          } catch {
            // loud serialize-or-conflict outcomes are the contract;
            // the op applied NOTHING, so the ledger records nothing
            case _: Snapshots.ConcurrentCommitException =>
              conflicts.incrementAndGet()
            case _: Snapshots.ConflictException =>
              conflicts.incrementAndGet()
          }
        }
      } catch { case e: Throwable => failures.add(e) }
    })

    val threads = (0 until nThreads).map(worker)
    threads.foreach(_.start())
    threads.foreach(_.join(600000))
    assert(failures.isEmpty,
      s"unexpected (non-conflict) failure: ${Option(failures.peek()).map(_.toString)}")

    val expected = (0L until 100L).toSet ++
      inserted.flatten.toSet -- deleted.flatten.toSet
    val got = Mutations.readMerged(spark, table, mergeSchema = true)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"lost/extra rows after soak: missing=${(expected -- got).toSeq.sorted.take(10)} " +
        s"extra=${(got -- expected).toSeq.sorted.take(10)} " +
        s"(conflicts=${conflicts.get()})")
    info(s"soak: ${inserted.map(_.size).sum} inserted, " +
      s"${deleted.map(_.size).sum} deleted, ${conflicts.get()} conflicts, " +
      s"final version ${Snapshots.currentVersion(table)}")

    // every surviving committed version stays readable (no torn state)
    val cur = Snapshots.currentVersion(table)
    Seq(1L, cur / 2, cur).distinct.filter(Snapshots.versionExists(table, _))
      .foreach(v => Snapshots.readVersion(spark, table, v).count())

    // a CDC mirror fed only by the change feed converges to the soak's
    // final rows — the feed survived every interleaving
    val mirror = tmp("soak-mirror")
    ChangeApply.mirror(spark, mirror, table, Seq("id"), "day")
    val mirrored = Snapshots.read(spark, mirror)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(mirrored == expected, "CDC mirror diverged after the soak")
  }
}
