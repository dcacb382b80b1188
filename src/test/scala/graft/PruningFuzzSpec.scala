package graft

import graft.ops.lake.{Mutations, Snapshots}
import graft.sql.LakeSql
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SOUNDNESS FUZZER for the manifest-pruning predicate compiler
  * ([[graft.ops.lake.Pruning]]): random predicate trees over every
  * translated shape — equality, IN, ranges (incl. tag ranges), IS
  * [NOT] NULL, LIKE-prefix, `<>`, AND/OR nesting — run through the
  * registered SQL path (resolution rule → GraftFileIndex →
  * Pruning.compile) and compared row-for-row against the SAME
  * predicate on a raw temp view of the identical data. Any unsound
  * skip (a pruned file that held a matching row) shows up as a
  * missing id. The run also asserts the fuzz actually EXERCISED
  * pruning (some predicates opened strictly fewer files), so a
  * regression that silently disables skipping fails too. A mid-run DV
  * delete re-checks every shape under the anti-join read. */
class PruningFuzzSpec extends AnyFunSuite with SparkFixture {

  test("sorted IN-list range checks equal the linear anyOf forms (fuzz)") {
    import graft.ops.lake.Snapshots
    val rnd = new scala.util.Random(1337)
    def entry(props: (String, String)*) =
      Snapshots.Entry("__tag=x/p.parquet", "x", props.toMap)
    (1 to 400).foreach { i =>
      // numeric: random value list vs random [mn, mx] file bounds
      val vals = IndexedSeq.fill(rnd.nextInt(9) + 1)(rnd.nextInt(60).toDouble)
      val mn = rnd.nextInt(60).toDouble
      val mx = mn + rnd.nextInt(12)
      val e = entry("min.c" -> mn.toString, "max.c" -> mx.toString)
      val fast = Snapshots.rangeOverlapAnySorted("c", vals.sorted)(e)
      val slow = Snapshots.anyOf(
        vals.map(v => Snapshots.rangeOverlap("c", v, v)): _*)(e)
      assert(fast == slow, s"iter $i: vals=$vals bounds=[$mn,$mx]")
      // string: include supplementary chars — UTF-8 byte order differs
      // from String.compareTo's UTF-16 order exactly there
      val pool = IndexedSeq("a", "ab", "b", "z", "￿", "𐀀", "é")
      val svals = IndexedSeq.fill(rnd.nextInt(5) + 1)(pool(rnd.nextInt(pool.size)))
      val sb = IndexedSeq(pool(rnd.nextInt(pool.size)), pool(rnd.nextInt(pool.size)))
        .sorted(Snapshots.utf8Ordering)
      val se = entry("smin.c" -> sb(0), "smax.c" -> sb(1))
      val sFast = Snapshots.rangeOverlapStringAnySorted("c",
        svals.sorted(Snapshots.utf8Ordering))(se)
      val sSlow = Snapshots.anyOf(svals.map(v =>
        Snapshots.rangeOverlapString("c", Some(v), Some(v))): _*)(se)
      assert(sFast == sSlow, s"iter $i: svals=$svals bounds=$sb")
    }
    // files without stats are kept, as everywhere
    assert(Snapshots.rangeOverlapAnySorted("c", IndexedSeq(1.0))(entry()))
    assert(Snapshots.rangeOverlapStringAnySorted("c", IndexedSeq("a"))(entry()))
    // unpaired surrogates all encode to '?' in UTF-8: distinct strings
    // with EQUAL encodings must compare 0 (a lexicographic tiebreak
    // returns -1 both ways and TimSort can throw mid-sort) — and the
    // sorted predicate must still agree with the linear form
    val weird = IndexedSeq("\ud800", "\udc00", "a", "?")
    val sortedWeird = weird.sorted(Snapshots.utf8Ordering) // must not throw
    assert(Snapshots.utf8Ordering.compare("\ud800", "\udc00") == 0)
    val we = entry("smin.c" -> "!", "smax.c" -> "@")
    assert(Snapshots.rangeOverlapStringAnySorted("c", sortedWeird)(we) ==
      Snapshots.anyOf(weird.map(v =>
        Snapshots.rangeOverlapString("c", Some(v), Some(v))): _*)(we))
  }

  test("random predicate trees: pruned SQL read == raw filter; pruning fires") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import spark.implicits._
    val rnd = new scala.util.Random(90210)

    val days = Seq("apple", "apricot", "banana", "berry", "cherry", "date")
    val strs = Seq("alpha", "alps", "beta", "click", "clock", "zulu")
    // s and d CORRELATE with n, so the (day, n) range clustering below
    // also narrows their per-file bounds — every stats shape (ranges,
    // string bounds, null counts) gets real chances to skip
    val rows = (1 to 360).map { i =>
      val n = (rnd.nextInt(1000) - 200).toLong
      (i.toLong,
       days(rnd.nextInt(days.size)),
       if (rnd.nextInt(4) == 0) None
       else Some(strs(
         if (rnd.nextInt(10) < 7) (((n + 200) / 167).toInt).min(5).max(0)
         else rnd.nextInt(strs.size))),
       n,
       java.sql.Date.valueOf(
         java.time.LocalDate.of(2024, 1, 1).plusDays(((n + 200) / 25).toInt)))
    }
    val df = rows.toDF("id", "day", "s", "n", "d")
    val table = tmp("prune-fuzz")
    // stageWithStats PRESERVES its (day, n) range clustering (plain
    // stage would re-shuffle by tag and re-widen every file); the
    // extra withFooterStats pass re-decorates the same files with all
    // three stats columns
    val staged = Snapshots.stageWithStats(df, table, "day", "n", buckets = 8)
    Snapshots.commitAll(table, Snapshots.withFooterStats(
      staged.map(e => (e.rel, e.tag)), table, Seq("s", "n", "d")))
    LakeSql.register(spark, "fz", table, "day")
    rows.toDF("id", "day", "s", "n", "d").createOrReplaceTempView("fz_raw")
    val total = Snapshots.entriesAll(table).size
    assert(total >= 6)

    def literal(c: String): String = c match {
      case "day" => s"'${days(rnd.nextInt(days.size))}'"
      case "s"   => s"'${strs(rnd.nextInt(strs.size))}'"
      case "n"   => (rnd.nextInt(1400) - 400).toString
      case _     => f"DATE '2024-01-${1 + rnd.nextInt(28)}%02d'"
    }
    def leaf(): String = {
      val c = Seq("day", "s", "n", "d")(rnd.nextInt(4))
      rnd.nextInt(8) match {
        case 0 => s"$c = ${literal(c)}"
        case 1 => s"$c <> ${literal(c)}"
        case 2 => s"$c IS NULL"
        case 3 => s"$c IS NOT NULL"
        case 4 => s"$c IN (${Seq.fill(1 + rnd.nextInt(3))(literal(c)).mkString(", ")})"
        case 5 =>
          val (a, b) = (literal(c), literal(c))
          s"$c BETWEEN least($a, $b) AND greatest($a, $b)"
        case 6 if c == "day" || c == "s" =>
          val p = (if (c == "day") days else strs)(rnd.nextInt(6)).take(1 + rnd.nextInt(3))
          s"$c LIKE '$p%'"
        case _ => s"$c ${Seq("<", "<=", ">", ">=")(rnd.nextInt(4))} ${literal(c)}"
      }
    }
    def tree(depth: Int): String =
      if (depth == 0 || rnd.nextInt(3) == 0) leaf()
      else s"(${tree(depth - 1)}) ${if (rnd.nextBoolean()) "AND" else "OR"} (${tree(depth - 1)})"

    def idsOf(sql: String): Seq[Long] =
      spark.sql(sql).collect().map(_.getLong(0)).sorted.toSeq
    // ONE execution serves both the row answer and the files metric
    def idsAndScanned(sql: String): (Seq[Long], Long) = {
      val d = spark.sql(sql)
      val ids = d.collect().map(_.getLong(0)).sorted.toSeq
      val p = d.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      (ids,
       p.collect { case sc: FileSourceScanExec => sc.metrics("numFiles").value }.sum)
    }

    var prunedCount = 0
    var statsPruned = 0 // pruning with the tag column uninvolved
    def run(rounds: Int, label: String): Unit = (1 to rounds).foreach { i =>
      val pred = tree(2)
      val (got, files) = idsAndScanned(s"SELECT id FROM fz WHERE $pred")
      val want = idsOf(s"SELECT id FROM fz_raw WHERE $pred")
      assert(got == want, s"$label #$i diverged on: $pred")
      if (files < total) {
        prunedCount += 1
        if (!pred.contains("day")) statsPruned += 1
      }
    }

    run(60, "clean")
    assert(prunedCount >= 10,
      s"the fuzz must actually exercise pruning (pruned $prunedCount/60)")
    assert(statsPruned >= 3,
      s"stats shapes (no tag involved) must skip too (got $statsPruned)")

    // DV flip: the pruned scan moves under the anti-join — every shape
    // must stay sound on the merged read
    Mutations.deleteWhere(spark, table, col("n") > 700L)
    spark.sql("SELECT id, day, s, n, d FROM fz_raw WHERE n <= 700 OR n IS NULL")
      .createOrReplaceTempView("fz_raw")
    run(40, "post-DV")

    LakeSql.unregister(spark, "fz")
    spark.catalog.dropTempView("fz_raw")
  }
}
