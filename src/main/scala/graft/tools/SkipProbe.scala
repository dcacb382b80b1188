package graft.tools

import graft.engine.{Graft, Tables}
import graft.ops.lake.{Skipping, Snapshots}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the file-skipping rates the COVERAGE.md s26/s27/s28 rows
  * report, with the SHIPPED probe parameters, so the documented numbers
  * always describe the queries as they run (the fixture data and the
  * probe boxes have both changed across rounds). Usage:
  * `runMain graft.tools.SkipProbe [sfDir]` (default sf0.01). */
object SkipProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Graft.configure(
      SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // s26: value-band scan over the value-range-clustered stage
    {
      val table = Graft.freshDir("probe-s26")
      val ev = Tables(spark, dir).events
        .withColumn("event_date", to_date(col("ts")))
        .select("event_id", "event_type", "value", "event_date")
      Snapshots.commitAll(table, Snapshots.stageWithStats(ev, table, "event_date", "value"))
      val total = Snapshots.read(spark, table).inputFiles.length
      val kept = Snapshots.read(spark, table,
        fileFilter = Snapshots.rangeOverlap("value", Skipping.Lo, Skipping.Hi))
        .inputFiles.length
      report("s26", s"band value [${Skipping.Lo},${Skipping.Hi}): opens $kept of $total files " +
        f"(${100.0 * (total - kept) / total}%.0f%% skipped)")
    }

    // s27: 2-D box over the z-ordered stage — box, and each dim alone
    {
      val table = Graft.freshDir("probe-s27")
      val ev = Tables(spark, dir).events
        .select("event_id", "event_type", "user_id", "value")
      Snapshots.commitAll(table,
        Snapshots.stageZOrdered(ev, table, "event_type", Seq("user_id", "value")))
      val total = Snapshots.read(spark, table).inputFiles.length
      def kept(f: Snapshots.Entry => Boolean): Int =
        Snapshots.read(spark, table, fileFilter = f).inputFiles.length
      val uid = kept(Snapshots.rangeOverlap("user_id", Skipping.UidLo, Skipping.UidHi))
      val v = kept(Snapshots.rangeOverlap("value", Skipping.ValLo, Skipping.ValHi))
      val box = kept(Snapshots.allOf(
        Snapshots.rangeOverlap("user_id", Skipping.UidLo, Skipping.UidHi),
        Snapshots.rangeOverlap("value", Skipping.ValLo, Skipping.ValHi)))
      report("s27", s"2-D box (uid [${Skipping.UidLo},${Skipping.UidHi}] x value " +
        s"[${Skipping.ValLo},${Skipping.ValHi}]): opens $box of $total files " +
        f"(${100.0 * (total - box) / total}%.0f%% skipped); " +
        s"uid alone keeps $uid, value alone keeps $v")
    }

    // r9: clustering EROSION + zorder-compact restore — COW rewrites
    // (restageLike) preserve stats but not clustering, so repeated wide
    // merges collapse the z-order boxes until min/max prunes nothing;
    // compact(zorderBy) restores the s27-anchor rate
    {
      val table = Graft.freshDir("probe-reclus")
      val ev = Tables(spark, dir).events
        .select("event_id", "event_type", "user_id", "value")
      Snapshots.commitAll(table,
        Snapshots.stageZOrdered(ev, table, "event_type", Seq("user_id", "value")))
      def box(): (Int, Int) = {
        val total = Snapshots.read(spark, table).inputFiles.length
        val kept = Snapshots.read(spark, table, fileFilter = Snapshots.allOf(
          Snapshots.rangeOverlap("user_id", Skipping.UidLo, Skipping.UidHi),
          Snapshots.rangeOverlap("value", Skipping.ValLo, Skipping.ValHi)))
          .inputFiles.length
        (kept, total)
      }
      val (k0, t0) = box()
      // erode: each merge re-states a thin key stripe that lands in
      // EVERY file (no event_id stats on this table), so every file
      // rewrites un-clustered
      (1 to 3).foreach { i =>
        val src = Snapshots.read(spark, table)
          .filter(col("event_id") % 97 === i)
          .withColumn("value", col("value") + 0.001)
        graft.ops.lake.Mutations.mergeInto(spark, table, src, "event_id", "event_type")
      }
      val (k1, t1) = box()
      Snapshots.compact(spark, table, "event_type", zorderBy = Seq("user_id", "value"))
      val (k2, t2) = box()
      report("s27r", s"zorder-compact restore: 2-D box opens $k0 of $t0 files fresh; " +
        s"$k1 of $t1 after 3 wide COW merges " +
        f"(${100.0 * (t1 - k1) / t1}%.0f%% skipped); " +
        s"$k2 of $t2 after compact(zorderBy) " +
        f"(${100.0 * (t2 - k2) / t2}%.0f%% skipped)")
    }

    // r16: INCREMENTAL re-cluster — fragment ONE day, then let the
    // zero-IO erosion metric scope the rewrite: the fragmented day's
    // skip rate is restored while every other day's files carry by
    // name (the rewrite touches a 1/N slice of the table, the
    // liquid-clustering cost shape)
    {
      val table = Graft.freshDir("probe-zinc")
      val ev = Tables(spark, dir).events
        .withColumn("event_date", to_date(col("ts")))
        .select("event_id", "event_date", "value")
      Snapshots.commitAll(table,
        Snapshots.stageWithStats(ev, table, "event_date", "value"))
      val days = Snapshots.entriesAll(table).map(_.tag).distinct.sorted
      val hot = days.head
      // fragment the hot day: two full-range overlapping appends
      (1 to 2).foreach { i =>
        Snapshots.commitAll(table, Snapshots.restageLike(spark,
          Snapshots.read(spark, table)
            .filter(col("event_date") === lit(hot).cast("date"))
            .withColumn("event_id", col("event_id") + lit(i * 10000000L)),
          table, "event_date"))
      }
      def bandKept(): (Int, Int) = {
        val es = Snapshots.entriesAll(table)
        (es.count(Snapshots.rangeOverlap("value", Skipping.Lo, Skipping.Hi)),
          es.size)
      }
      val (k0, t0) = bandKept()
      val untouched = Snapshots.entriesAll(table)
        .filter(_.tag != hot).map(_.rel).toSet
      val eroded = Snapshots.erodedTags(table, Seq("value"), maxOverlap = 1.5)
      val (_, reclustered) = Snapshots.reclusterEroded(
        spark, table, "event_date", Seq("value"), maxOverlap = 1.5)
      val (k1, t1) = bandKept()
      val carried = Snapshots.entriesAll(table)
        .filter(_.tag != hot).map(_.rel).toSet == untouched
      report("s-zinc", s"incremental re-cluster: eroded=$eroded " +
        s"reclustered=$reclustered; band keeps $k0/$t0 files fragmented, " +
        s"$k1/$t1 after scoped rewrite " +
        f"(${100.0 * (t1 - k1) / t1}%.0f%% skipped); " +
        s"untouched days carried by name: $carried")
    }

    // s28: bloom point lookup on the un-clustered id column
    {
      val table = Graft.freshDir("probe-s28")
      val ev = Tables(spark, dir).events
        .withColumn("event_date", to_date(col("ts")))
        .select("event_id", "event_type", "user_id", "value", "event_date")
      Snapshots.commitAll(table,
        Snapshots.withBloom(
          Snapshots.stageWithStats(ev, table, "event_date", "value"),
          table, "event_id", spark))
      val total = Snapshots.read(spark, table).inputFiles.length
      val kept = Snapshots.read(spark, table,
        fileFilter = Snapshots.anyOf(
          Skipping.ProbeIds.map(id => Snapshots.mightContainLong(table, "event_id", id)): _*))
        .inputFiles.length
      report("s28", s"${Skipping.ProbeIds.size}-id IN-list: opens $kept of $total files " +
        f"(${100.0 * (total - kept) / total}%.0f%% skipped)")
    }
    spark.stop()
  }

  private def report(q: String, msg: String): Unit = println(s"[skip-probe] $q $msg")
}
