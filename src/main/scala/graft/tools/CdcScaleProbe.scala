package graft.tools

import graft.engine.{Graft, Tables}
import graft.ops.lake.{ChangeApply, Mutations, Snapshots}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CDC-apply scale probe (builder QA): the claim that matters at
  * 100 TB is that a catch-up costs O(changed data), NOT O(table size)
  * — run this at sf0.1 and a ScaleUp-derived sf1 and the
  * small-mutation catch-up time should stay roughly flat while the
  * bootstrap (which IS table-sized, once) scales with the data. */
object CdcScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.configure(
      SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val src = Graft.freshDir("probe-cdc-src")
    val tgt = Graft.freshDir("probe-cdc-tgt")
    val ev = Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "event_type", "value", "event_date")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tBuild) = timed(Snapshots.commitAll(src,
      Snapshots.stageWithStats(ev, src, "event_date", "event_id")))
    val nRows = Mutations.readMerged(spark, src).count()
    val nFiles = Snapshots.entriesAll(src).size
    val (_, tBoot) = timed(
      ChangeApply.mirror(spark, tgt, src, Seq("event_id"), "event_date"))
    // small mutation: one day's clicks — the changed set is
    // SF-proportional per day but tiny vs the table
    val (_, tMut) = timed(Mutations.updateWhere(spark, src,
      col("event_type") === "click" && col("event_date") === "2024-01-15",
      Map("value" -> (col("value") + 1.0)), "event_date"))
    val (_, tCatch) = timed(
      ChangeApply.mirror(spark, tgt, src, Seq("event_id"), "event_date"))
    // no-change poll: two metadata reads
    val (_, tIdle) = timed(
      ChangeApply.mirror(spark, tgt, src, Seq("event_id"), "event_date"))
    println(f"[cdc-scale] rows=$nRows%9d files=$nFiles%5d " +
      f"build=$tBuild%6.2fs bootstrap=$tBoot%6.2fs smallMutation=$tMut%6.2fs " +
      f"catchUp=$tCatch%6.2fs idlePoll=$tIdle%6.3fs")
    spark.stop()
  }
}
