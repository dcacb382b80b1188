package graft.tools

import graft.engine.{Graft, Tables}
import graft.ops.gold.Joins
import graft.ops.lake.{Analyze, Snapshots}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale receipts for the r16 operators: the broadcast vs
  * merged-stream as-of walls (does skipping the fact exchange pay?)
  * and the histogram-refresh cost ladder (exact sort vs sketch scan vs
  * zero-scan sidecar fold). Usage:
  * `runMain graft.tools.AsOfBroadcastProbe [sfDir]` (default sf0.1;
  * the round receipts run it on the ScaleUp sf1 fixture too). */
object AsOfBroadcastProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.configure(
      SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(df: => DataFrame): Double = {
      df.queryExecution.toRdd.count() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(1)
    }

    // the s70 shape: purchases (fact) x clicks (dim-sized right)
    val ev = Tables(spark, dir).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_event_id"), col("user_id"),
        col("ts"), col("value").as("purchase_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_event_id"), col("value").as("click_value"))
    val nL = purchases.count(); val nR = clicks.count()
    val stream = time(Joins.asOf(purchases, clicks,
      "user_id", "ts", "click_ts", "click_event_id"))
    val bcast = time(Joins.asOfBroadcast(purchases, clicks, Seq("user_id"),
      "ts", "click_ts", "click_event_id"))
    println(f"[asof-probe] $dir left=$nL right=$nR " +
      f"merged-stream=$stream%.2fs broadcast=$bcast%.2fs " +
      f"(${stream / bcast}%.2fx)")
    // the TRUE dim-right shape: the right side bounded (one quote
    // stream per 20 users) while the fact keeps its SF scale — this is
    // the case the election exists for
    val dimClicks = clicks.filter(col("user_id") % 20 === 0)
    val nD = dimClicks.count()
    val streamD = time(Joins.asOf(purchases, dimClicks,
      "user_id", "ts", "click_ts", "click_event_id"))
    val bcastD = time(Joins.asOfBroadcast(purchases, dimClicks, Seq("user_id"),
      "ts", "click_ts", "click_event_id"))
    println(f"[asof-probe] $dir dim-right left=$nL right=$nD " +
      f"merged-stream=$streamD%.2fs broadcast=$bcastD%.2fs " +
      f"(${streamD / bcastD}%.2fx)")

    // histogram refresh ladder on a quantile-sidecar'd lake table
    val table = Graft.freshDir("probe-hist-" +
      dir.replaceAll("[^A-Za-z0-9.]", "_"))
    Snapshots.commitAll(table, Snapshots.withQuantiles(
      Snapshots.stageWithStats(
        ev.withColumn("event_date", to_date(col("ts")))
          .select("event_id", "event_type", "value", "event_date"),
        table, "event_date", "event_id"),
      table, "value", spark))
    def wall(body: => Any): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val exact = wall(Analyze.histogram(spark, table, "value", 32))
    val approx = wall(Analyze.histogramApprox(spark, table, "value", 32))
    val fold = wall(Analyze.histogramFromSketches(table, "value", 32))
    println(f"[asof-probe] hist refresh @ $dir: exact-sort=$exact%.2fs " +
      f"sketch-scan=$approx%.2fs sidecar-fold=$fold%.3fs " +
      f"(fold is ${approx / fold}%.0fx under the scan)")
    spark.stop()
  }
}
