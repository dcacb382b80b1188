package graft.tools

import graft.engine.{Graft, Tables}
import graft.ops.gold.JoinOrder
import graft.ops.gold.JoinOrder.Leg
import graft.ops.lake.{Analyze, Snapshots}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale receipt for the STATS-ORDERED STAR JOIN (r15, the r14 verdict
  * item): the s64 flip was pinned on a fixture — this probe measures
  * what the ordering is WORTH at a real SF. Fixture: a fact whose fk1
  * meets a 2%-selective dim (high-NDV key, too many rows to broadcast
  * under the probe budget) and whose fk2 meets an all-covering dim.
  * Warm wall times for the stats-elected order (selective leg first)
  * vs the adversarial declared order with stats silenced (all-covering
  * leg first — every later exchange carries the unreduced fact).
  * Identical rows by construction; only the fold order differs.
  *
  *   runMain graft.tools.StarOrderProbe [sfDir]
  */
object StarOrderProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.configure(
      SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the probe is about SHUFFLE order, not broadcast avoidance
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val factT = Graft.freshDir("starprobe-fact")
    val dimAT = Graft.freshDir("starprobe-dima")
    val dimBT = Graft.freshDir("starprobe-dimb")
    val ev = Tables(spark, sfDir).events
      .withColumn("fk1", col("event_id") % 1000000L)
      .withColumn("fk2", col("event_id") % 50L)
      .select("event_id", "fk1", "fk2", "value")
    Snapshots.commitAll(factT, Snapshots.stageWithStats(
      ev.withColumn("day", lit("d")), factT, "day", "fk1"))
    // selective: covers 2% of fk1's domain
    Snapshots.commitAll(dimAT, Snapshots.stageWithStats(
      spark.range(0, 20000L).select(col("id").as("dk1"),
          concat(lit("band-"), (col("id") % 4).cast("string")).as("band"))
        .withColumn("day", lit("d")), dimAT, "day", "dk1"))
    // all-covering: every fk2 value matches
    Snapshots.commitAll(dimBT, Snapshots.stageWithStats(
      spark.range(0, 50L).select(col("id").as("dk2"),
          concat(lit("seg-"), (col("id") % 5).cast("string")).as("seg"))
        .withColumn("day", lit("d")), dimBT, "day", "dk2"))
    Analyze.analyze(spark, factT, Seq("fk1", "fk2"))
    Analyze.analyze(spark, dimAT, Seq("dk1"))
    Analyze.analyze(spark, dimBT, Seq("dk2"))

    // worst declared order: the all-covering leg first
    val legs = Seq(Leg(dimBT, "fk2", "dk2"), Leg(dimAT, "fk1", "dk1"))
    def wall(maxStale: Long): Double = {
      def mk() = JoinOrder.statsOrderedJoin(spark, factT, legs,
          broadcastMaxRows = 10, maxStaleVersions = maxStale)
        .groupBy("band", "seg").agg(count(lit(1)), sum("value"))
      mk().count() // warm
      val t0 = System.nanoTime()
      mk().count()
      (System.nanoTime() - t0) / 1e9
    }
    val planned = JoinOrder.orderByStats(factT, legs, broadcastMaxRows = 10)
    val order = planned.map(_.map(_.leg.dimTable.split("-dim").last)).orNull
    val declared = wall(maxStale = -1)
    val ordered = wall(maxStale = 64)
    println(f"[star-probe] sf=$sfDir elected_order=$order " +
      f"declared_worst=${declared}%.2fs stats_ordered=${ordered}%.2fs " +
      f"speedup=${declared / ordered}%.2fx")
    spark.stop()
  }
}
