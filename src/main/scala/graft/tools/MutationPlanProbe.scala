package graft.tools

import graft.engine.{Graft, Tables}
import graft.ops.lake.{Mutations, Snapshots}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan evidence for the r9 mutation shapes (PLANS.md): the clause-MERGE
  * rewrite join and the touched-tag MV recompute don't surface through
  * `Explain` (they execute while the registered query BUILDS its table),
  * so this probe reconstructs each hot frame through the same public
  * reads and prints the AQE-final plan / pruning counts.
  * Usage: `runMain graft.tools.MutationPlanProbe [sfDir]` (default sf0.01). */
object MutationPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Graft.configure(
      SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val table = Graft.freshDir("probe-mplan")
    val ev = Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "event_type", "value", "event_date")
    Snapshots.commitAll(table,
      Snapshots.stageWithStats(ev, table, "event_date", "event_id"))
    val total = Snapshots.entriesAll(table).size

    // 1. clause-MERGE rewrite frame: touched-file merged read LEFT OUTER
    //    source on the key — the shape mergeIntoClauses rewrites through
    val source = ev.filter(col("event_date") === "2024-01-19")
      .withColumn("value", col("value") + 1000.0)
    val bounds = source.agg(min("event_id"), max("event_id")).head()
    val cand = Snapshots.rangeOverlap("event_id",
      bounds.getLong(0).toDouble, bounds.getLong(1).toDouble)
    val candN = Snapshots.entriesAll(table).count(cand)
    println(s"[mplan] merge candidate prune: $candN of $total files overlap the source key band")
    val tgt = Mutations.readMerged(spark, table, fileFilter = cand)
    val joined = tgt.alias("t").join(
      source.withColumn("__m", lit(true)).alias("s"),
      col("t.event_id") === col("s.event_id"), "left_outer")
      .filter(!(col("s.__m").isNotNull && coalesce(col("s.value") <= 1100.0, lit(false))))
      .select(col("t.event_id"), col("t.event_type"),
        when(col("s.__m").isNotNull, col("s.value")).otherwise(col("t.value")).as("value"),
        col("t.event_date"))
    joined.queryExecution.toRdd.count()
    println("[mplan] clause-merge rewrite join, AQE-final plan:")
    println(joined.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode).linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Scan") || l.contains("AdaptiveSparkPlan"))
      .mkString("\n"))

    // 2. touched-tag recompute: tag-pruned merged read — manifest-level
    //    pruning means the recompute opens only the touched days' files
    Mutations.deleteWhere(spark, table,
      col("event_date") === "2024-01-19" && col("value") > 100.0)
    val dvN = Snapshots.entriesAll(table).count(_.props.contains("ref.dv"))
    println(s"[mplan] delete vectored $dvN of $total files")
    val touchedRead = Mutations.readMerged(spark, table,
      tagFilter = _ == "2024-01-19")
    println(s"[mplan] tag recompute scan: opens ${touchedRead.inputFiles.length} " +
      s"of ${Snapshots.entriesAll(table).size} files for 1 touched day of 30")
    // execute the frame we inspect, so the printed verdict is AQE-final
    touchedRead.queryExecution.toRdd.count()
    val mergedPlan = touchedRead.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    println("[mplan] DV anti-join in the merged read: " +
      (if (mergedPlan.contains("BroadcastHashJoin") && mergedPlan.contains("LeftAnti"))
        "BroadcastHashJoin LeftAnti (sidecar broadcast, data side never shuffles)"
      else "NOT broadcast — inspect:\n" + mergedPlan.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange"))
        .mkString("\n")))
    spark.stop()
  }
}
