package graft.tools
import graft.engine.Graft
import org.apache.spark.sql.SparkSession

/** r18 (VERDICT #5): st2/st3 drain cost attribution via Structured
  * Streaming's own progress metrics — per-batch durationMs phases
  * (addBatch, getBatch, latestOffset, queryPlanning, walCommit,
  * commitOffsets) and state-store rows/commit times, so the st2/st3
  * optimization targets the measured phase. Stateful queries run
  * without AQE, so `spark.sql.shuffle.partitions` (= state partition
  * count for a fresh checkpoint) is probed via SPARK_GRAFT_CPUS.
  * Usage: `runMain graft.tools.StreamCostProbe3 [sfDir]`. */
object StreamCostProbe3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.configure(SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.Pipelines
    for (name <- Seq("st2", "st3"); round <- 1 to 3) {
      val ckpt = Graft.freshDir(s"stp3-$name-$round")
      val t0 = System.nanoTime()
      val q = name match {
        case "st2" =>
          Pipelines.hourlyAgg(Pipelines.eventsStream(spark, dir))
            .writeStream.format("noop").outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
        case "st3" =>
          graft.streaming.StatefulSessions
            .sessionStream(spark, Pipelines.eventsStream(spark, dir))
            .writeStream.format("noop").outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
      }
      q.awaitTermination()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[stp3] $name round $round total ${dt}%.2f s")
      q.recentProgress.foreach { p =>
        val st = p.stateOperators.map(s =>
          s"rows=${s.numRowsTotal} updated=${s.numRowsUpdated} " +
            s"commitMs=${s.commitTimeMs}").mkString("; ")
        println(s"[stp3]   batch ${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs} state[$st]")
      }
      org.apache.spark.sql.GraftSqlBridge.unloadStateStores()
      Graft.wipeDir(ckpt)
    }
    spark.stop()
  }
}
