package graft.tools
import graft.engine.Graft
import org.apache.spark.sql.SparkSession

/** r17: st1 drain broken down by Structured Streaming's own progress
  * metrics (durationMs per phase). Usage:
  * `runMain graft.tools.StreamCostProbe2 [sfDir]`. */
object StreamCostProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.configure(SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.Pipelines
    for (round <- 1 to 3) {
      val ckpt = Graft.freshDir(s"stp2-ckpt-$round")
      val out = Graft.freshDir(s"stp2-out-$round")
      val t0 = System.nanoTime()
      val q = Pipelines.bronzeIngest(spark, dir, out, ckpt)
      q.awaitTermination()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[stp2] round $round total ${dt}%.2f s")
      q.recentProgress.foreach { p =>
        println(s"[stp2]   batch ${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
      }
      org.apache.spark.sql.GraftSqlBridge.unloadStateStores()
    }
    spark.stop()
  }
}
