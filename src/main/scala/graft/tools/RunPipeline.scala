package graft.tools

import org.apache.spark.sql.SparkSession

/** CLI driver for the streaming bronze-ingest pipeline: replays the
  * events table through the file-stream source into an event-time
  * partitioned parquet sink with checkpointing.
  *
  * Usage: runMain graft.tools.RunPipeline [sfDir [outDir [ckptDir]]]
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("target/pipeline-bronze")
    val ckpt = args.lift(2).getOrElse("target/pipeline-ckpt")
    val spark = graft.engine.Graft.configure(
      SparkSession.builder().master(s"local[${graft.engine.Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.streaming.Pipelines.bronzeIngest(spark, sfDir, out, ckpt)
    q.awaitTermination()
    val written = spark.read.parquet(out)
    val parts = new java.io.File(out).listFiles().count(_.getName.startsWith("event_date="))
    println(s"[pipeline] rows=${written.count()} datePartitions=$parts out=$out")
    spark.stop()
  }
}
