package graft.tools
import graft.engine.Graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** r17: where does a bench streaming drain spend its time? Round 1
  * found st1's drain ≈ the identical BATCH partitioned write (4.9 s of
  * the 5.0 s drain; stream machinery 0.6 s) — so this probe now
  * decomposes the WRITE: flat vs partitioned, exchange vs not, file
  * count, codec. Usage: `runMain graft.tools.StreamCostProbe [sfDir]`. */
object StreamCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.configure(SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.Pipelines
    var i = 0
    def out(): String = { i += 1; Graft.freshDir(s"stprobe-out-$i") }
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[stprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val ev = graft.engine.Tables(spark, dir).events
    val proj = Pipelines.bronzeProjection(ev.withColumn("ts", col("ts").cast("timestamp")))
    def projR = proj.repartition(col("event_date"), col("event_hour"))
    for (round <- 1 to 2) {
      time(s"r$round noop of projR") {
        projR.write.format("noop").mode("overwrite").save()
      }
      time(s"r$round flat write (no partitionBy)") {
        proj.write.mode("overwrite").parquet(out())
      }
      time(s"r$round partitioned write, with repartition (st1 shape)") {
        projR.write.mode("overwrite").partitionBy("event_date", "event_hour").parquet(out())
      }
      time(s"r$round partitioned write, no repartition") {
        proj.write.mode("overwrite").partitionBy("event_date", "event_hour").parquet(out())
      }
      time(s"r$round partitioned write date-only, with repartition") {
        proj.repartition(col("event_date"))
          .write.mode("overwrite").partitionBy("event_date").parquet(out())
      }
    }
    spark.stop()
  }
}
