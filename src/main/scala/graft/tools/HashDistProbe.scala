package graft.tools
import graft.engine.Graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17: why did st1's repartition(event_date, event_hour) land all 720
  * (date, hour) combos on 3 of 32 shuffle partitions? Prints the bucket
  * histogram of murmur3 hash(event_date, event_hour) mod N over the
  * fixture, plus the actual partition count/row distribution of the
  * repartitioned frame. */
object HashDistProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.configure(SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.engine.Tables(spark, dir).events
    val proj = graft.streaming.Pipelines.bronzeProjection(
      ev.withColumn("ts", col("ts").cast("timestamp")))
    println("[hashdist] distinct (date,hour): " +
      proj.select("event_date", "event_hour").distinct().count())
    proj.select("event_date", "event_hour").distinct()
      .withColumn("bucket", pmod(hash(col("event_date"), col("event_hour")), lit(32)))
      .groupBy("bucket").count().orderBy("bucket")
      .collect().foreach(r => println(s"[hashdist] bucket ${r.get(0)} -> ${r.get(1)} combos"))
    val rp = proj.repartition(col("event_date"), col("event_hour"))
    val sizes = rp.rdd.mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
      .collect().filter(_._2 > 0)
    println(s"[hashdist] repartitioned: ${rp.rdd.getNumPartitions} partitions, " +
      s"non-empty=${sizes.length}: ${sizes.take(40).mkString(" ")}")
    spark.stop()
  }
}
