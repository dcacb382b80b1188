package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Receipt for the over-cap DFP BLOOM row filter (r14): the s66 shape
  * at a real SF — a dense-key lake fact whose every-7th-key dim blows
  * the IN-list cap, so file pruning degrades to the key range (which
  * keeps every file) and the bloom is the only pre-shuffle cut.
  * Prints the rows-shipped-into-the-join receipt (total fact rows vs
  * bloom survivors) and warm wall times for the over-cap join with
  * and without the sketch.
  *
  *   runMain graft.tools.BloomProbe [sfDir]
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.Graft.configure(
      SparkSession.builder().master(s"local[${graft.engine.Graft.cpus}]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.lake.{DynamicFilter, Snapshots}

    val factT = graft.engine.Graft.freshDir("bloomprobe-fact")
    val ev = graft.engine.Tables(spark, sfDir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "event_type", "value", "event_date")
    Snapshots.commitAll(factT, Snapshots.stageWithStats(
      ev, factT, "event_date", "event_id", buckets = 160))
    val dim = ev.filter(col("event_id") % 7 === 0)
      .select(col("event_id").as("dim_id")).distinct()
    // the sketch must be SIZED for the dim's true key count — the
    // bloomKeys contract callers carry; a 20k-sized sketch over sf1's
    // ~143k keys saturates to a ~93% pass-through (measured r15)
    val nDim = dim.count()

    def wall(bloomKeys: Long): Double = {
      val t0 = System.nanoTime()
      DynamicFilter.prunedJoin(spark, factT, dim, "event_id", "dim_id",
          maxKeys = 50, minFiles = 0, bloomKeys = bloomKeys)
        .agg(count(lit(1))).head()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once (page cache, codegen), then time
    wall(0L); wall(nDim)
    val plain = wall(0L)
    val bloomed = wall(nDim)

    // the rows receipt: what ships into the join exchange
    val total = ev.count()
    val sketch = dim.agg(graft.functions.BloomSketch.sizedSketchAgg(
      spark, xxhash64(col("dim_id")), nDim).as("bf"))
      .head.getAs[Array[Byte]](0)
    val survivors = ev.filter(call_function("graft_bloom_might_contain",
      lit(sketch), xxhash64(col("event_id")))).count()

    println(f"[bloom-probe] sf=$sfDir fact_rows=$total%d " +
      f"bloom_survivors=$survivors%d (${100.0 * survivors / total}%.1f%%) " +
      f"overcap_plain=${plain}%.2fs overcap_bloom=${bloomed}%.2fs")
    spark.stop()
  }
}
