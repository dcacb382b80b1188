package graft.tools

import graft.engine.{Graft, Tables}
import graft.ops.lake.{Mutations, Snapshots}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the DELETE paths' scaling for BENCH_NOTES — the r9 change
  * replaced the single-task `repartition(1)` sidecar write with a
  * file-id-sharded write plus an optional COW crossover, and this probe
  * is the evidence: per delete width (1% / 10% / 40% of rows) it times
  *   - `mor`: pure merge-on-read (vector sidecar, no crossover), with
  *     the sidecar's part-file count (sharding visible), and
  *   - `auto`: the crossover policy with the tag column known (below
  *     the 0.3 row-fraction threshold it stays MOR, above it routes to
  *     copy-on-write), with the resulting path named,
  * each against a FRESH snapshot table built from the sf dir's events
  * (the build is outside the timed window). A merged read follows each
  * delete so the read-side cost of the written shape is timed too.
  * Usage: `runMain graft.tools.DeleteProbe [sfDir]` (default sf0.1). */
object DeleteProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.configure(
      SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def build(): String = {
      val table = Graft.freshDir("probe-del")
      val ev = Tables(spark, dir).events
        .withColumn("event_date", to_date(col("ts")))
        .select("event_id", "event_type", "value", "event_date")
      Snapshots.commit(table, Snapshots.stage(ev, table, "event_date"))
      table
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def sidecarParts(table: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$table/dv")).count(_.getName.endsWith(".parquet"))
    }
    def readBack(table: String): Double =
      time(Mutations.readMerged(spark, table).queryExecution.toRdd.count())

    for ((label, modulus, keep) <- Seq(
        ("1pct", 100, 1), ("10pct", 10, 1), ("40pct", 10, 4))) {
      val pred = pmod(col("event_id"), lit(modulus)) < keep
      val tm = build()
      val morW = time(Mutations.deleteWhere(spark, tm, pred))
      val morR = readBack(tm)
      val shards = sidecarParts(tm)
      val ta = build()
      val autoW = time(Mutations.deleteWhere(spark, ta, pred,
        cowTagCol = Some("event_date")))
      val autoR = readBack(ta)
      val path =
        if (Snapshots.entriesAll(ta).exists(_.props.contains("ref.dv"))) "mor"
        else "cow"
      println(f"[delete-probe] $label%-5s mor: write $morW%.2fs read $morR%.2fs " +
        f"($shards sidecar parts) | auto($path): write $autoW%.2fs read $autoR%.2fs")
    }
    spark.stop()
  }
}
