package graft.tools

import graft.engine.{Graft, Tables}
import graft.ops.lake.{DynamicFilter, Snapshots}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dynamic-file-pruning probe (builder QA, not part of the library
  * surface): how many manifest entries survive a selective dim's
  * runtime key set on the key-clustered events table — the number the
  * spec pins on a fixture, measured here at a real SF. */
object DfpProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // a REAL table's file count scales with data (size-bounded files);
    // the default 128-bucket clustering caps the fixture at ~157 files
    // at every SF, which under-states skipping at sf1+ — pass the
    // bucket count to keep per-file key ranges scale-constant
    val buckets = args.lift(1).map(_.toInt).getOrElse(128)
    val spark = Graft.configure(
      SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val table = Graft.freshDir("probe-dfp")
    val ev = Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "event_type", "value", "event_date")
    Snapshots.commitAll(table, Snapshots.withBloom(
      Snapshots.stageWithStats(ev, table, "event_date", "event_id",
        buckets = buckets),
      table, "event_id", spark))
    val all = Snapshots.entriesAll(table)

    def probe(label: String, mod: Int): Unit = {
      val dim = ev.filter(col("event_id") % mod === 0)
        .select(col("event_id").as("did")).distinct()
      val nDim = dim.count()
      val (pred, keys) = DynamicFilter.keyPrune(
        spark, table, "event_id", dim, "did", maxKeys = 100000,
        factTagCol = None)
      val kept = all.count(pred)
      val rows = DynamicFilter.prunedJoin(spark, table, dim,
        "event_id", "did").count()
      println(f"[dfp] $label%-28s dimKeys=$nDim%6d  " +
        f"files=$kept%4d/${all.size}%4d  joinRows=$rows%7d  " +
        s"collected=${keys.isDefined}")
    }
    probe("0.1%-selective dim", 1000)
    probe("1%-selective dim", 100)
    probe("10%-selective dim", 10)
    // over-cap: range fallback only
    val dim = ev.filter(col("event_id") % 10 === 0)
      .select(col("event_id").as("did")).distinct()
    val (pred, keys) = DynamicFilter.keyPrune(
      spark, table, "event_id", dim, "did", maxKeys = 5, factTagCol = None)
    println(s"[dfp] over-cap range fallback      " +
      s"files=${all.count(pred)}/${all.size}  collected=${keys.isDefined}")
    spark.stop()
  }
}
