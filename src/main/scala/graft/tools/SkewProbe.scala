package graft.tools

import graft.engine.{Graft, Tables}
import graft.ops.gold.Skew
import graft.ops.lake.{Analyze, Snapshots}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AQE-interplay receipt for the recorded-stats SALT verdict (r15, the
  * r14 verdict item): `spark.sql.adaptive.skewJoin` already splits
  * oversized shuffle partitions at runtime, so the pre-salt that
  * [[Skew.strategyByStats]] elects from recorded key frequencies must
  * demonstrably BEAT or gracefully DEFER to it — otherwise the stats
  * machinery is electing a shape AQE gets for free.
  *
  * Fixture: the s62/s69 shape at a real SF — 90% of fact rows on 10 of
  * 5000 keys, a dim too big for the probe's broadcast budget (auto
  * broadcast disabled, the stand-in for "the dim that needs salting is
  * the one too big to replicate"). Three warm-timed shapes, identical
  * rows by construction:
  *
  *   - `aqe-only`   — plain shuffle join, AQE skew split ON (the
  *                    engine default);
  *   - `pre-salt`   — [[Skew.saltedJoin]], salts = 8, AQE still on
  *                    (the stats-elected shape);
  *   - `no-rescue`  — plain join with the skew split OFF: what the
  *                    exchange costs when nothing rescues it.
  *
  * `hotKeys` shapes the skew: 10 = the s62 fixture (90% of rows over
  * ten keys — ~10 oversized partitions), 1 = the wedge case the salt
  * verdict exists for (90% of ALL rows behind one key = one task's
  * worth of work no partition count can spread without a rewrite).
  *
  *   runMain graft.tools.SkewProbe [sfDir] [salts] [hotKeys]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val salts = args.lift(1).map(_.toInt).getOrElse(8)
    val hotKeys = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Graft.configure(
      SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // both sides must actually exchange: the probe is about the
    // shuffle's hot partition, not broadcast avoidance
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val fact = Tables(spark, sfDir).events
      .withColumn("sk",
        when(col("event_id") % 100 < 90, col("event_id") % hotKeys)
          .otherwise(col("event_id") % 5000))
      .select("event_id", "sk", "value")
    val dim = spark.range(0, 5000)
      .select(col("id").as("sk"),
        concat(lit("seg-"), (col("id") % 7).cast("string")).as("segment"))

    def consume(joined: DataFrame): Long =
      joined.groupBy("segment")
        .agg(count(lit(1)).as("n"), sum("value")).count()

    def timeIt(label: String, skewSplit: Boolean)(mk: => DataFrame): Double = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewSplit.toString)
      consume(mk) // warm (page cache, codegen)
      val t0 = System.nanoTime()
      consume(mk)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[skew-probe] $label%-10s ${s}%6.2fs (skewJoin=$skewSplit)")
      s
    }

    val aqeOnly = timeIt("aqe-only", skewSplit = true)(
      fact.join(dim, Seq("sk")))
    val preSalt = timeIt("pre-salt", skewSplit = true)(
      Skew.saltedJoin(fact, dim, "sk",
        monotonically_increasing_id(), salts, "inner"))
    val noRescue = timeIt("no-rescue", skewSplit = false)(
      fact.join(dim, Seq("sk")))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    // the LAKE path the stats verdict actually gates: recorded
    // frequencies must still elect salt on this fixture
    val factT = Graft.freshDir("skewprobe-fact")
    val dimT = Graft.freshDir("skewprobe-dim")
    Snapshots.commitAll(factT, Snapshots.stageWithStats(
      fact.withColumn("day", lit("d")), factT, "day", "sk"))
    Snapshots.commitAll(dimT, Snapshots.stageWithStats(
      dim.withColumn("day", lit("d")), dimT, "day", "sk"))
    Analyze.analyze(spark, factT, Seq("sk"))
    Analyze.frequentKeys(spark, factT, "sk", k = 16)
    Analyze.analyze(spark, dimT, Seq("sk"))
    val verdict = Skew.strategyByStats(factT, "sk", dimT,
      broadcastMaxRows = 1000)
    println(f"[skew-probe] sf=$sfDir salts=$salts hotKeys=$hotKeys " +
      f"aqe_only=${aqeOnly}%.2fs pre_salt=${preSalt}%.2fs " +
      f"no_rescue=${noRescue}%.2fs stats_verdict=${verdict.orNull}")
    spark.stop()
  }
}
