package graft.tools

import graft.engine.{Graft, Tables}
import graft.ops.lake.Snapshots
import graft.sql.LakeSql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the r9 pushdown-driven manifest pruning on plain
  * `spark.sql` text over a registered events snapshot table — files
  * opened (FileSourceScan `numFiles` metric) and wall time for
  * day-equality, id-range, and full-scan queries, so BENCH_NOTES'
  * numbers describe the shipped path (resolution rule → GraftFileIndex
  * → Pruning.compile), not a hand-assembled fileFilter. Usage:
  * `runMain graft.tools.SqlPruneProbe [sfDir]` (default sf0.1). */
object SqlPruneProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.configure(
      SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val table = Graft.freshDir("probe-sqlprune")
    val ev = Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "event_type", "value", "event_date")
    Snapshots.commitAll(table, Snapshots.withBloom(
      Snapshots.stageWithStats(ev, table, "event_date", "event_id"),
      table, "event_id", spark))
    LakeSql.register(spark, "probe_ev", table, "event_date")
    val total = Snapshots.entriesAt(table, 1).size
    println(s"[sqlprune] table: $total files, " +
      s"${Snapshots.read(spark, table).count()} rows")

    def probeOf(denom: Long)(label: String, sql: String): Unit = {
      val df = spark.sql(sql) // warm plan
      df.collect()
      val t0 = System.nanoTime()
      val df2 = spark.sql(sql)
      val n = df2.collect().length
      val ms = (System.nanoTime() - t0) / 1e6
      val files = PlanScans.filesOpened(df2)
      println(f"[sqlprune] $label: opens $files of $denom files, " +
        f"$n rows, $ms%.0f ms")
    }
    val probe = probeOf(total) _

    probe("full scan      ", "SELECT * FROM probe_ev")
    probe("day equality   ",
      "SELECT * FROM probe_ev WHERE event_date = DATE '2024-01-18'")
    probe("day IN (3)     ",
      "SELECT * FROM probe_ev WHERE event_date IN " +
        "(DATE '2024-01-05', DATE '2024-01-15', DATE '2024-01-25')")
    probe("id range (1%)  ",
      "SELECT * FROM probe_ev WHERE event_id BETWEEN 100 AND 1100")
    probe("id point       ",
      "SELECT * FROM probe_ev WHERE event_id = 4242")
    probe("day + id range ",
      "SELECT * FROM probe_ev WHERE event_date = DATE '2024-01-18' " +
        "AND event_id BETWEEN 100 AND 100000")
    probe("day BETWEEN (3)",
      "SELECT * FROM probe_ev WHERE event_date BETWEEN DATE '2024-01-10' " +
        "AND DATE '2024-01-12'")

    // POST-DELETE variant (r10): one small MOR delete used to drop the
    // whole table to the unpruned merged read — every SELECT below must
    // keep its skipping with the pruned scan under the DV anti-join
    spark.sql("DELETE FROM probe_ev WHERE event_id = 4242")
    require(Snapshots.entriesAll(table).exists(_.props.contains("ref.dv")),
      "probe delete must stay merge-on-read")
    println(s"[sqlprune] --- after a 1-row DV delete (merge-on-read) ---")
    probe("day equality/DV",
      "SELECT * FROM probe_ev WHERE event_date = DATE '2024-01-18'")
    probe("id range/DV    ",
      "SELECT * FROM probe_ev WHERE event_id BETWEEN 100 AND 1100")
    probe("id point/DV    ",
      "SELECT * FROM probe_ev WHERE event_id = 4243")

    // POST-EVOLUTION variant (r10 session 2): a second era lands with an
    // EXTRA column (kernel staging — the s11 evolution discipline) —
    // divergent footers used to force the unpruned mergeSchema read;
    // the grouped pruned union must keep skipping
    val era2 = ev
      .withColumn("event_id", col("event_id") + 10000000L)
      .withColumn("event_date", date_add(col("event_date"), 60))
      .withColumn("venue", lit("x"))
    Snapshots.commitAll(table,
      Snapshots.stageWithStats(era2, table, "event_date", "event_id"))
    val total2 = Snapshots.entriesAll(table).size
    println(s"[sqlprune] --- after an extra-column era (evolved schema, " +
      s"$total2 files) ---")
    probe("day equality/EV",
      "SELECT * FROM probe_ev WHERE event_date = DATE '2024-01-18'")
    probe("era2 day/EV    ",
      "SELECT * FROM probe_ev WHERE event_date = DATE '2024-03-18'")
    probe("id point/EV    ",
      "SELECT * FROM probe_ev WHERE event_id = 4243")

    // --- r11 s2 shapes: null-count, prefix, not-equal, timestamp ---
    // a second table whose STATS column is a nullable string (label =
    // nullif(event_type, 'error')) so every file carries nulls.label
    // (+ string bounds where derivable)
    val t2 = Graft.freshDir("probe-sqlprune-nulls")
    val ev2 = Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .withColumn("label", expr("nullif(event_type, 'error')"))
      .select("event_id", "label", "value", "event_date")
    Snapshots.commitAll(t2,
      Snapshots.stageWithStats(ev2, t2, "event_date", "label"))
    LakeSql.register(spark, "probe_lb", t2, "event_date")
    val totalLb = Snapshots.entriesAt(t2, 1).size
    println(s"[sqlprune] --- null-count/prefix/not-equal shapes " +
      s"($totalLb files, string stats col `label`) ---")
    val probeLb = probeOf(totalLb.toLong) _
    probeLb("label IS NULL  ", "SELECT * FROM probe_lb WHERE label IS NULL")
    probeLb("label NOT NULL ",
      "SELECT event_id FROM probe_lb WHERE label IS NOT NULL AND event_id < 0")
    probeLb("label LIKE cl% ", "SELECT * FROM probe_lb WHERE label LIKE 'cl%'")
    probeLb("label <> click ",
      "SELECT event_id FROM probe_lb WHERE label <> 'click' AND event_id < 0")
    probeLb("day <>  (tag)  ",
      "SELECT event_id FROM probe_lb WHERE event_date <> DATE '2024-01-18' " +
        "AND event_id < 0")

    // timestamp stats: ts itself is the stats column — CAST(ts AS
    // DATE) predicates rewrite to raw micros ranges (Spark's own
    // optimizer) and prune on the footer micros bounds
    val t3 = Graft.freshDir("probe-sqlprune-ts")
    val ev3 = Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "ts", "value", "event_date")
    Snapshots.commitAll(t3,
      Snapshots.stageWithStats(ev3, t3, "event_date", "ts"))
    LakeSql.register(spark, "probe_ts", t3, "event_date")
    val totalTs = Snapshots.entriesAt(t3, 1).size
    println(s"[sqlprune] --- timestamp (micros) stats ($totalTs files) ---")
    val probeTs = probeOf(totalTs.toLong) _
    probeTs("cast(ts)=day   ",
      "SELECT * FROM probe_ts WHERE CAST(ts AS DATE) = DATE '2024-01-18'")
    probeTs("ts range 1h    ",
      "SELECT * FROM probe_ts WHERE ts BETWEEN TIMESTAMP '2024-01-18 12:00:00' " +
        "AND TIMESTAMP '2024-01-18 13:00:00'")

    // --- r14: SQL-surface DYNAMIC file pruning (SqlDfpRule) ---
    // a FRESH key-clustered fact (probe_ev is DV-bearing and
    // schema-evolved by now — those states keep the merged read and
    // skip this rule by design); a dim cut to 0.1% of the key space
    // joins it through PLAIN spark.sql. minFiles=1 forces the rule at
    // this fixture's file count (the production gate is 256); the
    // receipt is fact files opened by the runtime key filter vs the
    // full-scan join the same SQL ran pre-r14
    val t4 = Graft.freshDir("probe-sqldfp")
    Snapshots.commitAll(t4, Snapshots.stageWithStats(
      ev, t4, "event_date", "event_id"))
    LakeSql.register(spark, "probe_dfp", t4, "event_date")
    Tables(spark, dir).events
      .filter(col("event_id") % 1000 === 0)
      .select(col("event_id").as("dim_id"),
        concat(lit("seg-"), (col("event_id") % 7).cast("string")).as("segment"))
      .distinct().createOrReplaceTempView("probe_dfp_dim")
    val dfpSql =
      """SELECT d.segment, count(*) AS n
        |FROM probe_dfp f JOIN probe_dfp_dim d ON f.event_id = d.dim_id
        |GROUP BY d.segment""".stripMargin
    val totalEv = Snapshots.entriesAll(t4).size
    println(s"[sqlprune] --- SQL DFP join ($totalEv fact files, " +
      "dim = 0.1% of keys) ---")
    def dfpProbe(label: String): Unit = {
      val df = spark.sql(dfpSql)
      val t0 = System.nanoTime()
      val n = df.collect().length
      val ms = (System.nanoTime() - t0) / 1e6
      val opened = PlanScans.scans(df.queryExecution.executedPlan)
        .filter(_.relation.location
          .isInstanceOf[org.apache.spark.sql.GraftFileIndex])
        .map(_.metrics("numFiles").value).sum
      println(f"[sqlprune] $label: opens $opened of $totalEv fact files, " +
        f"$n rows, $ms%.0f ms")
    }
    spark.conf.set(graft.plans.SqlDfp.MinFilesKey, "1")
    dfpProbe("dfp join       ")
    spark.conf.set(graft.plans.SqlDfp.EnabledKey, "false")
    dfpProbe("full-scan join ")
    spark.conf.unset(graft.plans.SqlDfp.EnabledKey)
    spark.conf.unset(graft.plans.SqlDfp.MinFilesKey)

    spark.stop()
  }
}
