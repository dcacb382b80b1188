package graft

import graft.sources.PagesSource
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSource V2 connector (graft-pages): pushdown really prunes
  * pages from the physical plan, column pruning really reaches the
  * reader, and unsupported predicates stay Spark-side residuals.
  */
class SourcesSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def scanOf(df: DataFrame): BatchScanExec =
    // sparkPlan, not executedPlan: AQE wraps exchanges in an
    // AdaptiveSparkPlanExec whose inner plan collectFirst can't see
    df.queryExecution.sparkPlan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

  test("unfiltered read agrees with the Backfill grid-scan model row-for-row") {
    val dsv2 = spark.read.format("graft-pages").load()
      .orderBy("symbol", "day_offset", "trade_id")
      .as[(String, Int, Long, Double)].collect().toSeq
    val grid = graft.ops.bronze.Backfill.paginatedScan(spark, Sf)
      .as[(String, Int, Long, Double)].collect().toSeq
    assert(dsv2 == grid)
  }

  test("pushed filters prune pages: symbol + day range leaves 2 of 6 partitions") {
    val df = spark.read.format("graft-pages").load()
      .filter(col("symbol") === "ETHUSDT" && col("day_offset") >= 1)
    val scan = scanOf(df)
    assert(scan.inputRDD.getNumPartitions == 2,
      s"expected 2 surviving pages, got ${scan.inputRDD.getNumPartitions}")
    assert(scan.scan.description().contains("pushed=[") &&
      scan.scan.description().contains("EqualTo(symbol,ETHUSDT)"),
      scan.scan.description())
    // handled filters are exactly satisfied by pruning — results right
    val rows = df.select("day_offset").distinct().as[Int].collect().sorted
    assert(rows.toSeq == Seq(1, 2))
  }

  test("column pruning reaches the reader: narrow select reads 1-field rows") {
    val df = spark.read.format("graft-pages").load().select("trade_id")
    val scan = scanOf(df)
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("trade_id"),
      scan.scan.readSchema().treeString)
    assert(df.as[Long].collect().length == 30)
  }

  test("unsupported predicate stays a residual and still filters correctly") {
    val df = spark.read.format("graft-pages").load().filter(col("price") > 101.0)
    val scan = scanOf(df)
    assert(scan.scan.description().contains("pushed=[]"),
      s"price must not be pushed: ${scan.scan.description()}")
    // 6 pages survive (no pruning), Spark applies the residual
    assert(scan.inputRDD.getNumPartitions == 6)
    val got = df.as[(String, Int, Long, Double)].collect()
    assert(got.nonEmpty && got.forall(_._4 > 101.0))
  }

  test("aggregate pushdown: scan emits one partial row per page, results exact") {
    val df = graft.sources.PagesSource.dsv2AggPushdown(spark, Sf)
    val scan = scanOf(df)
    assert(scan.scan.description().contains("PagesAggScan"),
      s"aggregation was not pushed: ${scan.scan.description()}")
    assert(scan.scan.description().contains("COUNT(*)") &&
      scan.scan.description().contains("SUM(price)"), scan.scan.description())
    // 4 pages survive the day_offset >= 1 filter (2 symbols × days {1,2}),
    // and the scan's output is the per-page partials — 4 rows, not 20
    assert(scan.inputRDD.getNumPartitions == 4)
    assert(scan.inputRDD.count() == 4, "one partial row per page")
    val got = df.as[(String, Long, Double, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    // hand-derived from the stub: 2 days × 5 rows/page per symbol;
    // sum_price = Σ (100 + d + i/2) = 10·100 + 5·(1+2) + 2·(0+.5+1+1.5+2)
    assert(got("BTCUSDT") == ((10L, 1025.0, 58301000L, 58302004L)))
    assert(got("ETHUSDT") == ((10L, 1025.0, 6501000L, 6502004L)))
  }

  test("aggregate pushdown declines distinct and expression aggregates") {
    // count(DISTINCT price) is not mergeable from per-page partials —
    // the builder must refuse, leaving Spark to aggregate the raw scan
    val df = spark.read.format("graft-pages").load()
      .groupBy("symbol").agg(countDistinct(col("price")).as("n"))
    val scan = scanOf(df)
    assert(!scan.scan.description().contains("PagesAggScan"),
      s"distinct agg must not push: ${scan.scan.description()}")
    val got = df.as[(String, Long)].collect().toMap
    assert(got == Map("BTCUSDT" -> 9L, "ETHUSDT" -> 9L))
  }

  test("global aggregate over fully-pruned pages still yields the identity row") {
    val df = spark.read.format("graft-pages").load()
      .filter(col("day_offset") >= 99)
      .agg(count(lit(1)).as("n"), min("trade_id").as("mn"))
    val scan = scanOf(df)
    assert(scan.scan.description().contains("PagesAggScan pages=0"),
      scan.scan.description())
    val row = df.collect().head
    assert(row.getLong(0) == 0L && row.isNullAt(1))
  }

  test("s23 targeted delete rewrites only the subjects' bucket partitions") {
    import graft.ops.bronze.Backfill
    val path = graft.engine.Graft.tmpDir("s23-spec")
    Backfill.targetedDeleteLayout(spark, Sf, path)
    def listing(): Map[String, Seq[(String, Long, Long)]] = {
      val root = new java.io.File(path)
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("user_bucket="))
        .map(d => d.getName ->
          d.listFiles().filter(_.getName.endsWith(".parquet")).toSeq
            .map(f => (f.getName, f.length(), f.lastModified())).sortBy(_._1))
        .toMap
    }
    val before = listing()
    Backfill.targetedDeleteApply(spark, path)
    val after = listing()
    val touched = Backfill.DeleteTargets.map(_ % Backfill.DeleteBuckets).toSet
      .map((b: Long) => s"user_bucket=$b")
    for ((bucket, files) <- before) {
      if (!touched(bucket))
        assert(after.get(bucket).contains(files),
          s"$bucket holds no subject rows and must not be touched")
    }
    // sf0.001 has users 0..14, so bucket 7 = {user 7} only: the delete
    // EMPTIES it, and the partition directory itself must go — the
    // dynamic-overwrite-skips-absent-partitions trap
    assert(!after.contains("user_bucket=7"), "emptied bucket dir must be dropped")
    // bucket 3 = {3, 11}: user 3 survives, so the dir is rewritten in place
    assert(after.contains("user_bucket=3") && after("user_bucket=3") != before("user_bucket=3"),
      "partially-affected bucket must be rewritten")
    val users = spark.read.parquet(path).select("user_id").distinct()
      .as[Long].collect().toSet
    assert(Backfill.DeleteTargets.forall(u => !users.contains(u)), "subjects must be gone")
    assert(users.nonEmpty)
  }

  test("s24 compaction collapses the fragmented layout to one file per day") {
    import graft.ops.bronze.Sinks
    val out = Sinks.compactSmallFiles(spark, Sf)
    assert(out.collect().forall(_.getAs[Long]("n_files") == 1L))
    val (frag, compact) = Sinks.compactScratchDirs(Sf)
    val nFrag = Sinks.parquetFileCount(frag)
    val nCompact = Sinks.parquetFileCount(compact)
    assert(nCompact > 0 && nFrag >= nCompact * 10,
      s"expected ≥10x shrinkage, got $nFrag -> $nCompact")
  }

  test("options control the grid: symbols/days/pagesize") {
    val df = spark.read.format("graft-pages")
      .option("symbols", "SOLUSDT").option("days", "2").option("pageSize", "3")
      .load()
    assert(scanOf(df).inputRDD.getNumPartitions == 2)
    assert(df.count() == 6)
    val ids = df.select("trade_id").as[Long].collect().sorted.toSeq
    val base = "SOLUSDT".hashCode.toLong.abs % 1000 * 100000L
    assert(ids == Seq(base, base + 1, base + 2, base + 1000, base + 1001, base + 1002))
  }
}
