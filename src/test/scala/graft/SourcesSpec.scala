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
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
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
