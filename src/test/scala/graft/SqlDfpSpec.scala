package graft

import graft.ops.lake.Snapshots
import graft.plans.SqlDfp
import graft.sql.LakeSql

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface dynamic file pruning contracts: a plain `spark.sql`
  * inner/semi equi-join of a registered lake fact to a selective dim
  * OPENS only fact files whose manifest stats admit a dim key (the s50
  * discipline, now with zero graft-specific syntax); the pruned join
  * equals the unpruned join row-for-row; the over-cap path degrades to
  * the key range; outer joins and disabled sessions are untouched. */
class SqlDfpSpec extends AnyFunSuite with SparkFixture {

  // the whole suite runs on an ISOLATED session: its conf windows
  // (cost gate, key cap) must neither leak the rule into concurrently
  // running suites' joins nor be raced by their own global conf
  // windows — suites share one JVM and run in parallel (r14 flake find)
  override lazy val spark: org.apache.spark.sql.SparkSession =
    SparkFixture.session.newSession()

  private def mkFact(sub: String, name: String): String = {
    import spark.implicits._
    val table = tmp(sub)
    // 8 key-clustered files: ids 0..79 in chunks of 10 across 2 days
    val rows = (0L until 80L).map(i => (i, s"d${i / 40}", i.toDouble))
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      rows.toDF("id", "day", "v"), table, "day", "id", buckets = 8))
    LakeSql.register(spark, name, table, "day")
    table
  }

  /** Fact (lake-index) files opened by an EXECUTED frame — the shared
    * [[graft.tools.PlanScans]] descent, narrowed to graft scans so the
    * dim side's own parquet never counts. */
  private def factFilesOpened(df: org.apache.spark.sql.DataFrame): Long =
    graft.tools.PlanScans.scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.isInstanceOf[org.apache.spark.sql.GraftFileIndex])
      .map(_.metrics("numFiles").value).sum

  /** Run `sql`, return (rows as (id, seg) set, fact files opened,
    * optimized plan — the plan rides along so a pruning-count failure
    * shows WHICH link broke: no planted filter vs planted-but-unpruned). */
  private def run(sql: String): (Set[(Long, String)], Long, String) = {
    val df = spark.sql(sql)
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    (rows, factFilesOpened(df), df.queryExecution.optimizedPlan.toString)
  }

  private def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("SQL join to a selective dim opens only key-admitted fact files") {
    import spark.implicits._
    val table = mkFact("sqldfp-base", "sdfp1")
    val total = Snapshots.entriesAll(table).size
    assert(total >= 6, s"fixture needs several files, got $total")
    Seq((5L, "x"), (72L, "y")).toDF("did", "seg")
      .createOrReplaceTempView("sdfp1_dim")
    val q = "SELECT f.id, d.seg FROM sdfp1 f JOIN sdfp1_dim d ON f.id = d.did"
    withConf(SqlDfp.MinFilesKey -> "1") {
      val (rows, opened, plan) = run(q)
      assert(rows == Set((5L, "x"), (72L, "y")))
      assert(opened < total,
        s"the SQL join must not open the whole fact: $opened/$total\n$plan")
      // a CACHED dim must still qualify: the JVM-shared CacheManager
      // substitutes plan-equal frames (even ones persisted by OTHER
      // sessions), so the dim arrives as InMemoryRelation — the shape
      // that intermittently disabled the rule under parallel suites
      // until selective() learned it (r14 flake find)
      val dimDf = Seq((5L, "x"), (72L, "y")).toDF("did", "seg")
      dimDf.persist().count()
      try {
        val (rowsC, openedC, planC) = run(q)
        assert(planC.contains("InMemoryRelation"),
          s"fixture must exercise the cached-dim shape:\n$planC")
        assert(rowsC == rows)
        assert(openedC < total,
          s"a cached dim must still prune: $openedC/$total\n$planC")
      } finally { dimDf.unpersist(); () }
      // parity with the rule disabled: same rows, all files
      withConf(SqlDfp.EnabledKey -> "false") {
        val (plain, openedPlain, _) = run(q)
        assert(plain == rows, "pruning must never change the result")
        assert(openedPlain == total,
          s"disabled rule must scan everything, opened $openedPlain/$total")
      }
    }
  }

  test("LEFT SEMI JOIN prunes; over-cap degrades to key range") {
    import spark.implicits._
    val table = mkFact("sqldfp-semi", "sdfp2")
    val total = Snapshots.entriesAll(table).size
    Seq((5L, "x"), (12L, "y")).toDF("did", "seg")
      .createOrReplaceTempView("sdfp2_dim")
    withConf(SqlDfp.MinFilesKey -> "1") {
      // explicit LEFT SEMI JOIN prunes the fact side. (An IN-subquery
      // does NOT: RewritePredicateSubquery turns it into a semi join
      // only AFTER the pre-CBO batch this rule rides — documented gap,
      // Spark's own runtime bloom filter still covers that shape.)
      val semi = spark.sql(
        "SELECT id FROM sdfp2 LEFT SEMI JOIN sdfp2_dim ON id = did")
      assert(semi.collect().map(_.getLong(0)).toSet == Set(5L, 12L))
      val openedSemi = factFilesOpened(semi)
      assert(openedSemi < total,
        s"semi join must prune fact files: $openedSemi/$total")
      // over the cap: the range [5, 12] still proves high-id files away
      withConf(SqlDfp.MaxKeysKey -> "1") {
        val (rows, opened, plan) = run(
          "SELECT f.id, d.seg FROM sdfp2 f JOIN sdfp2_dim d ON f.id = d.did")
        assert(rows == Set((5L, "x"), (12L, "y")),
          "range degradation must stay correct")
        assert(opened < total,
          s"key-range fallback must still prune: $opened/$total\n$plan")
      }
    }
  }

  test("over-cap bloom conjunct rides the planted range when enabled") {
    import spark.implicits._
    mkFact("sqldfp-bloom", "sdfpb")
    // keys at the extremes: the range [0, 79] keeps every file, so the
    // bloom is the only cut the planted filter can add
    Seq((0L, "a"), (39L, "b"), (79L, "c")).toDF("did", "seg")
      .createOrReplaceTempView("sdfpb_dim")
    def hasBloom(plan: String): Boolean =
      plan.toLowerCase.replace("_", "").contains("mightcontain")
    val q = "SELECT f.id, d.seg FROM sdfpb f JOIN sdfpb_dim d ON f.id = d.did"
    withConf(SqlDfp.MinFilesKey -> "1", SqlDfp.MaxKeysKey -> "1") {
      val (rows0, _, plan0) = run(q)
      assert(!hasBloom(plan0), "bloom off by default")
      assert(rows0 == Set((0L, "a"), (39L, "b"), (79L, "c")))
      withConf(SqlDfp.BloomKeysKey -> "1000") {
        val (rows, _, plan) = run(q)
        assert(hasBloom(plan), s"over-cap + conf must plant the probe\n$plan")
        assert(rows == rows0, "bloom adds false positives only")
      }
      // under the cap the IN list wins; no bloom even when enabled
      withConf(SqlDfp.MaxKeysKey -> "100",
          SqlDfp.BloomKeysKey -> "1000") {
        val (rows, _, plan) = run(q)
        assert(!hasBloom(plan), s"in-list path must not carry a bloom\n$plan")
        assert(rows == rows0)
      }
    }
  }

  test("unsound and non-qualifying shapes are left untouched") {
    import spark.implicits._
    val table = mkFact("sqldfp-outer", "sdfp3")
    val total = Snapshots.entriesAll(table).size
    Seq((5L, "x")).toDF("did", "seg").createOrReplaceTempView("sdfp3_dim")
    withConf(SqlDfp.MinFilesKey -> "1") {
      // LEFT OUTER: unmatched fact rows must survive — never rewritten
      val outer = spark.sql(
        "SELECT f.id, d.seg FROM sdfp3 f LEFT JOIN sdfp3_dim d ON f.id = d.did")
      assert(outer.count() == 80L,
        "an outer join must surface every fact row")
      // an UNFILTERED fact-fact self-join offers no selective dim: the
      // rule must not fire (no selectivity evidence on either side)
      val self = spark.sql(
        "SELECT a.id, b.day FROM sdfp3 a JOIN sdfp3 b ON a.id = b.id")
      assert(!self.queryExecution.optimizedPlan.toString.contains("INSET") &&
        !self.queryExecution.optimizedPlan.toString.contains(" IN ("),
        "no selective dim → no planted key filter")
      assert(self.count() == 80L)
      // empty dim: planted `false` filter, empty result, zero files
      Seq.empty[(Long, String)].toDF("did", "seg")
        .createOrReplaceTempView("sdfp3_empty")
      val (rows, opened, _) = run(
        "SELECT f.id, d.seg FROM sdfp3 f JOIN sdfp3_empty d ON f.id = d.did")
      assert(rows.isEmpty)
      assert(opened == 0L, s"an empty dim must open zero fact files, got $opened")
    }
    // under the default cost gate an 8-file fact never qualifies: the
    // optimized plan carries no planted filter
    val gated = spark.sql(
      "SELECT f.id, d.seg FROM sdfp3 f JOIN sdfp3_dim d ON f.id = d.did")
    assert(!gated.queryExecution.optimizedPlan.toString.contains("INSET") &&
      !gated.queryExecution.optimizedPlan.toString.contains(" IN ("),
      "an under-gate fact must not trigger the collect")
    assert(gated.collect().map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("dim keys prune inside opened files too (row-group filter rides)") {
    import spark.implicits._
    val table = mkFact("sqldfp-rows", "sdfp4")
    Seq((7L, "x"), (8L, "y"), (71L, "z")).toDF("did", "seg")
      .createOrReplaceTempView("sdfp4_dim")
    withConf(SqlDfp.MinFilesKey -> "1") {
      // aggregate over the pruned join — equality against the engine's
      // own unpruned DataFrame computation
      val got = spark.sql(
        """SELECT d.seg, sum(f.v) AS s
          |FROM sdfp4 f JOIN sdfp4_dim d ON f.id = d.did
          |GROUP BY d.seg ORDER BY d.seg""".stripMargin)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(got == Seq(("x", 7.0), ("y", 8.0), ("z", 71.0)))
    }
  }

  test("memo digest covers entry PROPS, not just paths (DV changes miss)") {
    // a deleteWhere keeps every rel and only adds a DV-ref prop; a
    // rel-only digest would let the memo serve pre-delete keys to a
    // post-delete read if DVs were ever applied inside the scan
    // (r15 advisor — make the invariant explicit, not load-bearing)
    import org.apache.spark.sql.GraftFileIndex
    import graft.ops.lake.Snapshots
    val plan = spark.range(1).queryExecution.analyzed
    val bare = Seq(Snapshots.Entry("data/f1.parquet", "a"))
    val dv = Seq(Snapshots.Entry("data/f1.parquet", "a",
      Map("ref.dv" -> "dv/f1.bin")))
    val d1 = SqlDfp.memoDigest(plan, new GraftFileIndex("/t", "day", bare))
    val d2 = SqlDfp.memoDigest(plan, new GraftFileIndex("/t", "day", dv))
    val d3 = SqlDfp.memoDigest(plan, new GraftFileIndex("/t", "day", bare))
    assert(d1.nonEmpty && d2.nonEmpty)
    assert(d1 != d2, "a props-only manifest change must change the digest")
    assert(d1 == d3, "equal content must digest equally")
  }

  test("lake-backed dim: identical re-compiles hit the memo; a commit re-collects") {
    import spark.implicits._
    val table = mkFact("sqldfp-memo", "sdfp7")
    val total = Snapshots.entriesAll(table).size
    val dimT = tmp("sqldfp-memo-dim")
    Snapshots.commitAll(dimT, Snapshots.stageWithStats(
      Seq((5L, "x"), (72L, "y")).toDF("did", "seg").withColumn("day", lit("d")),
      dimT, "day", "did"))
    LakeSql.register(spark, "sdfp7_dim", dimT, "day")
    // the dim filter is the selectivity evidence; it keeps every row
    val q = "SELECT f.id, d.seg FROM sdfp7 f JOIN sdfp7_dim d " +
      "ON f.id = d.did WHERE d.seg >= 'a'"
    withConf(SqlDfp.MinFilesKey -> "1") {
      val c0 = SqlDfp.keyCollects.get
      val (rows1, opened1, plan1) = run(q)
      assert(rows1 == Set((5L, "x"), (72L, "y")))
      assert(opened1 < total, s"$opened1/$total\n$plan1")
      assert(SqlDfp.keyCollects.get > c0, "the first compile pays the collect")
      // a NEW compile of the identical text: the engine-static memo
      // serves the learned keys back — ZERO collect jobs, same prune
      val c1 = SqlDfp.keyCollects.get
      val (rows2, opened2, _) = run(q)
      assert(SqlDfp.keyCollects.get == c1,
        "an identical re-compile must hit the memo, not re-collect")
      assert(rows2 == rows1 && opened2 == opened1,
        "the memoized predicate must prune exactly like the collected one")
      // a dim COMMIT builds a new snapshot (new cached file index):
      // the canonical plans stop matching and the collect re-runs —
      // the memo never serves keys from a superseded snapshot
      Snapshots.commitAll(dimT, Snapshots.restageLike(spark,
        Seq((13L, "z")).toDF("did", "seg").withColumn("day", lit("d")),
        dimT, "day"))
      val c2 = SqlDfp.keyCollects.get
      val (rows3, _, _) = run(q)
      assert(SqlDfp.keyCollects.get > c2, "a dim commit must re-collect")
      assert(rows3 == rows1 + ((13L, "z")),
        "the re-collected keys must see the committed dim row")
    }
  }

  test("recorded dim stats skip the hopeless SQL key collect") {
    import graft.ops.lake.Analyze
    import spark.implicits._
    mkFact("sqldfp-stats-fact", "sdfp6")
    val dimT = tmp("sqldfp-stats-dim")
    val dimRows = (0L until 80L).map(i => (i, i.toDouble, s"g${i % 3}"))
    Snapshots.commitAll(dimT, Snapshots.stageWithStats(
      dimRows.toDF("did", "score", "seg"), dimT, "seg", "did", buckets = 4))
    LakeSql.register(spark, "sdfp6_dim", dimT, "seg")
    val wide = "SELECT f.id, d.seg FROM sdfp6 f JOIN sdfp6_dim d " +
      "ON f.id = d.did WHERE d.score >= 0.0 AND d.score <= 100.0"
    withConf(SqlDfp.MinFilesKey -> "1", SqlDfp.MaxKeysKey -> "20") {
      // no stats: the collect must RUN to discover the cap (pre-stats
      // behavior), then degrade to the range
      val c0 = SqlDfp.keyCollects.get
      val (rows1, _, _) = run(wide)
      assert(rows1.size == 80)
      assert(SqlDfp.keyCollects.get > c0,
        "without stats the key collect runs")
      // recorded NDV x histogram selectivity prove the wide range
      // hopeless (est ~80 > cap 20): the collect is skipped outright
      Analyze.analyze(spark, dimT, Seq("did", "score"))
      Analyze.histogram(spark, dimT, "score", 8)
      val c1 = SqlDfp.keyCollects.get
      val (rows2, _, _) = run(wide)
      assert(rows2 == rows1, "the stats skip must never change rows")
      assert(SqlDfp.keyCollects.get == c1,
        "a hopeless estimate must skip the distinct collect")
      // a narrow range fits the cap (est ~10 <= 20): the collect still
      // runs and buys the exact IN-list prune
      val narrow = "SELECT f.id, d.seg FROM sdfp6 f JOIN sdfp6_dim d " +
        "ON f.id = d.did WHERE d.score >= 0.0 AND d.score <= 9.0"
      val c2 = SqlDfp.keyCollects.get
      val (rows3, _, _) = run(narrow)
      assert(rows3.size == 10)
      assert(SqlDfp.keyCollects.get > c2,
        "a fitting estimate keeps the IN-list collect")
    }
  }
}
