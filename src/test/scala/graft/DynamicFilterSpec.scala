package graft

import graft.ops.lake.{DynamicFilter, Mutations, Snapshots}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic file pruning contracts: the fact side of a selective
  * dim-join opens only files whose manifest stats admit a dim key; the
  * pruned join equals the plain join row-for-row; the over-cap path
  * degrades to range pruning, never to an unbounded driver collect;
  * and unsound shapes (outer joins) are refused. */
class DynamicFilterSpec extends AnyFunSuite with SparkFixture {

  private def fact(rows: (Long, String, Double)*) = {
    import spark.implicits._
    rows.toDF("id", "day", "v")
  }

  // 8 key-clustered files per day-range: ids 0..79 in file chunks of 10
  private def mkFact(sub: String): String = {
    val table = tmp(sub)
    val rows = (0L until 80L).map(i => (i, s"d${i / 40}", i.toDouble))
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      fact(rows: _*), table, "day", "id", buckets = 8))
    table
  }

  private def asSet(d: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    d.select(col("id"), col("seg")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("key prune opens only files whose stats admit a dim key; join equal") {
    val table = mkFact("dfp-base")
    val all = Snapshots.entriesAll(table)
    assert(all.size >= 6, s"fixture needs several files, got ${all.size}")
    import spark.implicits._
    val dim = Seq((5L, "x"), (72L, "y")).toDF("did", "seg")
    val (pred, keys) = DynamicFilter.keyPrune(
      spark, table, "id", dim, "did", maxKeys = 100, factTagCol = None)
    assert(keys.exists(_.toSet == Set(5L, 72L)))
    val kept = all.filter(pred)
    assert(kept.size < all.size, "pruning must drop key-free files")
    // soundness: every file actually holding key 5 or 72 survives
    val holding = Mutations.readMerged(spark, table)
      .filter(col("id").isin(5L, 72L)).count()
    val joined = DynamicFilter.prunedJoin(spark, table, dim, "id", "did",
      minFiles = 0)
    assert(joined.count() == holding)
    assert(asSet(joined) == Set((5L, "x"), (72L, "y")))
    // equality against the plain unpruned join
    val plain = Mutations.readMerged(spark, table)
      .join(dim, col("id") === col("did"), "inner")
    assert(asSet(joined) == asSet(plain))
  }

  test("over the key cap: range fallback stays correct and still prunes") {
    val table = mkFact("dfp-cap")
    import spark.implicits._
    // 3 keys clustered low: the range [3, 7] proves high-id files away
    val dim = Seq((3L, "a"), (5L, "b"), (7L, "c")).toDF("did", "seg")
    val (pred, keys) = DynamicFilter.keyPrune(
      spark, table, "id", dim, "did", maxKeys = 2, factTagCol = None)
    assert(keys.isEmpty, "over the cap must not keep a key list")
    val all = Snapshots.entriesAll(table)
    assert(all.count(pred) < all.size, "range fallback must still prune")
    val joined = DynamicFilter.prunedJoin(
      spark, table, dim, "id", "did", maxKeys = 2, minFiles = 0)
    assert(asSet(joined) == Set((3L, "a"), (5L, "b"), (7L, "c")))
  }

  test("over-cap bloom row filter: probe in the plan, result exact") {
    val table = mkFact("dfp-bloom")
    import spark.implicits._
    // keys spread across the full id range: the range fallback [0, 78]
    // keeps every file, so only the bloom can cut rows before the join
    val dim = Seq(0L, 13L, 26L, 39L, 52L, 65L, 78L)
      .map(i => (i, s"s$i")).toDF("did", "seg")
    def hasBloomProbe(d: org.apache.spark.sql.DataFrame): Boolean =
      d.queryExecution.optimizedPlan.toString
        .toLowerCase.replace("_", "").contains("mightcontain")
    val plain = DynamicFilter.prunedJoin(spark, table, dim, "id", "did",
      maxKeys = 2, minFiles = 0)
    val bloomed = DynamicFilter.prunedJoin(spark, table, dim, "id", "did",
      maxKeys = 2, minFiles = 0, bloomKeys = 1000L)
    assert(hasBloomProbe(bloomed), "over the cap the bloom probe must land")
    assert(asSet(bloomed) == asSet(plain) && asSet(bloomed).size == 7)
    // under the cap the IN list already cuts rows: no bloom
    val underCap = DynamicFilter.prunedJoin(spark, table, dim, "id", "did",
      maxKeys = 100, minFiles = 0, bloomKeys = 1000L)
    assert(!hasBloomProbe(underCap))
    assert(asSet(underCap) == asSet(plain))
    // a minimum-size sketch (heavy false-positive rate) stays exact:
    // bloom errors are one-sided, the join is the verdict
    val tiny = DynamicFilter.prunedJoin(spark, table, dim, "id", "did",
      maxKeys = 2, minFiles = 0, bloomKeys = 1L)
    assert(asSet(tiny) == asSet(plain))
  }

  test("bloom: LONG dim keys beyond Int.MaxValue never overflow an INT fact key") {
    val table = tmp("dfp-bloom-width")
    import spark.implicits._
    val rows = (0 until 80).map(i => (i, s"d${i / 40}", i.toDouble))
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      rows.toDF("id", "day", "v"), table, "day", "id", buckets = 8))
    // a dim key no INT fact row can ever match: under the old
    // narrow-to-fact-type hashing its cast threw CAST_OVERFLOW at
    // sketch-build time under Spark 4's default ANSI mode (r14 advisor
    // find); widened-to-LONG hashing is exact for every integral value
    val dim = Seq(3L, 41L, Int.MaxValue.toLong + 7L)
      .map(i => (i, s"s$i")).toDF("did", "seg")
    def pairs(d: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
      d.select(col("id").cast("long"), col("seg")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = Mutations.readMerged(spark, table)
      .join(dim, col("id") === col("did"), "inner")
    val bloomed = DynamicFilter.prunedJoin(spark, table, dim, "id", "did",
      maxKeys = 2, minFiles = 0, bloomKeys = 1000L)
    assert(pairs(bloomed) == pairs(plain))
    assert(pairs(bloomed) == Set((3L, "s3"), (41L, "s41")))
  }

  test("bloom over-cap join equals the plain join on randomized keys") {
    val table = mkFact("dfp-bloom-fuzz")
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 4).foreach { round =>
      // random key sets straddling the fact's [0, 79] domain (misses
      // included), alternating INT and LONG dim types, tiny caps so
      // every round lands over-cap, sketch sizes from degenerate to
      // roomy — the invariant under all of it: bloom == plain, exactly
      val keys = Seq.fill(rnd.nextInt(12) + 3)(rnd.nextInt(120) - 10).distinct
      val dim =
        if (round % 2 == 0) keys.map(k => (k.toLong, s"s$k")).toDF("did", "seg")
        else keys.map(k => (k, s"s$k")).toDF("did", "seg")
      val bloomKeys = Seq(1L, 7L, 100000L)(round % 3)
      val plain = DynamicFilter.prunedJoin(spark, table, dim, "id", "did",
        maxKeys = 2, minFiles = 0)
      val bloomed = DynamicFilter.prunedJoin(spark, table, dim, "id", "did",
        maxKeys = 2, minFiles = 0, bloomKeys = bloomKeys)
      assert(asSet(bloomed) == asSet(plain),
        s"round $round keys=$keys bloomKeys=$bloomKeys")
      assert(asSet(plain) == keys.filter(k => k >= 0 && k < 80)
        .map(k => (k.toLong, s"s$k")).toSet)
    }
  }

  test("bloom row filter hashes mixed integral keys widened to LONG") {
    val table = mkFact("dfp-bloom-type") // fact id is LONG
    import spark.implicits._
    // INT dim keys: xxhash64 is type-sensitive, so without widening
    // BOTH sides the fact probes with foreign hashes — false
    // negatives, silent row loss
    val dim = Seq(3, 40, 77).map(i => (i, s"s$i")).toDF("did", "seg")
    val bloomed = DynamicFilter.prunedJoin(spark, table, dim, "id", "did",
      maxKeys = 1, minFiles = 0, bloomKeys = 100L)
    assert(asSet(bloomed) == Set((3L, "s3"), (40L, "s40"), (77L, "s77")))
    // hash-INCOMPATIBLE pair (string dim key vs long fact key): the
    // bloom must decline — a cast-based insert could miss values the
    // join's own coercion would match (false negative = row loss)
    val strDim = Seq("3", "40", "77").map(s => (s, s"s$s")).toDF("did", "seg")
    val declined = DynamicFilter.prunedJoin(spark, table, strDim, "id", "did",
      maxKeys = 1, minFiles = 0, bloomKeys = 100L)
    assert(!declined.queryExecution.optimizedPlan.toString
      .toLowerCase.replace("_", "").contains("mightcontain"),
      "string-vs-long keys must skip the bloom")
    assert(asSet(declined) == Set((3L, "s3"), (40L, "s40"), (77L, "s77")))
  }

  test("empty dim yields an empty result with the joined schema") {
    val table = mkFact("dfp-empty")
    import spark.implicits._
    val dim = Seq.empty[(Long, String)].toDF("did", "seg")
    val joined = DynamicFilter.prunedJoin(spark, table, dim, "id", "did",
      minFiles = 0)
    assert(joined.count() == 0)
    assert(joined.columns.toSeq == Seq("id", "day", "v", "did", "seg"))
  }

  test("partition-column join adds tag pruning when declared") {
    val table = mkFact("dfp-tag")
    import spark.implicits._
    val dim = Seq(("d1", "late")).toDF("dday", "seg")
    val (pred, _) = DynamicFilter.keyPrune(
      spark, table, "day", dim, "dday", maxKeys = 100,
      factTagCol = Some("day"))
    val all = Snapshots.entriesAll(table)
    val kept = all.filter(pred)
    assert(kept.nonEmpty && kept.forall(_.tag == "d1"),
      s"tag pruning must keep exactly d1's files, kept tags " +
        s"${kept.map(_.tag).distinct}")
    val joined = DynamicFilter.prunedJoin(spark, table, dim, "day", "dday",
      factTagCol = Some("day"), minFiles = 0)
    assert(joined.count() == 40L)
    // an UNDECLARED tag column must not tag-compare (soundness default)
    val (pred2, _) = DynamicFilter.keyPrune(
      spark, table, "day", dim, "dday", maxKeys = 100, factTagCol = None)
    assert(all.filter(pred2).nonEmpty)
  }

  test("semi join supported; outer joins refused") {
    val table = mkFact("dfp-semi")
    import spark.implicits._
    val dim = Seq((5L, "x")).toDF("did", "seg")
    val semi = DynamicFilter.prunedJoin(
      spark, table, dim, "id", "did", joinType = "left_semi", minFiles = 0)
    assert(semi.collect().map(_.getLong(0)).toSeq == Seq(5L))
    intercept[IllegalArgumentException] {
      DynamicFilter.prunedJoin(spark, table, dim, "id", "did",
        joinType = "left_outer")
    }
  }

  test("cost gate: a small fact skips the prune with zero decision jobs") {
    val table = mkFact("dfp-gate") // 8 files — far under DefaultMinFiles
    import spark.implicits._
    val dim = Seq((5L, "x"), (72L, "y")).toDF("did", "seg")
    assert(DynamicFilter.costGateSkips(table, DynamicFilter.DefaultMinFiles),
      "an 8-file fact must sit under the default gate")
    assert(!DynamicFilter.costGateSkips(table, 0),
      "minFiles = 0 must force the prune path")
    // CONSTRUCTING the gated join must launch no job at all — the whole
    // point of the gate is skipping the dim key-collect; the forced
    // path pays it eagerly (shared countJobs fence).
    // Warm the per-(table, version) schema cache first: the FIRST
    // merged read of a fresh table runs one footer-union inference
    // job — a one-time cost both paths share, not the gate decision
    graft.ops.lake.Mutations.readMerged(spark, table, mergeSchema = true)
      .schema
    val (gated, gatedJobs) = countJobs {
      DynamicFilter.prunedJoin(spark, table, dim, "id", "did")
    }
    assert(gatedJobs == 0,
      s"gated prunedJoin construction must run zero jobs, saw $gatedJobs")
    val (forced, forcedJobs) = countJobs {
      DynamicFilter.prunedJoin(spark, table, dim, "id", "did", minFiles = 0)
    }
    assert(forcedJobs > 0,
      "the forced path pays the key-collect job the gate skipped")
    // the prune's row-filter marker: present only on the forced path
    assert(!gated.queryExecution.optimizedPlan.toString.contains(" IN ("),
      "the gated plan must not carry the pruned isin row filter")
    assert(forced.queryExecution.optimizedPlan.toString.contains(" IN ("),
      "the forced plan carries the pruned isin row filter")
    // same rows either way — the gate trades only the arrival price
    assert(asSet(gated) == asSet(forced))
    assert(asSet(gated) == Set((5L, "x"), (72L, "y")))
  }

  test("equi-height histogram records exact boundaries; selectivity estimates ranges") {
    import graft.ops.lake.Analyze
    import spark.implicits._
    val table = tmp("dfp-hist")
    // uniform 0..9999: every estimate is analytically checkable
    val rows = (0L until 10000L).map(i => (i, s"d${i % 4}", i.toDouble))
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      rows.toDF("id", "day", "v"), table, "day", "id", buckets = 4))
    val bounds = Analyze.histogram(spark, table, "v", 10)
    assert(bounds.size == 10)
    // exact value-at-rank boundaries: rank i*n/10 of 0..9999 is the
    // value (i*1000 - 1)
    assert(bounds == (1 to 10).map(i => i * 1000.0 - 1.0),
      s"got $bounds")
    assert(Analyze.histogramOf(table, "v").contains(bounds),
      "boundaries must round-trip through the recorded prop")
    // range selectivity from the histogram alone (no scan): a quarter
    // of the value space estimates ~0.25
    val sel = Analyze.rangeSelectivity(table, "v", 2500.0, 5000.0).get
    assert(math.abs(sel - 0.25) < 0.05, s"got $sel")
    assert(Analyze.rangeSelectivity(table, "v", -10.0, -5.0).get < 0.02)
    assert(Analyze.rangeSelectivity(table, "nope", 0, 1).isEmpty)
    // r13: the recorded GLOBAL MIN gives the first bucket its true
    // lower edge — a range inside bucket 1 now interpolates instead of
    // collapsing to the old point-bucket 0-or-1/k answer
    assert(Analyze.histogramMinOf(table, "v").contains(0.0))
    val selLow = Analyze.rangeSelectivity(table, "v", 0.0, 499.0).get
    assert(math.abs(selLow - 0.05) < 0.02, s"first-bucket range: $selLow")
    // staleness is PER STATS FAMILY: histogram() stamps its own version
    // key and never touches analyze()'s tbl.stat.v (r12 advisor find)
    val hv = Analyze.histogramVersionOf(table, "v")
    assert(hv.nonEmpty)
    Analyze.analyze(spark, table, Seq("v"))
    assert(Analyze.histogramVersionOf(table, "v") == hv,
      "analyze must not move the histogram's version stamp")
    val av = Analyze.analyzedVersion(table)
    Analyze.histogram(spark, table, "v", 10)
    assert(Analyze.analyzedVersion(table) == av,
      "histogram must not overwrite the NDV stats' version stamp")
    assert(Analyze.histogramVersionOf(table, "v") != hv,
      "a re-histogram moves its own stamp forward")
    // the histogram survives unrelated commits (inherited prop)
    Snapshots.commitAll(table, Snapshots.restageLike(spark,
      fact((99999L, "d9", 9.0)), table, "day"))
    assert(Analyze.histogramOf(table, "v").contains(bounds))
  }

  test("histogram selectivity flips the DFP strategy with zero scan jobs") {
    import graft.ops.lake.Analyze
    import spark.implicits._
    val table = tmp("dfp-cbo")
    // uniform v 0..9999 keyed 1:1 by id: NDV(id) = 10000
    val rows = (0L until 10000L).map(i => (i, s"d${i % 4}", i.toDouble))
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      rows.toDF("id", "day", "v"), table, "day", "id", buckets = 4))
    Analyze.analyze(spark, table, Seq("id", "v"))
    Analyze.histogram(spark, table, "v", 10)
    // table-level NDV alone: 10000 > cap 600 -> "range"
    assert(DynamicFilter.strategyByStats(table, "id", maxKeys = 600)
      .contains("range"))
    // job accounting via the shared job-group-scoped countJobs fence —
    // the fence's sentinel self-check: a real job IS counted
    assert(countJobs { spark.range(1).count() }._2 >= 1,
      "the fence must register a real job")
    val (_, decisionJobs) = countJobs {
      // a narrow v-range: the histogram estimates ~5% survive, scaling
      // NDV to ~500 <= 600 — the IN-list prune becomes worth running
      // even though table-level stats said "range" (the FLIP)
      assert(DynamicFilter.strategyForRange(table, "id", "v",
        0.0, 499.0, maxKeys = 600).contains("inlist"))
      // the full v-range: selectivity ~1, estimate stays over the cap
      assert(DynamicFilter.strategyForRange(table, "id", "v",
        0.0, 99999.0, maxKeys = 600).contains("range"))
    }
    assert(decisionJobs == 0,
      s"strategy decisions must run ZERO scan jobs, saw $decisionJobs")
    // staleness guard: one commit past a zero-lag budget falls back to
    // None; the default budget still answers
    Snapshots.commitAll(table, Snapshots.restageLike(spark,
      fact((99999L, "d9", 9.0)), table, "day"))
    assert(DynamicFilter.strategyForRange(table, "id", "v",
      0.0, 499.0, maxKeys = 600, maxStaleVersions = 0).isEmpty,
      "stats behind the lag budget must not answer")
    assert(DynamicFilter.strategyForRange(table, "id", "v",
      0.0, 499.0, maxKeys = 600).contains("inlist"),
      "within the lag budget stats still answer")
  }

  test("statsAwareJoin: both stats branches return the plain join's rows") {
    import graft.ops.lake.Analyze
    import spark.implicits._
    val factT = mkFact("dfp-saj-fact") // ids 0..79
    val dimT = tmp("dfp-saj-dim")
    val dimRows = (0L until 80L).map(i => (i, i.toDouble, s"g${i % 3}"))
    Snapshots.commitAll(dimT, Snapshots.stageWithStats(
      dimRows.toDF("did", "score", "seg"), dimT, "seg", "did", buckets = 4))
    Analyze.analyze(spark, dimT, Seq("did", "score"))
    Analyze.histogram(spark, dimT, "score", 8)
    // narrow score range: est NDV ~10 <= cap 20 -> "inlist" branch
    assert(DynamicFilter.strategyForRange(dimT, "did", "score",
      0.0, 9.0, maxKeys = 20).contains("inlist"))
    val a = DynamicFilter.statsAwareJoin(spark, factT, dimT,
      "id", "did", "score", 0.0, 9.0, maxKeys = 20, minFiles = 0)
    assert(a.count() == 10, "inlist branch must keep exactly the matches")
    // wide range: est ~80 > cap -> "range" branch skips the key collect
    // outright; the join result is identical either way
    assert(DynamicFilter.strategyForRange(dimT, "did", "score",
      0.0, 100.0, maxKeys = 20).contains("range"))
    val b = DynamicFilter.statsAwareJoin(spark, factT, dimT,
      "id", "did", "score", 0.0, 100.0, maxKeys = 20, minFiles = 0)
    assert(b.count() == 80, "range branch must keep exactly the matches")
    // filterCol resolves case-insensitively to the canonical spelling
    // (review find: fieldIndex threw on 'Score' where every sibling
    // path resolves insensitively) — and an unknown column is loud
    val c = DynamicFilter.statsAwareJoin(spark, factT, dimT,
      "id", "did", "Score", 0.0, 9.0, maxKeys = 20, minFiles = 0)
    assert(c.count() == 10)
    val e = intercept[IllegalArgumentException] {
      DynamicFilter.statsAwareJoin(spark, factT, dimT,
        "id", "did", "nope", 0.0, 9.0, minFiles = 0)
    }
    assert(e.getMessage.contains("no column 'nope'"), e.getMessage)
    // bloomKeys forwards through the "range" verdict: the collect job
    // is still skipped, but the surviving scan carries the bloom probe
    val d = DynamicFilter.statsAwareJoin(spark, factT, dimT,
      "id", "did", "score", 0.0, 100.0, maxKeys = 20, minFiles = 0,
      bloomKeys = 1000L)
    assert(d.queryExecution.optimizedPlan.toString
      .toLowerCase.replace("_", "").contains("mightcontain"))
    assert(d.count() == 80)
  }

  test("sketch histogram refresh: no sort in the plan, estimates within epsilon of exact") {
    import graft.ops.lake.Analyze
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import spark.implicits._
    val table = tmp("dfp-hist-approx")
    val rows = (0L until 10000L).map(i => (i, s"d${i % 4}", i.toDouble))
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      rows.toDF("id", "day", "v"), table, "day", "id", buckets = 4))
    // the production-refresh fence: the sketch aggregation plans with
    // NO SortExec and NO range-partitioned shuffle — the two
    // signatures of the exact path's global sort
    val plan = Analyze.approxBoundsDf(spark, table, "v", 10, 10000)
      .queryExecution.sparkPlan
    assert(plan.collect { case s: SortExec => s }.isEmpty,
      s"sketch refresh must not sort:\n$plan")
    assert(plan.collect {
      case e: ShuffleExchangeLike
        if e.outputPartitioning.isInstanceOf[RangePartitioning] => e
    }.isEmpty, s"sketch refresh must not range-shuffle:\n$plan")
    // estimates: record EXACT, snapshot selectivities, re-record APPROX
    // through the same props — every consumer reads either form
    Analyze.histogram(spark, table, "v", 10)
    val probes = Seq((2500.0, 5000.0), (0.0, 499.0), (9000.0, 9999.0),
      (-10.0, -5.0), (0.0, 9999.0))
    val exactSels = probes.map { case (lo, hi) =>
      Analyze.rangeSelectivity(table, "v", lo, hi).get }
    val approx = Analyze.histogramApprox(spark, table, "v", 10)
    assert(approx.size == 10)
    assert(Analyze.histogramOf(table, "v").contains(approx),
      "approx boundaries must round-trip through the recorded prop")
    assert(Analyze.histogramMinOf(table, "v").exists(m => math.abs(m) < 1e-9),
      "the approx refresh records the global min too")
    assert(Analyze.histogramVersionOf(table, "v").nonEmpty)
    probes.zip(exactSels).foreach { case ((lo, hi), es) =>
      val as = Analyze.rangeSelectivity(table, "v", lo, hi).get
      assert(math.abs(as - es) < 0.02,
        s"selectivity [$lo,$hi]: approx $as vs exact $es")
    }
    // empty/all-null column: no props written, loud size answer
    assert(Analyze.histogramApprox(spark, table, "v", 10, 10000).size == 10)
  }

  test("sketch NDV refresh: no Expand in the plan, estimates serve the same consumers") {
    import graft.ops.lake.Analyze
    import org.apache.spark.sql.execution.ExpandExec
    import spark.implicits._
    val table = tmp("dfp-ndv-approx")
    val rows = (0L until 10000L).map(i => (i, s"d${i % 4}", (i % 500).toDouble))
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      rows.toDF("id", "day", "v"), table, "day", "id", buckets = 4))
    // the plan fence: exact multi-distinct Expands the row stream;
    // the sketch refresh must not
    val exactPlan = Mutations.readMerged(spark, table)
      .agg(count_distinct(col("id")), count_distinct(col("v")))
      .queryExecution.sparkPlan
    assert(exactPlan.collect { case e: ExpandExec => e }.nonEmpty,
      s"fixture sanity: exact multi-distinct plans an Expand:\n$exactPlan")
    val approxPlan = Analyze.approxStatsDf(spark, table,
      Seq("id", "v"), 0.02).queryExecution.sparkPlan
    assert(approxPlan.collect { case e: ExpandExec => e }.isEmpty,
      s"sketch refresh must not Expand:\n$approxPlan")
    // estimates land in the SAME props within HLL++ tolerance and the
    // exact parts (rows, nulls) stay exact
    val (nRows, stats) = Analyze.analyzeApprox(spark, table, Seq("id", "v"))
    assert(nRows == 10000L)
    val byCol = stats.map(s => s._1 -> s).toMap
    assert(math.abs(byCol("id")._2 - 10000L) <= 400,
      s"ndv(id) estimate: ${byCol("id")._2}")
    assert(math.abs(byCol("v")._2 - 500L) <= 25,
      s"ndv(v) estimate: ${byCol("v")._2}")
    assert(stats.forall(_._3 == 0L), "null counts stay exact")
    assert(Analyze.rowsOf(table).contains(10000L))
    assert(Analyze.ndvOf(table, "id").contains(byCol("id")._2),
      "estimates must round-trip through the same props exact stats use")
    // the CBO consumer reads the estimate transparently
    assert(DynamicFilter.strategyByStats(table, "id", maxKeys = 100)
      .contains("range"))
    assert(DynamicFilter.strategyByStats(table, "day", maxKeys = 100)
      .isEmpty, "unanalyzed columns still answer nothing")
  }

  test("statsAwareJoin temporal bounds: typed literals hit the same strategy as hand-converted") {
    import graft.ops.lake.Analyze
    import org.apache.spark.sql.types.{DateType, TimestampType, DoubleType}
    import spark.implicits._
    val factT = mkFact("dfp-date-fact") // ids 0..79
    val dimT = tmp("dfp-date-dim")
    // 80 keys spread over 16 days: id i lands on day 2024-01-(1 + i/5)
    val base = java.time.LocalDate.of(2024, 1, 1)
    val dimRows = (0L until 80L).map { i =>
      (i, java.sql.Date.valueOf(base.plusDays(i / 5)),
        java.sql.Timestamp.valueOf(s"2024-01-${"%02d".format(1 + i / 5)} 12:00:00"),
        s"g${i % 3}")
    }
    Snapshots.commitAll(dimT, Snapshots.stageWithStats(
      dimRows.toDF("did", "d", "ts", "seg"), dimT, "seg", "did", buckets = 4))
    Analyze.analyze(spark, dimT, Seq("did"))
    Analyze.histogram(spark, dimT, "d", 8)
    Analyze.histogram(spark, dimT, "ts", 8)
    // the conversion itself: string / java.sql.Date / LocalDate / raw
    // epoch days all land on the identical histogram-space value
    val d5 = base.plusDays(4)
    val handDays = d5.toEpochDay.toDouble
    for (v <- Seq[Any]("2024-01-05", java.sql.Date.valueOf(d5), d5, handDays))
      assert(DynamicFilter.rangeEndpoint(spark, DateType, v, "d")._2 == handDays,
        s"endpoint for $v")
    // timestamp: Instant / Timestamp / session-TZ string agree on micros
    val inst = java.time.LocalDateTime.of(2024, 1, 5, 12, 0, 0)
      .atZone(java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone))
      .toInstant
    val handMicros = inst.getEpochSecond * 1e6
    for (v <- Seq[Any](inst, java.sql.Timestamp.from(inst),
        "2024-01-05 12:00:00", handMicros))
      assert(DynamicFilter.rangeEndpoint(spark, TimestampType, v, "ts")._2 == handMicros,
        s"endpoint for $v")
    // typed bounds reach the SAME strategy as hand-converted epoch days:
    // 2 of 16 days ~ 12.5% x NDV 80 = ~10 <= cap 20 -> inlist; full
    // range -> over the cap -> range
    val loD = base.toEpochDay.toDouble
    assert(DynamicFilter.strategyForRange(dimT, "did", "d",
      loD, loD + 1, maxKeys = 20).contains("inlist"))
    assert(DynamicFilter.strategyForRange(dimT, "did", "d",
      loD, loD + 15, maxKeys = 20).contains("range"))
    val a = DynamicFilter.statsAwareJoin(spark, factT, dimT,
      "id", "did", "d", "2024-01-01", "2024-01-02", maxKeys = 20, minFiles = 0)
    assert(a.count() == 10, "date-string inlist branch keeps exactly the matches")
    val b = DynamicFilter.statsAwareJoin(spark, factT, dimT,
      "id", "did", "d", "2024-01-01", "2024-01-16", maxKeys = 20, minFiles = 0)
    assert(b.count() == 80, "date-string range branch keeps exactly the matches")
    // timestamp bounds as session-TZ strings: same row sets
    val c1 = DynamicFilter.statsAwareJoin(spark, factT, dimT,
      "id", "did", "ts", "2024-01-01 00:00:00", "2024-01-02 23:59:59",
      maxKeys = 20, minFiles = 0)
    assert(c1.count() == 10)
    // unparsable input fails loudly, never silently estimates
    intercept[IllegalArgumentException] {
      DynamicFilter.rangeEndpoint(spark, DateType, "not-a-date", "d")
    }
    intercept[IllegalArgumentException] {
      DynamicFilter.rangeEndpoint(spark, DoubleType, "1.5", "v")
    }
  }

  test("recorded NDV drives the strategy choice without any scan job") {
    import graft.ops.lake.Analyze
    val dimT = mkFact("dfp-ndv") // 80 distinct ids, 2 distinct days
    // never analyzed: no basis — run-time cap decides (pre-r12 shape)
    assert(DynamicFilter.strategyByStats(dimT, "id", maxKeys = 10).isEmpty)
    Analyze.analyze(spark, dimT, Seq("id", "day"))
    // NDV(id)=80 > cap 10: the key-collect job would only discover the
    // cap — skip straight to the two-scalar range prune
    assert(DynamicFilter.strategyByStats(dimT, "id", maxKeys = 10)
      .contains("range"))
    // NDV(day)=2 <= cap: the IN-list path is bounded and worth running
    assert(DynamicFilter.strategyByStats(dimT, "day", maxKeys = 10)
      .contains("inlist"))
    assert(Analyze.rowsOf(dimT).contains(80L))
    // and the decision input came from PROPS, not a scan: the stats
    // survive unrelated commits (inherited family)
    Snapshots.commitAll(dimT, Snapshots.restageLike(spark,
      fact((999L, "d9", 9.0)), dimT, "day"))
    assert(DynamicFilter.strategyByStats(dimT, "id", maxKeys = 200)
      .contains("inlist"), "stale-but-present stats still answer")
  }
}
