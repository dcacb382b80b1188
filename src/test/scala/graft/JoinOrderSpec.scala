package graft

import graft.ops.gold.JoinOrder
import graft.ops.gold.JoinOrder.Leg
import graft.ops.lake.{Analyze, Snapshots}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinOrderSpec extends AnyFunSuite with SparkFixture {

  /** Fact with two keys (fk1 over 100 values, fk2 over 10), a
    * 5%-selective dim on fk1 and an all-covering dim on fk2. */
  private def fixture(): (String, String, String) = {
    import spark.implicits._
    val factT = tmp("jo-fact")
    val dimAT = tmp("jo-dima")
    val dimBT = tmp("jo-dimb")
    val factRows = (0L until 200L).map(i => (i, i % 100, i % 10, i.toDouble))
    Snapshots.commitAll(factT, Snapshots.stageWithStats(
      factRows.toDF("id", "fk1", "fk2", "v").withColumn("day", lit("d")),
      factT, "day", "fk1"))
    val dimA = (0L until 5L).map(i => (i, s"band-${i % 2}"))
    Snapshots.commitAll(dimAT, Snapshots.stageWithStats(
      dimA.toDF("dk1", "band").withColumn("day", lit("d")),
      dimAT, "day", "dk1"))
    val dimB = (0L until 10L).map(i => (i, s"seg-${i % 3}"))
    Snapshots.commitAll(dimBT, Snapshots.stageWithStats(
      dimB.toDF("dk2", "seg").withColumn("day", lit("d")),
      dimBT, "day", "dk2"))
    (factT, dimAT, dimBT)
  }

  test("recorded stats order the most-reducing dim first, zero scan jobs") {
    val (factT, dimAT, dimBT) = fixture()
    val legs = Seq(Leg(dimBT, "fk2", "dk2"), Leg(dimAT, "fk1", "dk1"))
    // no stats recorded yet: no basis
    assert(JoinOrder.orderByStats(factT, legs).isEmpty)
    Analyze.analyze(spark, factT, Seq("fk1", "fk2"))
    Analyze.analyze(spark, dimAT, Seq("dk1"))
    Analyze.analyze(spark, dimBT, Seq("dk2"))
    val (planned, decisionJobs) = countJobs {
      JoinOrder.orderByStats(factT, legs, broadcastMaxRows = 6)
    }
    assert(decisionJobs == 0,
      s"ordering decisions must run zero scan jobs, saw $decisionJobs")
    val plans = planned.getOrElse(fail("stats present but no plan"))
    // selective dim (5 of 100 fk1 values, est. 0.05) before the
    // all-covering one (10 of 10 fk2 values, est. 1.0)
    assert(plans.map(_.leg.dimTable) == Seq(dimAT, dimBT))
    assert(plans.head.selectivity < 0.1 && plans.last.selectivity == 1.0)
    // the 5-row dim fits budget 6, the 10-row one does not
    assert(plans.head.broadcast && !plans.last.broadcast)
    // executed fold order follows the plan: the selective dim joins
    // first, so it sits DEEPEST in the analyzed join tree — the
    // innermost Join's right side carries dimA's payload column
    val df = JoinOrder.statsOrderedJoin(spark, factT, legs)
    val joins = df.queryExecution.analyzed.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.length == 2, s"expected 2 joins, saw ${joins.length}")
    val deepest = joins.last // collect is pre-order: outer join first
    assert(deepest.right.output.map(_.name).contains("band"),
      "the 5%-selective dim (payload 'band') must join first")
  }

  test("every order returns identical rows; stale stats fall back loudly-neutral") {
    import spark.implicits._
    val (factT, dimAT, dimBT) = fixture()
    Analyze.analyze(spark, factT, Seq("fk1", "fk2"))
    Analyze.analyze(spark, dimAT, Seq("dk1"))
    Analyze.analyze(spark, dimBT, Seq("dk2"))
    def frame(legs: Seq[Leg], maxStale: Long = 64) =
      JoinOrder.statsOrderedJoin(spark, factT, legs, maxStaleVersions = maxStale)
    def rows(legs: Seq[Leg], maxStale: Long = 64): Set[(Long, String, String)] =
      frame(legs, maxStale)
        .select("id", "band", "seg").as[(Long, String, String)].collect().toSet
    val declaredAB = rows(Seq(Leg(dimAT, "fk1", "dk1"), Leg(dimBT, "fk2", "dk2")))
    val declaredBA = rows(Seq(Leg(dimBT, "fk2", "dk2"), Leg(dimAT, "fk1", "dk1")))
    // maxStale = -1 marks even fresh stats stale: declared-order fallback
    val fallback = rows(Seq(Leg(dimBT, "fk2", "dk2"), Leg(dimAT, "fk1", "dk1")), maxStale = -1)
    assert(declaredAB.nonEmpty)
    assert(declaredAB == declaredBA && declaredBA == fallback)
    // the OUTPUT SCHEMA follows the DECLARATION, not the stats: the
    // same declared legs yield identical column order whether the
    // stats reorder the fold (fresh) or not (stale) — positional
    // consumers must never see an ANALYZE reshuffle their columns
    val legsBA = Seq(Leg(dimBT, "fk2", "dk2"), Leg(dimAT, "fk1", "dk1"))
    assert(frame(legsBA).columns.toSeq == frame(legsBA, maxStale = -1).columns.toSeq)
    assert(frame(legsBA).columns.toSeq ==
      Seq("id", "fk1", "fk2", "v", "day", "seg", "band"))
    // inner-join reduction really happened: only fk1 < 5 rows survive
    assert(declaredAB.forall { case (id, _, _) => id % 100 < 5 })
    // a commit past a zero-lag budget silences the stats
    Snapshots.commitAll(dimAT, Snapshots.restageLike(spark,
      Seq((99L, "band-9")).toDF("dk1", "band").withColumn("day", lit("d")),
      dimAT, "day"))
    assert(JoinOrder.orderByStats(factT,
      Seq(Leg(dimAT, "fk1", "dk1")), maxStaleVersions = 0).isEmpty)
  }

  test("a filtered leg's histogram selectivity drives the order") {
    import graft.ops.gold.JoinOrder.LegFilter
    import spark.implicits._
    val (factT, dimAT, dimBT) = fixture() // A: 5 of 100 fk1; B: all 10 fk2
    // widen A so the unfiltered comparison is not a blowout: a 50-key
    // dimA' (sel 0.5) vs dimB (sel 1.0 unfiltered, ~0.2 filtered)
    val dimWT = tmp("jo-dimw")
    Snapshots.commitAll(dimWT, Snapshots.stageWithStats(
      (0L until 50L).map(i => (i, s"w${i % 2}")).toDF("dk1", "wband")
        .withColumn("day", lit("d")), dimWT, "day", "dk1"))
    Analyze.analyze(spark, factT, Seq("fk1", "fk2"))
    Analyze.analyze(spark, dimWT, Seq("dk1"))
    Analyze.analyze(spark, dimBT, Seq("dk2"))
    Analyze.histogram(spark, dimBT, "dk2", 5)
    val plainLegs = Seq(Leg(dimWT, "fk1", "dk1"), Leg(dimBT, "fk2", "dk2"))
    val filteredLegs = Seq(Leg(dimWT, "fk1", "dk1"),
      Leg(dimBT, "fk2", "dk2", Some(LegFilter("dk2", 0, 1))))
    val ((plainOrder, filteredOrder), jobs) = countJobs {
      (JoinOrder.orderByStats(factT, plainLegs),
        JoinOrder.orderByStats(factT, filteredLegs,
          histBounds = Map(filteredLegs(1) -> ("dk2", 0.0, 1.0))))
    }
    assert(jobs == 0, s"ordering decisions must run zero scan jobs, saw $jobs")
    // unfiltered: B covers every fk2 (sel 1.0) and joins LAST;
    // filtered: the ~20% histogram cut makes B the most-reducing leg
    assert(plainOrder.get.map(_.leg.dimTable) == Seq(dimWT, dimBT))
    assert(filteredOrder.get.map(_.leg.dimTable) == Seq(dimBT, dimWT))
    assert(filteredOrder.get.head.selectivity < 0.5 &&
      filteredOrder.get.head.dimRows <= 3)
    // a filtered leg without supplied bounds fails loudly on the
    // direct orderByStats path (statsOrderedJoin derives them)
    val e = intercept[IllegalArgumentException] {
      JoinOrder.orderByStats(factT, filteredLegs)
    }
    assert(e.getMessage.contains("histogram-space bounds"), e.getMessage)
    // execution applies the cut and matches a hand-derived expectation
    val out = JoinOrder.statsOrderedJoin(spark, factT, filteredLegs)
      .select("id", "wband", "seg").as[(Long, String, String)].collect().toSet
    assert(out.nonEmpty && out.forall { case (id, _, _) =>
      id % 100 < 50 && id % 10 <= 1 })
    // fallback (stale stats) keeps the same rows AND the same schema
    val fb = JoinOrder.statsOrderedJoin(spark, factT, filteredLegs,
      maxStaleVersions = -1)
    assert(fb.select("id", "wband", "seg")
      .as[(Long, String, String)].collect().toSet == out)
  }

  test("recorded fact-key skew salts an over-budget leg, rows unchanged") {
    import spark.implicits._
    val factT = tmp("jo-skew-fact")
    val dimAT = tmp("jo-skew-dima")
    val dimBT = tmp("jo-skew-dimb")
    // 90% of fact rows on fk2 = 0; fk1 stays uniform
    val factRows = (0L until 200L).map(i =>
      (i, i % 100, if (i < 180) 0L else i % 10, i.toDouble))
    Snapshots.commitAll(factT, Snapshots.stageWithStats(
      factRows.toDF("id", "fk1", "fk2", "v").withColumn("day", lit("d")),
      factT, "day", "fk1"))
    Snapshots.commitAll(dimAT, Snapshots.stageWithStats(
      (0L until 5L).map(i => (i, s"band-$i")).toDF("dk1", "band")
        .withColumn("day", lit("d")), dimAT, "day", "dk1"))
    Snapshots.commitAll(dimBT, Snapshots.stageWithStats(
      (0L until 10L).map(i => (i, s"seg-$i")).toDF("dk2", "seg")
        .withColumn("day", lit("d")), dimBT, "day", "dk2"))
    Analyze.analyze(spark, factT, Seq("fk1", "fk2"))
    Analyze.analyze(spark, dimAT, Seq("dk1"))
    Analyze.analyze(spark, dimBT, Seq("dk2"))
    val legs = Seq(Leg(dimAT, "fk1", "dk1"), Leg(dimBT, "fk2", "dk2"))
    // dimB over a budget of 5, but no frequency evidence yet: plain
    val before = JoinOrder.orderByStats(factT, legs, broadcastMaxRows = 5)
    assert(before.get.find(_.leg.dimTable == dimBT).get.strategy == "plain")
    Analyze.frequentKeys(spark, factT, "fk2", k = 4)
    val (after, jobs) = countJobs {
      JoinOrder.orderByStats(factT, legs, broadcastMaxRows = 5)
    }
    assert(jobs == 0, s"strategy decisions must run zero scan jobs, saw $jobs")
    // top-1 (180) >> 4x uniform (200/ndv): the over-budget leg salts;
    // the under-budget one still broadcasts
    assert(after.get.find(_.leg.dimTable == dimBT).get.strategy == "salt")
    assert(after.get.find(_.leg.dimTable == dimAT).get.strategy == "broadcast")
    // salted execution is row-identical to the stats-less plain fold
    def rows(maxStale: Long): Set[(Long, String, String)] =
      JoinOrder.statsOrderedJoin(spark, factT, legs, broadcastMaxRows = 5,
          maxStaleVersions = maxStale)
        .select("id", "band", "seg").as[(Long, String, String)].collect().toSet
    val salted = rows(64)
    assert(salted == rows(-1) && salted.nonEmpty)
    // dimA keeps fk1 < 5 → ids {0..4, 100..104}, all on the hot key:
    // every hot-key match must survive the salted exchange
    assert(salted.size == 10 && salted.forall(_._3 == "seg-0"), salted)
  }

  test("left legs stay pinned, get a stats-elected shape, keep left semantics") {
    import spark.implicits._
    import graft.ops.lake.Mutations
    val (factT, dimAT, dimBT) = fixture()
    Analyze.analyze(spark, factT, Seq("fk1", "fk2"))
    Analyze.analyze(spark, dimAT, Seq("dk1"))
    Analyze.analyze(spark, dimBT, Seq("dk2"))
    val legs = Seq(Leg(dimBT, "fk2", "dk2"),
      Leg(dimAT, "fk1", "dk1", joinType = "left"))
    val (planned, jobs) = countJobs {
      JoinOrder.orderByStats(factT, legs, broadcastMaxRows = 6)
    }
    assert(jobs == 0, s"the decision must run zero scan jobs, saw $jobs")
    val plans = planned.getOrElse(fail("stats present but no plan"))
    // were dimA INNER it would elect FIRST (sel 0.05, the first test);
    // as a LEFT leg it stays pinned at its declared index 1
    assert(plans.map(_.leg.dimTable) == Seq(dimBT, dimAT))
    // a left leg never claims reduction — but still gets the elected
    // SHAPE: 5 recorded rows fit budget 6 (broadcast), dimB's 10 don't
    assert(plans.last.selectivity == 1.0)
    assert(plans.last.strategy == "broadcast")
    assert(plans.head.strategy == "plain")
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Option[String], String)] =
      df.select($"id", $"band", $"seg")
        .as[(Long, Option[String], String)].collect().toSet
    val out = rows(JoinOrder.statsOrderedJoin(spark, factT, legs,
      broadcastMaxRows = 6))
    assert(out.size == 200, "a left leg must keep every fact row")
    assert(out.count(_._2.isEmpty) == 190, "fk1 >= 5 rows carry a NULL band")
    // row-identical to a hand-built plain restatement of the declaration
    val f = Mutations.readMerged(spark, factT)
    val da = Mutations.readMerged(spark, dimAT)
      .withColumnRenamed("dk1", "fk1").select("fk1", "band")
    val db = Mutations.readMerged(spark, dimBT)
      .withColumnRenamed("dk2", "fk2").select("fk2", "seg")
    val plain = rows(f.join(db, Seq("fk2"), "inner")
      .join(da, Seq("fk1"), "left_outer"))
    assert(out == plain, "the elected shapes must never change a row")
    // stale-stats fallback: same rows, same schema
    val fb = JoinOrder.statsOrderedJoin(spark, factT, legs,
      broadcastMaxRows = 6, maxStaleVersions = -1)
    assert(rows(fb) == out)
    assert(fb.columns.toSeq == JoinOrder.statsOrderedJoin(spark, factT, legs,
      broadcastMaxRows = 6).columns.toSeq)
    // the SQL door: a 'left:' dim-name marker spells the same leg
    graft.sql.LakeSql.register(spark, "jospec_lf", factT, "day")
    graft.sql.LakeSql.register(spark, "jospec_lda", dimAT, "day")
    graft.sql.LakeSql.register(spark, "jospec_ldb", dimBT, "day")
    val sqlRows = spark.sql(
      "SELECT id, band, seg FROM stats_star_join('jospec_lf', " +
        "'jospec_ldb', 'fk2', 'dk2', 'left:jospec_lda', 'fk1', 'dk1', 6)")
      .select($"id", $"band", $"seg")
      .as[(Long, Option[String], String)].collect().toSet
    assert(sqlRows == out, "the TVF's left: marker must answer like the API")
  }

  test("a filtered LEFT leg cuts the dim, keeps every fact row") {
    import graft.ops.gold.JoinOrder.LegFilter
    import spark.implicits._
    val (factT, dimAT, dimBT) = fixture()
    Analyze.analyze(spark, factT, Seq("fk1", "fk2"))
    Analyze.analyze(spark, dimAT, Seq("dk1"))
    Analyze.analyze(spark, dimBT, Seq("dk2"))
    Analyze.histogram(spark, dimBT, "dk2", 5)
    // dimB arrives cut to dk2 <= 1 AND joins LEFT: fk2 > 1 rows must
    // SURVIVE with a NULL seg instead of vanishing
    val legs = Seq(Leg(dimAT, "fk1", "dk1"),
      Leg(dimBT, "fk2", "dk2", Some(LegFilter("dk2", 0, 1)), joinType = "left"))
    val out = JoinOrder.statsOrderedJoin(spark, factT, legs)
      .select($"id", $"band", $"seg")
      .as[(Long, String, Option[String])].collect().toSet
    // inner dimA keeps fk1 < 5 (ids {0..4, 100..104}); the left leg
    // never drops any of them
    assert(out.size == 10, s"left leg must keep every inner-surviving row: $out")
    assert(out.forall { case (id, _, seg) =>
      (id % 10 <= 1) == seg.isDefined })
    // identical to the stats-less declared fold
    val fb = JoinOrder.statsOrderedJoin(spark, factT, legs,
        maxStaleVersions = -1)
      .select($"id", $"band", $"seg")
      .as[(Long, String, Option[String])].collect().toSet
    assert(fb == out)
  }

  test("duplicate legs and unsupported join types fail at the door") {
    import spark.implicits._
    val (factT, dimAT, _) = fixture()
    // a KEY-ONLY dim (no payload survives the fact-owned drop): the
    // old payload-collision check let it join twice silently
    val dimKT = tmp("jo-dimk")
    Snapshots.commitAll(dimKT, Snapshots.stageWithStats(
      Seq(0L, 1L).toDF("dk2").withColumn("day", lit("d")),
      dimKT, "day", "dk2"))
    val eDup = intercept[IllegalArgumentException] {
      JoinOrder.statsOrderedJoin(spark, factT,
        Seq(Leg(dimKT, "fk2", "dk2"), Leg(dimKT, "fk2", "dk2")))
    }
    assert(eDup.getMessage.contains("declared 2 times"), eDup.getMessage)
    // role-playing dims (same table, distinct key pair) stay legal
    assert(JoinOrder.statsOrderedJoin(spark, factT,
      Seq(Leg(dimKT, "fk2", "dk2"), Leg(dimKT, "fk1", "dk2"))).count() > 0)
    val eType = intercept[IllegalArgumentException] {
      JoinOrder.statsOrderedJoin(spark, factT,
        Seq(Leg(dimAT, "fk1", "dk1", joinType = "full")))
    }
    assert(eType.getMessage.contains("inner or left"), eType.getMessage)
  }

  test("SQL twin answers like the API path; malformed calls fail loudly") {
    import spark.implicits._
    val (factT, dimAT, dimBT) = fixture()
    Analyze.analyze(spark, factT, Seq("fk1", "fk2"))
    Analyze.analyze(spark, dimAT, Seq("dk1"))
    Analyze.analyze(spark, dimBT, Seq("dk2"))
    val api = JoinOrder.statsOrderedJoin(spark, factT,
        Seq(Leg(dimAT, "fk1", "dk1"), Leg(dimBT, "fk2", "dk2")))
      .select("id", "band", "seg").as[(Long, String, String)].collect().toSet
    graft.sql.LakeSql.register(spark, "jospec_f", factT, "day")
    graft.sql.LakeSql.register(spark, "jospec_da", dimAT, "day")
    graft.sql.LakeSql.register(spark, "jospec_db", dimBT, "day")
    val sqlRows = spark.sql(
      "SELECT id, band, seg FROM stats_star_join(" +
        "'jospec_f', 'jospec_da', 'fk1', 'dk1', 'jospec_db', 'fk2', 'dk2')")
      .as[(Long, String, String)].collect().toSet
    assert(sqlRows == api, "the TVF must answer like the API path")
    // trailing numeric budget accepted
    val sqlBudget = spark.sql(
      "SELECT id, band, seg FROM stats_star_join(" +
        "'jospec_f', 'jospec_da', 'fk1', 'dk1', 'jospec_db', 'fk2', 'dk2', 6)")
      .as[(Long, String, String)].collect().toSet
    assert(sqlBudget == api)
    val e1 = intercept[Exception](spark.sql(
      "SELECT * FROM stats_star_join('nope', 'jospec_da', 'fk1', 'dk1')")
      .collect())
    assert(e1.getMessage.contains("registered graft table"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM stats_star_join('jospec_f', 'jospec_da')").collect())
    assert(e2.getMessage.contains("stats_star_join expects"), e2.getMessage)
  }

  test("ambiguous leg shapes fail at the door, not two operators later") {
    import spark.implicits._
    val (factT, dimAT, _) = fixture()
    // dim payload column the FACT already owns (here another leg's
    // fact key — same class as every lake dim's `day` tag): dropped
    // from the dim, the fact's copy wins, the join stays by-name-sound
    val dimXT = tmp("jo-dimx")
    Snapshots.commitAll(dimXT, Snapshots.stageWithStats(
      Seq((0L, 7L)).toDF("dk2", "fk1").withColumn("day", lit("d")),
      dimXT, "day", "dk2"))
    val dropped = JoinOrder.statsOrderedJoin(spark, factT,
      Seq(Leg(dimAT, "fk1", "dk1"), Leg(dimXT, "fk2", "dk2")))
    assert(dropped.columns.count(_.equalsIgnoreCase("fk1")) == 1,
      dropped.columns.mkString(","))
    assert(dropped.columns.count(_.equalsIgnoreCase("day")) == 1)
    // two dims sharing a payload name: same at-the-door rejection
    val dimYT = tmp("jo-dimy")
    Snapshots.commitAll(dimYT, Snapshots.stageWithStats(
      Seq((0L, "band-9")).toDF("dk2", "band").withColumn("day", lit("d")),
      dimYT, "day", "dk2"))
    val eShared = intercept[IllegalArgumentException] {
      JoinOrder.statsOrderedJoin(spark, factT,
        Seq(Leg(dimAT, "fk1", "dk1"), Leg(dimYT, "fk2", "dk2")))
    }
    assert(eShared.getMessage.contains("appears in both") &&
      eShared.getMessage.contains("band"), eShared.getMessage)
    // missing keys named loudly
    val e2 = intercept[IllegalArgumentException] {
      JoinOrder.statsOrderedJoin(spark, factT, Seq(Leg(dimAT, "nope", "dk1")))
    }
    assert(e2.getMessage.contains("no column 'nope'"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      JoinOrder.statsOrderedJoin(spark, factT, Seq(Leg(dimAT, "fk1", "nope")))
    }
    assert(e3.getMessage.contains("no column 'nope'"), e3.getMessage)
  }
}
