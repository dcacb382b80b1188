package graft

import graft.engine.Tables
import graft.ops.gold.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with SparkFixture {

  test("salted join equals the unsalted join on a skewed key") {
    val t = Tables(spark, Sf)
    // 5 distinct event types over all events: maximal key skew
    val fact = t.events.select("event_id", "event_type", "value")
    val dim = t.events.select(col("event_type")).distinct()
      .withColumn("type_code", xxhash64(col("event_type")))
    val plain = fact.join(dim, Seq("event_type"), "left_outer")
      .select("event_id", "event_type", "type_code")
    val salted = Skew.saltedJoin(fact, dim, "event_type",
      saltSource = col("event_id"), salts = 8)
      .select("event_id", "event_type", "type_code")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // salts = 0 would be SILENT row loss (pmod-by-zero nulls every
    // fact salt, the replicated dim is empty): refused at the door
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, "event_type", col("event_id"), salts = 0)
    }
    assert(e.getMessage.contains("salts must be >= 1"), e.getMessage)
  }

  test("recorded skew stats flip the join strategy with zero scan jobs") {
    import graft.ops.lake.{Analyze, Snapshots}
    import spark.implicits._
    val factT = tmp("skew-fact")
    val dimT = tmp("skew-dim")
    // 90 of 100 fact rows land on key 0; the rest spread over 1..10
    val factRows = (0L until 100L).map(i =>
      (i, if (i < 90) 0L else i % 10 + 1, i.toDouble))
    Snapshots.commitAll(factT, Snapshots.stageWithStats(
      factRows.toDF("id", "sk", "v").withColumn("day", lit("d")),
      factT, "day", "sk"))
    val dimRows = (0L until 50L).map(i => (i, s"g${i % 3}"))
    Snapshots.commitAll(dimT, Snapshots.stageWithStats(
      dimRows.toDF("dim_id", "seg").withColumn("day", lit("d")),
      dimT, "day", "dim_id"))
    // no stats recorded: no basis
    assert(Skew.strategyByStats(factT, "sk", dimT).isEmpty)
    Analyze.analyze(spark, factT, Seq("sk"))
    Analyze.frequentKeys(spark, factT, "sk", k = 4)
    Analyze.analyze(spark, dimT, Seq("dim_id"))
    // the recorded freq table itself: hottest first, exact counts
    assert(Analyze.frequentKeysOf(factT, "sk").get.head == ("0", 90L))
    // decisions from PROPS only — the shared countJobs fence pins zero
    val (_, decisionJobs) = countJobs {
      // dim fits the budget: broadcast wins before skew is even read
      assert(Skew.strategyByStats(factT, "sk", dimT,
        broadcastMaxRows = 100).contains("broadcast"))
      // dim too big: the fact's top-1 (90) >> 4x uniform (100/11) -> salt
      assert(Skew.strategyByStats(factT, "sk", dimT,
        broadcastMaxRows = 10).contains("salt"))
      // high skew factor: the same evidence reads as tolerable -> plain
      assert(Skew.strategyByStats(factT, "sk", dimT,
        broadcastMaxRows = 10, skewFactor = 20.0).contains("plain"))
    }
    assert(decisionJobs == 0,
      s"strategy decisions must run zero scan jobs, saw $decisionJobs")
    // staleness: a commit past a zero-lag budget silences the FACT's
    // skew evidence; the dim's untouched stats stay genuinely fresh
    // (r16 truthful stamps — pre-r16 they read stale only because the
    // stamp lagged its own commit), so the verdict degrades to plain —
    // never salt on stale evidence
    Snapshots.commitAll(factT, Snapshots.restageLike(spark,
      Seq((999L, 999L, 9.0)).toDF("id", "sk", "v").withColumn("day", lit("d")),
      factT, "day"))
    assert(Skew.strategyByStats(factT, "sk", dimT,
      broadcastMaxRows = 10, maxStaleVersions = 0).contains("plain"))
    // a dim commit past the budget silences the basis entirely
    Snapshots.commitProps(dimT, Map("tbl.note" -> "drift"))
    assert(Skew.strategyByStats(factT, "sk", dimT,
      broadcastMaxRows = 10, maxStaleVersions = 0).isEmpty)
    // all three strategies return identical rows
    def rows(bm: Long, sf: Double = 4.0): Set[(Long, Long, String)] =
      Skew.statsSkewJoin(spark, factT, dimT, "sk", "dim_id",
          broadcastMaxRows = bm, skewFactor = sf)
        .select("id", "sk", "seg").as[(Long, Long, String)].collect().toSet
    val broadcastRows = rows(100)
    val saltRows = rows(10)
    val plainRows = rows(10, sf = 20.0)
    assert(broadcastRows == saltRows && saltRows == plainRows)
    assert(broadcastRows.nonEmpty)
    assert(broadcastRows.count(_._2 == 0L) == 90,
      "the hot key's matches must all survive salting")
    // the SQL twin: the stats_skew_join TVF runs the identical chain
    graft.sql.LakeSql.register(spark, "skewspec_f", factT, "day")
    graft.sql.LakeSql.register(spark, "skewspec_d", dimT, "day")
    val sqlRows = spark.sql(
      "SELECT id, sk, seg FROM stats_skew_join(" +
        "'skewspec_f', 'skewspec_d', 'sk', 'dim_id', 10)")
      .as[(Long, Long, String)].collect().toSet
    assert(sqlRows == saltRows, "the TVF must answer like the API path")
    // loud failures: unknown name, malformed arity
    val e1 = intercept[Exception](spark.sql(
      "SELECT * FROM stats_skew_join('nope', 'skewspec_d', 'sk', 'dim_id')")
      .collect())
    assert(e1.getMessage.contains("registered graft table"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM stats_skew_join('skewspec_f')").collect())
    assert(e2.getMessage.contains("stats_skew_join expects"), e2.getMessage)
  }
}
