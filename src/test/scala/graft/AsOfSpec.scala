package graft

import graft.ops.gold.Joins
import graft.ops.lake.Snapshots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generic as-of join contracts: latest right row at-or-before each
  * left row per key (left-join semantics), deterministic tie-break,
  * ATOMIC payload fill (a NULL field on the matched row must not leak
  * an older row's value), tolerance, and the loud-guard discipline. */
class AsOfSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val left = Seq(
    (1L, "u1", "2024-01-01 10:00:00"),
    (2L, "u1", "2024-01-01 12:00:00"),
    (3L, "u2", "2024-01-01 09:00:00"), // before any right row: no match
    (4L, "u2", "2024-01-01 11:00:00"), // exactly at a right ts: <= visible
    (5L, "u3", "2024-01-01 10:00:00")  // key with no right rows at all
  ).map { case (id, u, t) => (id, u, ts(t)) }
    .toDF("lid", "user", "lts")

  private val right = Seq(
    (10L, "u1", "2024-01-01 09:30:00", "a"),
    (11L, "u1", "2024-01-01 09:30:00", "b"), // tie: greatest rid wins
    (12L, "u1", "2024-01-01 11:00:00", "c"),
    (20L, "u2", "2024-01-01 11:00:00", "d")
  ).map { case (id, u, t, v) => (u, ts(t), id, v) }
    .toDF("user", "rts", "rid", "rv")

  test("latest at-or-before per key, deterministic ties, left semantics") {
    val out = Joins.asOf(left, right, "user", "lts", "rts", "rid")
      .select($"lid", $"rid", $"rv").as[(Long, Option[Long], Option[String])]
      .collect().map { case (k, v, w) => k -> ((v, w)) }.toMap
    assert(out(1L) == ((Some(11L), Some("b")))) // tie at 09:30 -> max rid
    assert(out(2L) == ((Some(12L), Some("c")))) // latest before noon
    assert(out(3L) == ((None, None)))           // nothing at-or-before
    assert(out(4L) == ((Some(20L), Some("d")))) // same instant visible
    assert(out(5L) == ((None, None)))           // keyless left survives
    // output schema: left.* then the right payload, by declaration
    assert(Joins.asOf(left, right, "user", "lts", "rts", "rid").columns.toSeq
      == Seq("lid", "user", "lts", "rts", "rid", "rv"))
  }

  test("NULL payload on the matched row stays NULL (atomic struct fill)") {
    val r2 = Seq(
      ("u1", ts("2024-01-01 09:00:00"), 1L, Option("old")),
      ("u1", ts("2024-01-01 11:30:00"), 2L, Option.empty[String])
    ).toDF("user", "rts", "rid", "rv")
    val out = Joins.asOf(left.filter($"lid" === 2L), r2,
        "user", "lts", "rts", "rid")
      .select($"rid", $"rv").collect().head
    assert(out.getLong(0) == 2L)
    assert(out.isNullAt(1),
      "a per-column fill would leak 'old' into the matched row's NULL")
  }

  test("tolerance nulls out matches older than the budget") {
    val out = Joins.asOf(left, right, "user", "lts", "rts", "rid",
        toleranceMs = Some(90L * 60 * 1000)) // 90 minutes
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(11L)) // 30 min old: kept
    assert(out(2L).contains(12L)) // 60 min old: kept
    assert(out(4L).contains(20L)) // same instant: kept
    val tight = Joins.asOf(left, right, "user", "lts", "rts", "rid",
        toleranceMs = Some(10L * 60 * 1000)) // 10 minutes
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(tight(1L).isEmpty, "30-min-old match must null out at 10 min")
    assert(tight(4L).contains(20L))
  }

  test("direction=forward: earliest at-or-after, same ties, left semantics") {
    val out = Joins.asOf(left, right, "user", "lts", "rts", "rid",
        direction = "forward")
      .select($"lid", $"rid", $"rv").as[(Long, Option[Long], Option[String])]
      .collect().map { case (k, v, w) => k -> ((v, w)) }.toMap
    assert(out(1L) == ((Some(12L), Some("c")))) // 11:00 is the next click
    assert(out(2L) == ((None, None)))           // nothing at-or-after noon
    assert(out(3L) == ((Some(20L), Some("d")))) // 09:00 -> forward to 11:00
    assert(out(4L) == ((Some(20L), Some("d")))) // same instant visible
    assert(out(5L) == ((None, None)))
    // equal timestamps still break on the greatest tieBreak: a left row
    // before the 09:30 tie pair must pick rid=11
    val early = Seq((0L, "u1", ts("2024-01-01 09:00:00"))).toDF("lid", "user", "lts")
    val e = Joins.asOf(early, right, "user", "lts", "rts", "rid",
        direction = "forward")
      .select($"rid").as[Option[Long]].collect().head
    assert(e.contains(11L), s"forward ties must pick the greatest tieBreak: $e")
  }

  test("direction=nearest: closer side wins, equal distances go backward") {
    def run(tol: Option[Long]) =
      Joins.asOf(left, right, "user", "lts", "rts", "rid",
          toleranceMs = tol, direction = "nearest")
        .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    val out = run(None)
    assert(out(1L).contains(11L)) // 30 min back beats 60 min forward
    assert(out(2L).contains(12L)) // only a backward candidate exists
    assert(out(3L).contains(20L)) // only a forward candidate exists
    assert(out(4L).contains(20L)) // same instant: distance 0
    assert(out(5L).isEmpty)
    // a symmetric fixture: right rows exactly 1h before AND after the
    // left row — equal distances must go BACKWARD (the contract)
    val l2 = Seq((9L, "ux", ts("2024-01-01 10:00:00"))).toDF("lid", "user", "lts")
    val r2 = Seq(
      ("ux", ts("2024-01-01 09:00:00"), 1L, "back"),
      ("ux", ts("2024-01-01 11:00:00"), 2L, "fwd")
    ).toDF("user", "rts", "rid", "rv")
    val tie = Joins.asOf(l2, r2, "user", "lts", "rts", "rid",
        direction = "nearest")
      .select($"rv").as[Option[String]].collect().head
    assert(tie.contains("back"), s"equal distances must go backward: $tie")
    // the tolerance bounds BOTH sides: 90 minutes nulls nothing here,
    // 10 minutes nulls everything except the same-instant match
    val tight = run(Some(10L * 60 * 1000))
    assert(tight(1L).isEmpty && tight(2L).isEmpty && tight(3L).isEmpty)
    assert(tight(4L).contains(20L))
  }

  test("composite match key: per-(key1,key2) fills, no cross-channel leak") {
    // same user, two channels: the ch2 click must never fill a ch1 left
    val l2 = Seq(
      (1L, "u1", "c1", ts("2024-01-01 12:00:00")),
      (2L, "u1", "c2", ts("2024-01-01 12:00:00")),
      (3L, "u2", "c1", ts("2024-01-01 12:00:00")) // no clicks at all
    ).toDF("lid", "user", "chan", "lts")
    val r2 = Seq(
      ("u1", "c1", ts("2024-01-01 10:00:00"), 10L, "one"),
      ("u1", "c2", ts("2024-01-01 11:00:00"), 11L, "two")
    ).toDF("user", "chan", "rts", "rid", "rv")
    val out = Joins.asOfBy(l2, r2, Seq("user", "chan"), "lts", "rts", "rid")
      .select($"lid", $"rid", $"rv").as[(Long, Option[Long], Option[String])]
      .collect().map { case (k, v, w) => k -> ((v, w)) }.toMap
    assert(out(1L) == ((Some(10L), Some("one"))))
    assert(out(2L) == ((Some(11L), Some("two"))))
    assert(out(3L) == ((None, None)))
    // output: left.* then the payload (keys excluded once)
    assert(Joins.asOfBy(l2, r2, Seq("user", "chan"), "lts", "rts", "rid")
      .columns.toSeq == Seq("lid", "user", "chan", "lts", "rts", "rid", "rv"))
    // the TVF spells a composite key as 'k1,k2'
    val lT = tmp("asof-multi-l")
    val rT = tmp("asof-multi-r")
    Snapshots.commit(lT, Snapshots.stage(
      l2.withColumn("day", lit("d")), lT, "day"))
    Snapshots.commit(rT, Snapshots.stage(
      r2.withColumn("rday", lit("d")), rT, "rday"))
    graft.sql.LakeSql.register(spark, "asofspec_ml", lT, "day")
    graft.sql.LakeSql.register(spark, "asofspec_mr", rT, "rday")
    val sqlRows = spark.sql(
      "SELECT lid, rid FROM asof_join('asofspec_ml', 'asofspec_mr', " +
        "'user,chan', 'lts', 'rts', 'rid')")
      .as[(Long, Option[Long])].collect().toMap
    assert(sqlRows == out.map { case (k, (v, _)) => k -> v },
      "the TVF's composite-key form must answer like the API")
    // duplicate keys fail loudly
    val eDup = intercept[IllegalArgumentException] {
      Joins.asOfBy(l2, r2, Seq("user", "user"), "lts", "rts", "rid")
    }
    assert(eDup.getMessage.contains("duplicate match keys"), eDup.getMessage)
  }

  test("unknown directions fail loudly at the door") {
    val e = intercept[IllegalArgumentException] {
      Joins.asOf(left, right, "user", "lts", "rts", "rid",
        direction = "sideways")
    }
    assert(e.getMessage.contains("backward, forward, or nearest"), e.getMessage)
  }

  test("NULL keys and NULL timestamps follow equality-join semantics") {
    // right rows that can never match: NULL key, NULL rightTs — under
    // the naive window shape the NULL-ts row would sort FIRST and
    // become a visible 'earliest' match (r14 advisor find)
    val l2 = Seq(
      (1L, Option("u1"), Option(ts("2024-01-01 12:00:00"))),
      (2L, Option.empty[String], Option(ts("2024-01-01 12:00:00"))), // NULL key
      (3L, Option("u1"), Option.empty[java.sql.Timestamp])           // NULL leftTs
    ).toDF("lid", "user", "lts")
    val r2 = Seq(
      (Option("u1"), Option(ts("2024-01-01 10:00:00")), 10L, "keep"),
      (Option("u1"), Option.empty[java.sql.Timestamp], 11L, "null_ts"),
      (Option.empty[String], Option(ts("2024-01-01 09:00:00")), 12L, "null_key")
    ).toDF("user", "rts", "rid", "rv")
    // EVERY direction owes the same contract — the descending scans
    // need explicit nulls-first or a NULL-ts left row is handed the
    // smallest-rightTs match (r15 review find)
    Seq("backward", "forward", "nearest").foreach { dir =>
      val out = Joins.asOf(l2, r2, "user", "lts", "rts", "rid",
          direction = dir)
        .select($"lid", $"rid", $"rv").as[(Long, Option[Long], Option[String])]
        .collect().map { case (k, v, w) => k -> ((v, w)) }.toMap
      // backward/nearest match the 10:00 click; forward has nothing
      // at-or-after noon — but in NO direction may the NULL-ts right
      // row surface as a match
      val expected1: (Option[Long], Option[String]) =
        if (dir == "forward") (None, None) else (Some(10L), Some("keep"))
      assert(out(1L) == expected1,
        s"$dir: a NULL-rightTs right row must never shadow/fake a match")
      assert(out(2L) == ((None, None)),
        s"$dir: a NULL-key left row matches nothing (equality-join semantics)")
      assert(out(3L) == ((None, None)),
        s"$dir: comparing against a NULL leftTs is unknown — no match")
    }
  }

  test("broadcast as-of answers exactly like the merged-stream door") {
    // one shared resolver, two rewrites: every direction x tolerance
    // on the standard fixture must agree row-for-row (r16)
    for {
      dir <- Seq("backward", "forward", "nearest")
      tol <- Seq(None, Some(10L * 60 * 1000), Some(90L * 60 * 1000))
    } {
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select($"lid", $"rid", $"rv")
        .as[(Long, Option[Long], Option[String])].collect().sortBy(_._1).toSeq
      val stream = rows(Joins.asOf(left, right, "user", "lts", "rts", "rid",
        toleranceMs = tol, direction = dir))
      val bcast = rows(Joins.asOfBroadcast(left, right, Seq("user"),
        "lts", "rts", "rid", toleranceMs = tol, direction = dir))
      assert(bcast == stream, s"dir=$dir tol=$tol: $bcast != $stream")
    }
    // the NULL contract carries too: NULL-key/ts right rows never
    // match, NULL-key/ts left rows surface with a NULL payload
    val l2 = Seq(
      (1L, Option("u1"), Option(ts("2024-01-01 12:00:00"))),
      (2L, Option.empty[String], Option(ts("2024-01-01 12:00:00"))),
      (3L, Option("u1"), Option.empty[java.sql.Timestamp])
    ).toDF("lid", "user", "lts")
    val r2 = Seq(
      (Option("u1"), Option(ts("2024-01-01 10:00:00")), 10L, "keep"),
      (Option("u1"), Option.empty[java.sql.Timestamp], 11L, "null_ts"),
      (Option.empty[String], Option(ts("2024-01-01 09:00:00")), 12L, "null_key")
    ).toDF("user", "rts", "rid", "rv")
    Seq("backward", "forward", "nearest").foreach { dir =>
      val a = Joins.asOf(l2, r2, "user", "lts", "rts", "rid", direction = dir)
        .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
      val b = Joins.asOfBroadcast(l2, r2, Seq("user"), "lts", "rts", "rid",
          direction = dir)
        .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
      assert(a == b, s"dir=$dir NULL contract: $b != $a")
    }
    // composite keys: per-(user, chan) candidate arrays
    val lc = Seq(
      (1L, "u1", "c1", ts("2024-01-01 12:00:00")),
      (2L, "u1", "c2", ts("2024-01-01 12:00:00"))
    ).toDF("lid", "user", "chan", "lts")
    val rc = Seq(
      ("u1", "c1", ts("2024-01-01 11:00:00"), 1L, "one"),
      ("u1", "c2", ts("2024-01-01 11:30:00"), 2L, "two")
    ).toDF("user", "chan", "rts", "rid", "rv")
    val keys = Seq("user", "chan")
    val a = Joins.asOfBy(lc, rc, keys, "lts", "rts", "rid")
      .select($"lid", $"rv").as[(Long, Option[String])].collect().toMap
    val b = Joins.asOfBroadcast(lc, rc, keys, "lts", "rts", "rid")
      .select($"lid", $"rv").as[(Long, Option[String])].collect().toMap
    assert(a == b && b(1L).contains("one") && b(2L).contains("two"))
  }

  test("broadcast as-of: the left side never shuffles (plan receipt)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val out = Joins.asOfBroadcast(left, right, Seq("user"),
      "lts", "rts", "rid", direction = "nearest")
    val plan = out.queryExecution.sparkPlan
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, s"the broadcast rewrite must plan a BHJ:\n$plan")
    // the streamed (left/fact) subtree carries ZERO exchanges — the
    // one shuffle in the whole plan is the right side's dim-scale
    // candidate-array aggregation
    assert(bhj.head.left.collect { case e: ShuffleExchangeLike => e }.isEmpty,
      s"the fact side must keep its incoming partitioning:\n$plan")
    assert(plan.collect { case e: ShuffleExchangeLike => e }.size <= 1,
      s"only the dim-side aggregation may shuffle:\n$plan")
  }

  test("map-typed payloads: broadcast door refuses loudly, election avoids it") {
    import org.apache.spark.sql.functions.{lit => flit, map}
    // MapType cannot sort -> the candidate-array rewrite cannot run;
    // the merged-stream door handles it (payload is never sorted)
    val rMap = right.withColumn("attrs", map(flit("k"), flit("v")))
    val e = intercept[IllegalArgumentException] {
      Joins.asOfBroadcast(left, rMap, Seq("user"), "lts", "rts", "rid")
    }
    assert(e.getMessage.contains("cannot be sorted"), e.getMessage)
    assert(Joins.asOf(left, rMap, "user", "lts", "rts", "rid").count() == 5)
  }

  test("statsAsOf elects broadcast from recorded stats, falls back without") {
    import graft.ops.lake.{Analyze, Mutations}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val lT = tmp("asof-stats-l")
    val rT = tmp("asof-stats-r")
    Snapshots.commit(lT, Snapshots.stage(
      left.withColumn("day", lit("d")), lT, "day"))
    Snapshots.commitAll(rT, Snapshots.withHll(
      Snapshots.stageWithStats(right.withColumn("rday", lit("d")),
        rT, "rday", "user"),
      rT, "user", spark))
    def bhjCount(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan.collect {
        case j: BroadcastHashJoinExec => j }.size
    // stats absent: the merged-stream door answers (no BHJ)
    val noStats = Joins.statsAsOf(spark, lT, rT, "user", "lts", "rts", "rid")
    assert(bhjCount(noStats) == 0,
      "without recorded stats the merged-stream form must answer")
    // sketch-folded stats prove the right side dim-sized: broadcast
    Analyze.analyzeFromSketches(spark, rT, Seq("user"))
    val elected = Joins.statsAsOf(spark, lT, rT, "user", "lts", "rts", "rid")
    assert(bhjCount(elected) == 1,
      "recorded dim-sized rows must elect the broadcast rewrite")
    // same answer through both shapes
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"lid", $"rid", $"rv")
      .as[(Long, Option[Long], Option[String])].collect().sortBy(_._1).toSeq
    assert(rows(elected) == rows(noStats))
    // an over-tight budget refuses the broadcast
    val tight = Joins.statsAsOf(spark, lT, rT, "user", "lts", "rts", "rid",
      broadcastMaxRows = 1L)
    assert(bhjCount(tight) == 0, "rows over budget must fall back")
    // and so does a byte footprint over budget — the row count alone
    // is blind to payload width (r16)
    val fat = Joins.statsAsOf(spark, lT, rT, "user", "lts", "rts", "rid",
      broadcastMaxBytes = 1L)
    assert(bhjCount(fat) == 0, "bytes over budget must fall back")
    // the whole election is metadata-only: zero Spark jobs at plan
    // time (r17, verdict item 2 — the byte budget folds from the
    // manifest's recorded sizes, where it was one stat() per file per
    // election; on object storage a HEAD per file per query)
    val (_, jobs) = countJobs {
      Joins.statsAsOf(spark, lT, rT, "user", "lts", "rts", "rid")
        .queryExecution.sparkPlan
    }
    assert(jobs == 0,
      s"the statsAsOf election must run zero Spark jobs at plan time: $jobs")
    // ...and zero FILESYSTEM io beyond the log: stat()s never launched
    // Spark jobs, so the fence above alone would pass even with the
    // old per-file sweep (review find). Delete the right side's DATA
    // files — the log survives — and the election must still resolve
    // its budgets and elect broadcast from the manifest alone.
    Snapshots.entriesAll(rT).foreach { e =>
      assert(new java.io.File(rT, e.rel).delete(), s"fixture delete ${e.rel}")
    }
    val blind = Joins.statsAsOf(spark, lT, rT, "user", "lts", "rts", "rid")
    assert(bhjCount(blind) == 1,
      "the election must decide from the log alone — a filesystem " +
        "dependence would misread deleted files as empty or throw")
  }

  test("stats_asof_join TVF answers like statsAsOf; loud on non-lake names") {
    import graft.ops.lake.Analyze
    val lT = tmp("asof-stats-sql-l")
    val rT = tmp("asof-stats-sql-r")
    Snapshots.commit(lT, Snapshots.stage(
      left.withColumn("day", lit("d")), lT, "day"))
    Snapshots.commitAll(rT, Snapshots.withHll(
      Snapshots.stageWithStats(right.withColumn("rday", lit("d")),
        rT, "rday", "user"),
      rT, "user", spark))
    Analyze.analyzeFromSketches(spark, rT, Seq("user"))
    graft.sql.LakeSql.register(spark, "asofstats_l", lT, "day")
    graft.sql.LakeSql.register(spark, "asofstats_r", rT, "rday")
    val sqlRows = spark.sql(
      "SELECT lid, rid, rv FROM stats_asof_join(" +
        "'asofstats_l', 'asofstats_r', 'user', 'lts', 'rts', 'rid')")
      .as[(Long, Option[Long], Option[String])].collect().toSet
    val api = Joins.statsAsOf(spark, lT, rT, "user", "lts", "rts", "rid")
      .select($"lid", $"rid", $"rv")
      .as[(Long, Option[Long], Option[String])].collect().toSet
    assert(sqlRows == api, "the TVF must answer like the API path")
    assert(sqlRows.map(_._1) == Set(1L, 2L, 3L, 4L, 5L))
    // a temp view has no stats to elect from: loud, pointing at asof_join
    left.createOrReplaceTempView("asofstats_view")
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM stats_asof_join(" +
        "'asofstats_view', 'asofstats_r', 'user', 'lts', 'rts', 'rid')")
      .collect())
    assert(e.getMessage.contains("registered graft table") &&
      e.getMessage.contains("asof_join"), e.getMessage)
  }

  test("tieBreak equal to the key fails loudly at the door") {
    val e = intercept[IllegalArgumentException] {
      Joins.asOf(left, right, "user", "lts", "rts", "user")
    }
    assert(e.getMessage.contains("tieBreak"), e.getMessage)
    assert(e.getMessage.contains("join key"), e.getMessage)
  }

  test("loud guards: collisions, reserved names, missing columns") {
    val clash = right.withColumnRenamed("rv", "lid")
    val e1 = intercept[IllegalArgumentException] {
      Joins.asOf(left, clash, "user", "lts", "rts", "rid")
    }
    assert(e1.getMessage.contains("collides with a left column"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Joins.asOf(left.withColumn("__ts", lit(1)), right,
        "user", "lts", "rts", "rid")
    }
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Joins.asOf(left, right, "user", "lts", "nope", "rid")
    }
    assert(e3.getMessage.contains("no column 'nope'"), e3.getMessage)
  }

  test("SQL twin answers like the API path; malformed calls fail loudly") {
    val lT = tmp("asof-l")
    val rT = tmp("asof-r")
    Snapshots.commit(lT, Snapshots.stage(
      left.withColumn("day", lit("d")), lT, "day"))
    Snapshots.commit(rT, Snapshots.stage(
      right.withColumn("rday", lit("d")), rT, "rday"))
    graft.sql.LakeSql.register(spark, "asofspec_l", lT, "day")
    graft.sql.LakeSql.register(spark, "asofspec_r", rT, "rday")
    val sqlRows = spark.sql(
      "SELECT lid, rid, rv FROM asof_join(" +
        "'asofspec_l', 'asofspec_r', 'user', 'lts', 'rts', 'rid')")
      .as[(Long, Option[Long], Option[String])].collect().toSet
    val api = Joins.asOf(
        left.withColumn("day", lit("d")),
        right.withColumn("rday", lit("d")), "user", "lts", "rts", "rid")
      .select($"lid", $"rid", $"rv")
      .as[(Long, Option[Long], Option[String])].collect().toSet
    assert(sqlRows == api, "the TVF must answer like the API path")
    // the optional trailing numeric literal = toleranceMs (r15): a
    // 10-minute budget nulls the 30-min-old match (lid=1) but keeps
    // the same-instant one (lid=4)
    val tol = spark.sql(
      "SELECT lid, rid FROM asof_join(" +
        "'asofspec_l', 'asofspec_r', 'user', 'lts', 'rts', 'rid', 600000)")
      .as[(Long, Option[Long])].collect().toMap
    val apiTol = Joins.asOf(
        left.withColumn("day", lit("d")),
        right.withColumn("rday", lit("d")), "user", "lts", "rts", "rid",
        toleranceMs = Some(600000L))
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(tol == apiTol, "the tolerance door must answer like the API path")
    assert(tol(1L).isEmpty, "a 30-min-old match must null at a 10-min budget")
    assert(tol(4L).contains(20L), "a same-instant match survives any budget")
    // the optional 7th string literal = direction (r15)
    val fwd = spark.sql(
      "SELECT lid, rid FROM asof_join(" +
        "'asofspec_l', 'asofspec_r', 'user', 'lts', 'rts', 'rid', 'forward')")
      .as[(Long, Option[Long])].collect().toMap
    assert(fwd(1L).contains(12L) && fwd(2L).isEmpty && fwd(3L).contains(20L),
      s"the TVF's direction door must flip the scan: $fwd")
    // direction AND tolerance compose
    val near = spark.sql(
      "SELECT lid, rid FROM asof_join('asofspec_l', 'asofspec_r', " +
        "'user', 'lts', 'rts', 'rid', 'nearest', 600000)")
      .as[(Long, Option[Long])].collect().toMap
    assert(near(4L).contains(20L) && near(1L).isEmpty, s"$near")
    val eDir = intercept[Exception](spark.sql(
      "SELECT * FROM asof_join('asofspec_l', 'asofspec_r', " +
        "'user', 'lts', 'rts', 'rid', 'sideways')").collect())
    assert(eDir.getMessage.contains("backward, forward, or nearest"),
      eDir.getMessage)
    val e1 = intercept[Exception](spark.sql(
      "SELECT * FROM asof_join('nope', 'asofspec_r', 'user', 'lts', 'rts', 'rid')")
      .collect())
    assert(e1.getMessage.contains("registered graft table"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM asof_join('asofspec_l')").collect())
    assert(e2.getMessage.contains("asof_join expects"), e2.getMessage)
  }

  test("sorted_count_lte: the broadcast probe's binary-search kernel") {
    import graft.functions.SortedBound
    SortedBound.register(spark)
    // codegen path (whole-stage over a projected frame) vs the oracle
    // count, over edges: empty array, below-min, above-max, duplicate
    // runs, exact hits
    val arrs = Seq(
      Seq.empty[Long], Seq(5L), Seq(1L, 3L, 3L, 3L, 7L, 9L),
      (0L until 64L).toSeq)
    val keys = Seq(Long.MinValue + 1, -1L, 0L, 1L, 2L, 3L, 4L, 5L, 7L, 8L, 9L,
      10L, 63L, 64L, Long.MaxValue)
    val rows = for { a <- arrs; k <- keys } yield (a, k)
    val got = rows.toDF("arr", "k")
      .selectExpr("arr", "k", "sorted_count_lte(arr, k) AS n")
      .as[(Seq[Long], Long, Int)].collect()
    got.foreach { case (a, k, n) =>
      assert(n == a.count(_ <= k), s"count_lte($a, $k) = $n")
    }
    // null in, null out
    val nulls = spark.sql(
      "SELECT sorted_count_lte(CAST(NULL AS ARRAY<BIGINT>), 1L) AS a, " +
        "sorted_count_lte(array(1L, 2L), CAST(NULL AS BIGINT)) AS b")
      .collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
    // loud type check
    val e = intercept[Exception](
      spark.sql("SELECT sorted_count_lte(array('x'), 1L)").collect())
    assert(e.getMessage.contains("array<bigint>"), e.getMessage)
  }
}
