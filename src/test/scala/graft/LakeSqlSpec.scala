package graft

import graft.ops.lake.Snapshots
import graft.sql.LakeSql
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface contracts: registered lake tables are operable entirely
  * from `spark.sql` — DML statements lower onto the kernel's bounded
  * mutation ops, SELECT resolves the merged (vector-applied) read, and
  * Spark's native VERSION AS OF grammar time-travels. Unregistered
  * names must never be intercepted. */
class LakeSqlSpec extends AnyFunSuite with SparkFixture {

  private def df(rows: (Long, String, Double)*) = {
    import spark.implicits._
    rows.toDF("id", "day", "v")
  }

  private def mk(sub: String, name: String,
                 rows: (Long, String, Double)*): String = {
    val table = tmp(sub)
    Snapshots.commitAll(table,
      Snapshots.stageWithStats(df(rows: _*), table, "day", "id", buckets = 3))
    LakeSql.register(spark, name, table, "day")
    table
  }

  private def content(sql: String): Seq[(Long, String, Double)] =
    spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq

  test("SELECT resolves registered names; DELETE/UPDATE mutate through SQL") {
    mk("sql-dml", "sqlt",
      (1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0), (11L, "b", 11.0))

    assert(content("SELECT id, day, v FROM sqlt") ==
      Seq((1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0), (11L, "b", 11.0)))
    // qualified refs resolve through the SubqueryAlias
    assert(spark.sql("SELECT sqlt.v FROM sqlt WHERE sqlt.id = 10").collect()
      .toSeq == Seq(Row(10.0)))

    val v1 = spark.sql("DELETE FROM sqlt WHERE v >= 10.0 AND day = 'b'")
      .collect().head.getLong(0)
    assert(v1 == 2L, "DELETE returns the committed version")
    // the SQL read must be the MERGED read: vector-deleted rows gone
    assert(content("SELECT id, day, v FROM sqlt") ==
      Seq((1L, "a", 1.0), (2L, "a", 2.0)))

    spark.sql("UPDATE sqlt SET v = v + 100.0 WHERE id = 2")
    assert(content("SELECT id, day, v FROM sqlt") ==
      Seq((1L, "a", 1.0), (2L, "a", 102.0)))

    // time travel via Spark's own grammar, against the pre-delete state
    assert(content("SELECT id, day, v FROM sqlt VERSION AS OF 1") ==
      Seq((1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0), (11L, "b", 11.0)))
    // and inside a subquery/aggregate
    assert(spark.sql(
      "SELECT count(*) AS n FROM (SELECT * FROM sqlt VERSION AS OF 1) x")
      .collect().head.getLong(0) == 4L)
  }

  test("MERGE INTO: all three clause kinds, arbitrary aliases, subquery source") {
    mk("sql-merge", "sqlm",
      (1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0), (11L, "b", 11.0))
    df((2L, "a", 200.0), (10L, "b", 0.5), (30L, "c", 30.0), (31L, "c", -1.0))
      .createOrReplaceTempView("sqlm_src")

    val v = spark.sql(
      """MERGE INTO sqlm AS tgt USING (SELECT * FROM sqlm_src) AS src
        |ON tgt.id = src.id
        |WHEN MATCHED AND src.v < 1.0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = src.v
        |WHEN NOT MATCHED AND src.v > 0.0 THEN INSERT *""".stripMargin)
      .collect().head.getLong(0)
    assert(v == 2L)
    // 2 updated, 10 deleted, 30 inserted, 31 filtered by the insert cond
    assert(content("SELECT id, day, v FROM sqlm") ==
      Seq((1L, "a", 1.0), (2L, "a", 200.0), (11L, "b", 11.0), (30L, "c", 30.0)))
  }

  test("MERGE INTO: UPDATE SET * expands to every non-key column by name") {
    mk("sql-merge-star", "sqlms", (1L, "a", 1.0), (2L, "a", 2.0))
    df((2L, "z", 222.0)).createOrReplaceTempView("sqlms_src")
    spark.sql(
      """MERGE INTO sqlms t USING sqlms_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin).collect()
    assert(content("SELECT id, day, v FROM sqlms") ==
      Seq((1L, "a", 1.0), (2L, "z", 222.0)))
  }

  test("maintenance verbs: DESCRIBE HISTORY, OPTIMIZE, RESTORE, VACUUM") {
    val table = mk("sql-maint", "sqlo",
      (1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
    Snapshots.commit(table,
      Snapshots.stage(df((4L, "d", 4.0)), table, "day")) // v2 append

    val hist = spark.sql("DESCRIBE HISTORY sqlo").collect()
    assert(hist.map(_.getLong(0)).toSeq == Seq(2L, 1L), "newest first")
    assert(hist.last.getLong(1) == 3L, "v1 listed 3 files")

    val v3 = spark.sql("RESTORE sqlo TO VERSION AS OF 1").collect()
      .head.getLong(0)
    assert(v3 == 3L, "rollback commits a NEW version")
    assert(content("SELECT id, day, v FROM sqlo") ==
      Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))

    // every tag is single-file after the restore: OPTIMIZE is a no-op
    // and reports the unchanged current version (no empty commit)
    val v4 = spark.sql("OPTIMIZE sqlo").collect().head.getLong(0)
    assert(v4 == 3L)
    val removed = spark.sql("VACUUM sqlo").collect().head.getLong(0)
    assert(removed >= 1L, "vacuum reclaims the restored-over append's file")
    assert(content("SELECT id, day, v FROM sqlo") ==
      Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))

    val names = spark.sql("SHOW GRAFT TABLES").collect().map(_.getString(0))
    assert(names.contains("sqlo"))
  }

  test("DESCRIBE DRIFT restates the schema history through SQL") {
    import org.apache.spark.sql.functions.lit
    val table = mk("sql-drift", "sqld", (1L, "a", 1.0))
    Snapshots.commit(table, Snapshots.stage(
      df((2L, "b", 2.0)).withColumn("note", lit("x")), table, "day")) // v2
    Snapshots.renameColumn(spark, table, "v", "val")                  // v3
    val all = spark.sql("DESCRIBE DRIFT sqld").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(all.toSet == Set(
      (1L, "add", "id", "BIGINT"), (1L, "add", "day", "STRING"),
      (1L, "add", "v", "DOUBLE"), (2L, "add", "note", "STRING"),
      (3L, "rename", "val", "v")), s"got ${all.toSeq}")
    // scoped: FROM excludes everything at or before it
    val scoped = spark.sql("DESCRIBE DRIFT sqld FROM 2").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(scoped.toSet == Set((3L, "rename", "val")))
    assert(spark.sql("DESCRIBE DRIFT sqld FROM 1 TO 2").collect()
      .map(_.getString(2)).toSeq == Seq("note"))
    // the one-time pre-log recovery verb: fully schema-logged table ->
    // nothing to recover (idempotence and the count surface in SQL)
    assert(spark.sql("ALTER GRAFT TABLE sqld BACKFILL SCHEMA LOG")
      .collect().head.getLong(0) == 0L)
  }

  test("OPTIMIZE ZORDER BY re-clusters through SQL") {
    mk("sql-zorder", "sqlz",
      (1L, "a", 1.0), (9L, "a", 9.0), (2L, "b", 2.0), (8L, "b", 8.0))
    val v = spark.sql("OPTIMIZE sqlz ZORDER BY (id)").collect().head.getLong(0)
    assert(v == 2L)
    assert(content("SELECT id, day, v FROM sqlz") ==
      Seq((1L, "a", 1.0), (2L, "b", 2.0), (8L, "b", 8.0), (9L, "a", 9.0)))
  }

  test("CREATE GRAFT TABLE … AS SELECT and INSERT INTO round-trip") {
    df((1L, "a", 1.0), (2L, "b", 2.0)).createOrReplaceTempView("sqlc_seed")
    val loc = tmp("sql-create")
    val v1 = spark.sql(
      s"""CREATE GRAFT TABLE sqlc LOCATION '$loc' PARTITIONED BY (day)
         |AS SELECT id, day, v FROM sqlc_seed""".stripMargin)
      .collect().head.getLong(0)
    assert(v1 == 1L)
    // created AND registered: plain SELECT resolves immediately
    assert(content("SELECT id, day, v FROM sqlc") ==
      Seq((1L, "a", 1.0), (2L, "b", 2.0)))

    val v2 = spark.sql(
      "INSERT INTO sqlc SELECT id + 10, day, v * 10.0 FROM sqlc_seed")
      .collect().head.getLong(0)
    assert(v2 == 2L)
    assert(content("SELECT id, day, v FROM sqlc") ==
      Seq((1L, "a", 1.0), (2L, "b", 2.0), (11L, "a", 10.0), (12L, "b", 20.0)))
    // append-only: v1's files carried by name
    val v1Files = Snapshots.entriesAt(loc, 1).map(_.rel).toSet
    assert(v1Files.subsetOf(Snapshots.entriesAt(loc, 2).map(_.rel).toSet))

    // a second CREATE at the same location must refuse
    val e = intercept[Exception](spark.sql(
      s"""CREATE GRAFT TABLE sqlc2 LOCATION '$loc' PARTITIONED BY (day)
         |AS SELECT id, day, v FROM sqlc_seed""".stripMargin).collect())
    assert(e.getMessage.contains("already holds"))
  }

  test("table_changes('t', from, to) exposes the change feed in SQL") {
    val table = mk("sql-cdf", "sqlcdf",
      (1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0))
    spark.sql("DELETE FROM sqlcdf WHERE id = 2") // v2: DV delete
    spark.sql("INSERT INTO sqlcdf SELECT 20L, 'c', 20.0") // v3: append

    val feed = spark.sql(
      """SELECT _change_type, _commit_version, id, v
        |FROM table_changes('sqlcdf', 1, 3)
        |ORDER BY _change_type, id""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // r10: rows carry the COMMIT VERSION that produced them (the Delta
    // ordering/resume column) — the delete is v2's, the insert v3's
    assert(feed == Seq(("delete", 2L, 2L, 2.0), ("insert", 3L, 20L, 20.0)))

    // bootstrap read (from 0) yields the v-snapshot as inserts
    assert(spark.sql(
      "SELECT count(*) AS n FROM table_changes('sqlcdf', 0, 1)")
      .collect().head.getLong(0) == 3L)

    // unknown lake name errors loudly with the registration hint
    val e = intercept[Exception](
      spark.sql("SELECT * FROM table_changes('nope', 0, 1)").collect())
    assert(e.getMessage.contains("registered graft table"))
  }

  test("asof_join and gap_fill TVFs accept temp views (r16)") {
    import spark.implicits._
    def ts(x: String) = java.sql.Timestamp.valueOf(x)
    // the left side is ARBITRARY upstream SQL — a temp view, no lake
    // registration anywhere
    Seq((1L, "u1", ts("2024-01-01 12:00:00")))
      .toDF("lid", "user", "lts").createOrReplaceTempView("tvf_l")
    Seq(("u1", ts("2024-01-01 10:00:00"), 10L, "keep"),
        ("u1", ts("2024-01-01 13:00:00"), 11L, "late"))
      .toDF("user", "rts", "rid", "rv").createOrReplaceTempView("tvf_r")
    val out = spark.sql(
      "SELECT lid, rid, rv FROM asof_join(" +
        "'tvf_l', 'tvf_r', 'user', 'lts', 'rts', 'rid')")
      .as[(Long, Option[Long], Option[String])].collect().toSeq
    assert(out == Seq((1L, Some(10L), Some("keep"))))
    // gap_fill over a view: 2 series-hours from one 3-hour-gap series
    Seq((1L, ts("2024-01-01 10:15:00"), "A", 5.0),
        (2L, ts("2024-01-01 12:30:00"), "A", 7.0))
      .toDF("event_id", "ts", "event_type", "value")
      .createOrReplaceTempView("tvf_g")
    val bars = spark.sql(
      "SELECT * FROM gap_fill('tvf_g', 'ts', 'event_type', " +
        "'value', 'event_id')").collect()
    assert(bars.length == 3, s"hours 10-12 incl. the empty 11: ${bars.toSeq}")
    // a name that is neither registered nor a view still fails loudly
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM gap_fill('nope_view', 'ts', 'a', 'b', 'c')").collect())
    assert(e.getMessage.contains("registered graft table") &&
      e.getMessage.contains("temp view"), e.getMessage)
  }

  test("OPTIMIZE INCREMENTAL re-clusters only the measured-eroded tags") {
    import spark.implicits._
    val t = tmp("sql-zinc")
    def rows(tag: String, seed: Int) =
      (1 to 200).map(i => ((seed * 1000 + i).toLong, tag, (i * seed % 200).toLong))
        .toDF("id", "day", "v")
    // day a: one clustered commit; day b: two overlapping waves
    Snapshots.commitAll(t, Snapshots.stageWithStats(
      (1 to 200).map(i => (i.toLong, "a", i.toLong)).toDF("id", "day", "v"),
      t, "day", "v", buckets = 4))
    // THREE overlapping waves: two identical full-range files sit at
    // ratio exactly 2.0 — the default budget's boundary, deliberately
    // not eroded; three cross it
    Snapshots.commitAll(t, Snapshots.restageLike(spark, rows("b", 37), t, "day"))
    Snapshots.commitAll(t, Snapshots.restageLike(spark, rows("b", 53), t, "day"))
    Snapshots.commitAll(t, Snapshots.restageLike(spark, rows("b", 71), t, "day"))
    LakeSql.register(spark, "sqlzinc", t, "day")
    val aRels = Snapshots.entriesAll(t).filter(_.tag == "a").map(_.rel).toSet
    val out = spark.sql("OPTIMIZE sqlzinc ZORDER BY (v) INCREMENTAL")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.map(_._2).toSeq == Seq("b"),
      s"only the fragmented day re-clusters: ${out.toSeq}")
    assert(Snapshots.entriesAll(t).filter(_.tag == "a").map(_.rel).toSet
      == aRels, "the fresh day's files must carry by name")
    // healed: a second run is a no-op row with a NULL tag
    val again = spark.sql("OPTIMIZE sqlzinc ZORDER BY (v) INCREMENTAL")
      .collect()
    assert(again.length == 1 && again.head.isNullAt(1),
      s"a healed table reports nothing eroded: ${again.toSeq}")
    // contradictory/incomplete forms reject loudly
    val e1 = intercept[Exception](spark.sql(
      "OPTIMIZE sqlzinc ZORDER BY (v) INCREMENTAL WHERE day = 'b'"))
    assert(e1.getMessage.contains("measured per tag"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql("OPTIMIZE sqlzinc INCREMENTAL"))
    assert(e2.getMessage.contains("needs ZORDER BY"), e2.getMessage)
  }

  test("VACUUM DRY RUN lists reclaimable files without deleting") {
    val table = mk("sql-vacdry", "sqlvd", (1L, "a", 1.0), (2L, "b", 2.0))
    spark.sql("UPDATE sqlvd SET v = v * 2.0 WHERE id = 1") // v2: COW orphanes v1's a-file
    def parquetCount(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(table)).count(_.getName.endsWith(".parquet"))
    }
    val before = parquetCount()
    val listed = spark.sql("VACUUM sqlvd DRY RUN").collect().map(_.getString(0))
    assert(listed.nonEmpty, "the superseded rewrite source must be listed")
    assert(parquetCount() == before, "DRY RUN must delete nothing")
    // the real vacuum then removes exactly the listed set
    val removed = spark.sql("VACUUM sqlvd").collect().head.getLong(0)
    assert(removed == listed.length)
    assert(parquetCount() == before - listed.length)
  }

  test("RESTORE TO TIMESTAMP AS OF resolves wall-clock like SELECT") {
    val table = mk("sql-restorets", "sqlrt", (1L, "a", 1.0))
    spark.sql("INSERT INTO sqlrt SELECT 2L, 'b', 2.0") // v2
    val log = new java.io.File(table, "_graft_log")
    def pin(v: Int, iso: String): Unit =
      assert(new java.io.File(log, f"snap-$v%09d.txt")
        .setLastModified(java.time.Instant.parse(iso).toEpochMilli))
    pin(1, "2024-06-01T00:00:00Z")
    pin(2, "2024-06-02T00:00:00Z")
    val v = spark.sql(
      "RESTORE sqlrt TO TIMESTAMP AS OF '2024-06-01 12:00:00'")
      .collect().head.getLong(0)
    assert(v == 3L, "restore commits a NEW version")
    assert(spark.sql("SELECT count(*) AS n FROM sqlrt")
      .collect().head.getLong(0) == 1L, "back to the v1 state")
  }

  test("TIMESTAMP AS OF resolves wall-clock to the version live then") {
    val table = mk("sql-tsasof", "sqlta", (1L, "a", 1.0))
    spark.sql("INSERT INTO sqlta SELECT 2L, 'b', 2.0") // v2
    spark.sql("INSERT INTO sqlta SELECT 3L, 'c', 3.0") // v3
    // pin publish times: snapshots are immutable files, mtime = commit
    // time; set three distinct wall-clock instants
    val log = new java.io.File(table, "_graft_log")
    def pin(v: Int, iso: String): Unit = {
      val f = new java.io.File(log, f"snap-$v%09d.txt")
      assert(f.setLastModified(java.time.Instant.parse(iso).toEpochMilli))
    }
    pin(1, "2024-03-01T00:00:00Z")
    pin(2, "2024-03-02T00:00:00Z")
    pin(3, "2024-03-03T00:00:00Z")

    def nAt(ts: String): Long = spark.sql(
      s"SELECT count(*) AS n FROM sqlta TIMESTAMP AS OF '$ts'")
      .collect().head.getLong(0)
    assert(nAt("2024-03-01 12:00:00") == 1L, "between v1 and v2 → v1")
    assert(nAt("2024-03-02 00:00:00") == 2L, "exactly at v2 → v2 (inclusive)")
    assert(nAt("2030-01-01") == 3L, "future → live version")
  }

  test("DESCRIBE DETAIL reports live-table facts") {
    val table = mk("sql-detail", "sqld",
      (1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0))
    // pure-MOR delete (no COW crossover) so a sidecar provably exists
    graft.ops.lake.Mutations.deleteWhere(spark, table,
      org.apache.spark.sql.functions.col("id") === 2)
    graft.ops.lake.Constraints.add(spark, table, "pos", "v > 0.0")

    val d = spark.sql("DESCRIBE DETAIL sqld").collect().head
    assert(d.getAs[String]("path") == table)
    assert(d.getAs[String]("tag_col") == "day")
    assert(d.getAs[Long]("version") == 3L)
    assert(d.getAs[Long]("num_dv_files") == 1L)
    assert(d.getAs[Long]("num_rows") == 2L, "merged (vector-applied) count")
    assert(d.getAs[Long]("size_bytes") > 0L)
    assert(d.getAs[String]("constraints") == "pos: v > 0.0")
  }

  test("ChangeFeed.followOnce: durable cursor, at-least-once, deterministic replay") {
    import graft.ops.lake.ChangeFeed
    val table = mk("sql-follow", "sqlf", (1L, "a", 1.0), (2L, "b", 2.0))
    val cursorFile = tmp("sql-follow-cursor") + "/cursor"
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]

    // bootstrap poll: (0, 1], full snapshot as inserts
    assert(ChangeFeed.followOnce(spark, table, cursorFile) {
      (df, f, t) => seen += ((f, t, df.count()))
    } == 1L)
    assert(seen.toSeq == Seq((0L, 1L, 2L)))
    // idle poll: no range, no callback
    assert(ChangeFeed.followOnce(spark, table, cursorFile) {
      (_, _, _) => fail("must not fire on an idle poll")
    } == 1L)

    spark.sql("DELETE FROM sqlf WHERE id = 1") // v2
    spark.sql("INSERT INTO sqlf SELECT 3L, 'c', 3.0") // v3
    // a CRASHED poll (process throws) must not advance the cursor...
    intercept[RuntimeException](ChangeFeed.followOnce(spark, table, cursorFile) {
      (_, _, _) => throw new RuntimeException("sink died")
    })
    assert(ChangeFeed.cursor(cursorFile) == 1L)
    // ...and the retry replays the SAME range with the same content
    ChangeFeed.followOnce(spark, table, cursorFile) { (df, f, t) =>
      seen += ((f, t, df.count()))
      val types = df.select("_change_type").distinct().collect()
        .map(_.getString(0)).toSet
      assert(types == Set("insert", "delete"))
    }
    assert(seen.toSeq == Seq((0L, 1L, 2L), (1L, 3L, 2L)))
    assert(ChangeFeed.cursor(cursorFile) == 3L)
  }

  test("SQL SELECT keeps scan discipline: filters push down, columns prune") {
    mk("sql-plan", "sqlp",
      (1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0), (11L, "b", 11.0))
    val plan = spark.sql("SELECT v FROM sqlp WHERE id = 10")
      .queryExecution.executedPlan.toString
    // the substituted relation is a plain parquet scan — the outer
    // query's predicate and projection must reach it like any view's
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,10)]"),
      s"predicate did not reach the scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<id:bigint,v:double>"),
      s"projection did not prune the scan:\n$plan")
  }

  test("SQL WHERE prunes manifest entries before any file opens") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val table = mk("sql-prune", "sqlpr",
      (1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0), (11L, "b", 11.0),
      (20L, "c", 20.0), (21L, "c", 21.0))
    val total = Snapshots.entriesAt(table, 1).size
    assert(total >= 3, s"fixture must spread tags across files, got $total")
    def scanned(sql: String): Long = {
      val df = spark.sql(sql)
      df.collect()
      val p = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      p.collect { case s: FileSourceScanExec => s.metrics("numFiles").value }.sum
    }
    val tagB = Snapshots.entriesAt(table, 1).count(_.tag == "b")
    // tag pruning: only day-b files open
    assert(scanned("SELECT * FROM sqlpr WHERE day = 'b'") == tagB)
    // stats pruning on the id ranges (files clustered per day by mk)
    assert(scanned("SELECT * FROM sqlpr WHERE id >= 20") < total)
    assert(scanned("SELECT * FROM sqlpr WHERE id IN (2, 20)") < total)
    // a long IN list optimizes to InSet (threshold 10) — must still prune
    val longIn = (Seq("'a'", "'zz1'") ++ (1 to 10).map(i => s"'x$i'")).mkString(", ")
    assert(scanned(s"SELECT * FROM sqlpr WHERE day IN ($longIn)") ==
      Snapshots.entriesAt(table, 1).count(_.tag == "a"))
    // disjunctions prune when every branch proves: files(a) + files(c)
    val tagA = Snapshots.entriesAt(table, 1).count(_.tag == "a")
    val tagC = Snapshots.entriesAt(table, 1).count(_.tag == "c")
    assert(scanned("SELECT * FROM sqlpr WHERE (day = 'a' AND id < 5) " +
      "OR day = 'c'") == tagA + tagC)
    assert(spark.sql("SELECT sum(v) AS s FROM sqlpr WHERE " +
      "(day = 'a' AND id < 5) OR day = 'c'").collect().head.getDouble(0) == 44.0)
    // a branch with nothing translatable keeps everything — sound
    assert(scanned("SELECT * FROM sqlpr WHERE day = 'a' OR v + 1.0 > 100.0")
      == total)
    // unsupported predicate shapes stay sound: all files, right answer
    assert(scanned("SELECT * FROM sqlpr WHERE v + 1.0 > 100.0") == total)
    assert(spark.sql("SELECT * FROM sqlpr WHERE v + 1.0 > 100.0").count() == 0)
    // correctness parity under pruning
    assert(spark.sql("SELECT sum(v) AS s FROM sqlpr WHERE day = 'b'")
      .collect().head.getDouble(0) == 21.0)
    // a deletion vector flips the table to the merged (anti-join) path:
    // still correct, no resurrection
    graft.ops.lake.Mutations.deleteWhere(spark, table,
      org.apache.spark.sql.functions.col("id") === 10)
    assert(spark.sql("SELECT sum(v) AS s FROM sqlpr WHERE day = 'b'")
      .collect().head.getDouble(0) == 11.0)
  }

  test("SHALLOW CLONE through SQL: pruning, time travel and history carry") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val src = mk("sql-clone-src", "clsrc",
      (1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0), (11L, "b", 11.0),
      (20L, "c", 20.0))
    val dst = tmp("sql-clone-dst")
    assert(spark.sql(
        s"CREATE GRAFT TABLE cldst SHALLOW CLONE clsrc LOCATION '$dst'")
      .collect() sameElements Array(Row(1L)))
    def scanned(sql: String): Long = {
      val df = spark.sql(sql)
      df.collect()
      val p = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      p.collect { case s: FileSourceScanExec => s.metrics("numFiles").value }.sum
    }
    // the carried stats/tag props keep manifest pruning alive on the
    // clone — tag equality opens only day-b files THROUGH the hop
    val total = Snapshots.entriesAt(dst, 1).size
    val tagB = Snapshots.entriesAt(dst, 1).count(_.tag == "b")
    assert(tagB < total)
    assert(scanned("SELECT * FROM cldst WHERE day = 'b'") == tagB)
    // clone mutates independently; its history is its own (v1 = clone)
    spark.sql("DELETE FROM cldst WHERE id = 10")
    assert(content("SELECT id, day, v FROM cldst").map(_._1) ==
      Seq(1L, 2L, 11L, 20L))
    assert(content("SELECT id, day, v FROM clsrc").map(_._1) ==
      Seq(1L, 2L, 10L, 11L, 20L), "source must not see the clone's DELETE")
    // time travel on the clone reaches its own v1 (pre-DELETE)
    assert(content("SELECT id, day, v FROM cldst VERSION AS OF 1").map(_._1) ==
      Seq(1L, 2L, 10L, 11L, 20L))
    // cloning a missing version is loud
    val err = intercept[Exception](spark.sql(
      s"CREATE GRAFT TABLE cldst2 SHALLOW CLONE clsrc VERSION AS OF 9 " +
        s"LOCATION '${tmp("sql-clone-d2")}'"))
    assert(err.getMessage.contains("no committed snapshot"))
  }

  test("ANALYZE TABLE records exact column stats as versioned props") {
    mk("sql-analyze", "sqlaz",
      (1L, "a", 1.0), (2L, "a", 1.0), (3L, "b", 2.0), (4L, "b", 2.0))
    val out = spark.sql(
      "ANALYZE TABLE sqlaz COMPUTE STATISTICS FOR COLUMNS day, v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set(("day", 2L, 0L, 4L), ("v", 2L, 0L, 4L)), s"got $out")
    // stats land as tbl.stat.* props, visible to SQL users and stamped
    // with the analyzed version
    val props = spark.sql("SHOW TBLPROPERTIES sqlaz").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(props("stat.ndv.day") == "2" && props("stat.rows") == "4")
    import graft.ops.lake.Analyze
    // the stamp is the stats commit's OWN version (r16 — a props-only
    // commit republishes identical rows, and stamping the pre-commit
    // version left every stamp lagging by the refresh itself)
    val tablePath = LakeSql.lookup(spark, "sqlaz").get._1
    assert(Analyze.analyzedVersion(tablePath).contains(2L))
    // stats are STALE-visible, not silently refreshed: a later commit
    // carries them (inherited) with the old version stamp
    spark.sql("INSERT INTO sqlaz SELECT 5, 'c', 3.0")
    assert(Analyze.ndvOf(tablePath, "day").contains(2L))
    assert(Analyze.analyzedVersion(tablePath).contains(2L),
      "the version stamp must expose staleness")
    // unknown column rejects loudly
    intercept[Exception](
      spark.sql("ANALYZE TABLE sqlaz COMPUTE STATISTICS FOR COLUMNS nope"))
    // case-variant requests record under the SCHEMA's canonical
    // spelling, so later stat lookups don't silently miss
    spark.sql("ANALYZE TABLE sqlaz COMPUTE STATISTICS FOR COLUMNS DAY")
    assert(Analyze.ndvOf(tablePath, "day").nonEmpty,
      "stats must key on the canonical column spelling")
    // stats describe the MERGED live state (DV deletes excluded)
    spark.sql("DELETE FROM sqlaz WHERE day = 'a'")
    val out2 = spark.sql(
      "ANALYZE TABLE sqlaz COMPUTE STATISTICS FOR COLUMNS day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(out2 == Set(("day", 2L, 3L)), s"got $out2") // b, c survive
    // the histogram verb: exact value-at-rank boundaries as rows
    val hist = spark.sql(
      "ANALYZE TABLE sqlaz COMPUTE HISTOGRAM FOR COLUMN v BUCKETS 3").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(hist.map(_._1) == Seq(1L, 2L, 3L) && hist.map(_._2).last == 3.0,
      s"got $hist")
    assert(Analyze.histogramOf(tablePath, "v").nonEmpty)
    // APPROX STATISTICS routes through the HLL++ refresh — exact on a
    // tiny table, same props/reader (plan fence in DynamicFilterSpec)
    val aout = spark.sql(
      "ANALYZE TABLE sqlaz COMPUTE APPROX STATISTICS FOR COLUMNS day")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(aout == Set(("day", 2L, 3L)), s"got $aout")
    // APPROX HISTOGRAM routes through the sketch refresh — same props,
    // same reader, no global sort (plan fence in DynamicFilterSpec)
    val ahist = spark.sql(
      "ANALYZE TABLE sqlaz COMPUTE APPROX HISTOGRAM FOR COLUMN v BUCKETS 3")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ahist.map(_._1) == Seq(1L, 2L, 3L) && ahist.map(_._2).last == 3.0,
      s"got $ahist")
    assert(Analyze.histogramOf(tablePath, "v").map(_.size).contains(3))
  }

  test("TBLPROPERTIES persist across commits; named refs pin versions in SQL") {
    val table = mk("sql-props-refs", "sqlpf", (1L, "a", 1.0), (2L, "b", 2.0))
    spark.sql("ALTER GRAFT TABLE sqlpf SET TBLPROPERTIES " +
      "('owner'='ml-platform', 'pii'='scrubbed')")
    // a later DATA commit must carry the properties (inherited family)
    spark.sql("INSERT INTO sqlpf SELECT 3, 'c', 3.0")
    def props(): Map[String, String] =
      spark.sql("SHOW TBLPROPERTIES sqlpf").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
    assert(props() == Map("owner" -> "ml-platform", "pii" -> "scrubbed"))
    spark.sql("ALTER GRAFT TABLE sqlpf UNSET TBLPROPERTIES ('pii')")
    assert(props() == Map("owner" -> "ml-platform"))
    // malformed pair lists reject loudly (the strict-list discipline)
    intercept[Exception](spark.sql(
      "ALTER GRAFT TABLE sqlpf SET TBLPROPERTIES ('a'=b)"))

    // refs: pin the current state, mutate past it, read back by NAME
    spark.sql("ALTER GRAFT TABLE sqlpf CREATE REF stable")
    spark.sql("DELETE FROM sqlpf WHERE id = 1")
    assert(content("SELECT id, day, v FROM sqlpf").map(_._1) == Seq(2L, 3L))
    assert(content("SELECT id, day, v FROM sqlpf VERSION AS OF 'stable'")
      .map(_._1) == Seq(1L, 2L, 3L))
    assert(spark.sql("SHOW REFS sqlpf").collect().map(r =>
      (r.getString(0), r.getLong(1))).toSeq == Seq(("stable", 4L)))
    // SHALLOW CLONE and RESTORE accept the ref name wherever a
    // version goes — clone the tagged state, then roll back to it
    val cref = tmp("sql-clone-ref")
    spark.sql("CREATE GRAFT TABLE cpfx SHALLOW CLONE sqlpf " +
      s"VERSION AS OF 'stable' LOCATION '$cref'")
    assert(content("SELECT id, day, v FROM cpfx").map(_._1) == Seq(1L, 2L, 3L))
    spark.sql("RESTORE sqlpf TO VERSION AS OF 'stable'")
    assert(content("SELECT id, day, v FROM sqlpf").map(_._1) == Seq(1L, 2L, 3L))
    // the pinned version's closure survives vacuum
    spark.sql("VACUUM sqlpf")
    assert(content("SELECT id, day, v FROM sqlpf VERSION AS OF 'stable'")
      .map(_._1) == Seq(1L, 2L, 3L))
    // drop: the name stops resolving, loudly
    assert(spark.sql("ALTER GRAFT TABLE sqlpf DROP REF stable")
      .collect().head.getBoolean(0))
    val err = intercept[Exception](
      spark.sql("SELECT * FROM sqlpf VERSION AS OF 'stable'").collect())
    assert(err.getMessage.contains("ref name"))
  }

  test("COPY INTO through SQL: incremental, idempotent") {
    val table = tmp("sql-copy-tbl")
    val src = tmp("sql-copy-src")
    LakeSql.register(spark, "cpyt", table, "day")
    df((1L, "a", 1.0)).write.mode("append").parquet(src)
    val v = spark.sql(s"COPY INTO cpyt FROM '$src'").collect().head.getLong(0)
    assert(v == 1L)
    assert(content("SELECT id, day, v FROM cpyt") == Seq((1L, "a", 1.0)))
    // re-run: nothing new, no commit
    assert(spark.sql(s"COPY INTO cpyt FROM '$src'").collect().head.getLong(0) == 1L)
    df((2L, "b", 2.0)).write.mode("append").parquet(src)
    spark.sql(s"COPY INTO cpyt FROM '$src'")
    assert(content("SELECT id, day, v FROM cpyt") ==
      Seq((1L, "a", 1.0), (2L, "b", 2.0)))
  }

  test("SHOW PARTITIONS: pure manifest fold, DV-aware live rows") {
    mk("sql-shp", "shpt",
      (1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0))
    spark.sql("DELETE FROM shpt WHERE id = 2") // DV: day a drops to 1 live row
    val got = spark.sql("SHOW PARTITIONS shpt").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(x => (x._1, x._3)) == Seq(("a", 1L), ("b", 1L)),
      s"got $got")
    assert(got.forall(_._2 >= 1L))
    // the answer is a manifest fold: it survives the data file being
    // unreadable (same discipline as the DESCRIBE DETAIL spec)
    val (path, _) = graft.sql.LakeSql.lookup(spark, "shpt").get
    val rel = Snapshots.entriesAll(path).head.rel
    val f = new java.io.File(path, rel)
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    try {
      java.nio.file.Files.write(f.toPath, Array[Byte](0, 1, 2))
      assert(spark.sql("SHOW PARTITIONS shpt").count() == 2L)
    } finally java.nio.file.Files.write(f.toPath, bytes)
  }

  test("MERGE WITH SCHEMA EVOLUTION adds source-only columns; plain MERGE does not") {
    import spark.implicits._
    mk("sql-mev", "sqlmev", (1L, "a", 1.0), (2L, "a", 2.0))
    Seq((2L, "a", 20.0, "x"), (3L, "b", 3.0, "y"))
      .toDF("id", "day", "v", "note").createOrReplaceTempView("sqlmev_src")
    // plain MERGE: INSERT * binds by name to the target schema — the
    // wider source merges, `note` silently stays out (the documented
    // exact-schema default)
    spark.sql(
      """MERGE INTO sqlmev t USING sqlmev_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(!spark.sql("SELECT * FROM sqlmev").columns.contains("note"))
    // WITH SCHEMA EVOLUTION: the merge adds the column — matched rows
    // take the source value, pre-existing rows NULL-fill
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO sqlmev t USING sqlmev_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.sql("SELECT id, day, v, note FROM sqlmev").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        if (r.isNullAt(3)) "-" else r.getString(3))).toSet
    assert(got == Set((1L, "a", 1.0, "-"), (2L, "a", 20.0, "x"), (3L, "b", 3.0, "y")))
  }

  test("INSERT OVERWRITE: scoped replaceWhere, carry-by-name, out-of-scope abort") {
    val table = mk("sql-iow", "iowt",
      (1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0), (20L, "c", 20.0))
    val before = Snapshots.entriesAll(table).map(_.rel).toSet
    spark.sql(
      """INSERT OVERWRITE iowt WHERE day = 'a'
        |SELECT id + 100, 'a', v * 2.0 FROM iowt WHERE day = 'a'""".stripMargin)
    assert(content("SELECT id, day, v FROM iowt") ==
      Seq((10L, "b", 10.0), (20L, "c", 20.0), (101L, "a", 2.0), (102L, "a", 4.0)))
    val after = Snapshots.entriesAll(table)
    val carriedTags = after.filter(e => before(e.rel)).map(_.tag).toSet
    assert(carriedTags == Set("b", "c"),
      s"days b and c must carry by name; carried=$carriedTags")
    // replacement rows outside the WHERE scope abort BEFORE any commit
    val v = Snapshots.currentVersion(table)
    intercept[Exception] {
      spark.sql(
        """INSERT OVERWRITE iowt WHERE day = 'b'
          |SELECT id, 'z', v FROM iowt WHERE day = 'b'""".stripMargin)
    }
    assert(Snapshots.currentVersion(table) == v, "nothing committed on abort")
    assert(content("SELECT id, day, v FROM iowt WHERE day = 'b'") ==
      Seq((10L, "b", 10.0)))
    // whole-table overwrite replaces everything atomically
    spark.sql("INSERT OVERWRITE iowt SELECT 7, 'z', 7.0")
    assert(content("SELECT id, day, v FROM iowt") == Seq((7L, "z", 7.0)))
    // whole-table overwrite to empty is refused (zero-file snapshot)
    intercept[Exception] {
      spark.sql("INSERT OVERWRITE iowt SELECT id, day, v FROM iowt WHERE 1 = 0")
    }
    // non-partition WHERE column is a loud error, not a silent row filter
    intercept[Exception] {
      spark.sql("INSERT OVERWRITE iowt WHERE v = '7.0' SELECT 8, 'z', 8.0")
    }
    // SCOPED overwrite on a CONVERTed table refuses: synthetic-tagged
    // files can hold in-scope rows but never match the WHERE tag — a
    // silent pass would leave duplicates beside the replacement
    val loc = tmp("sql-iow-conv")
    df((1L, "a", 1.0), (2L, "b", 2.0)).write.mode("append").parquet(loc)
    spark.sql(s"CONVERT TO GRAFT TABLE iowconv LOCATION '$loc' PARTITIONED BY (day)")
    intercept[Exception] {
      spark.sql("INSERT OVERWRITE iowconv WHERE day = 'a' SELECT 9, 'a', 9.0")
    }
    // whole-table overwrite stays sound on converted layouts
    spark.sql("INSERT OVERWRITE iowconv SELECT 9, 'a', 9.0")
    assert(content("SELECT id, day, v FROM iowconv") == Seq((9L, "a", 9.0)))
  }

  test("APPLY CHANGES INTO: SCD1 and SCD2 CDC catch-up through SQL") {
    mk("sql-ca-src", "casrc", (1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0))
    val t1 = tmp("sql-ca-t1"); LakeSql.register(spark, "cat1", t1, "day")
    val t2 = tmp("sql-ca-t2"); LakeSql.register(spark, "cat2", t2, "day")
    val r = spark.sql("APPLY CHANGES INTO cat1 FROM casrc KEYS (id)").collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L,
      "bootstrap: target v1 applied source v1")
    spark.sql("APPLY CHANGES INTO cat2 FROM casrc KEYS (id) SCD TYPE 2").collect()
    spark.sql("UPDATE casrc SET v = 5.0 WHERE id = 1")  // v2
    spark.sql("DELETE FROM casrc WHERE id = 10")        // v3
    val r2 = spark.sql("APPLY CHANGES INTO cat1 FROM casrc KEYS (id)").collect().head
    assert(r2.getLong(1) == 3L, "catch-up applied source v3")
    assert(content("SELECT id, day, v FROM cat1") ==
      Seq((1L, "a", 5.0), (2L, "a", 2.0)))
    spark.sql("APPLY CHANGES INTO cat2 FROM casrc KEYS (id) SCD TYPE 2").collect()
    assert(content("SELECT id, day, v FROM cat2 WHERE __is_current") ==
      Seq((1L, "a", 5.0), (2L, "a", 2.0)))
    val segs = spark.sql(
      """SELECT id, __start_version, __end_version FROM cat2
        |ORDER BY id, __start_version""".stripMargin).collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSeq
    assert(segs == Seq((1L, 1L, 2L), (1L, 2L, -1L), (2L, 1L, -1L), (10L, 1L, 3L)))
    // malformed statements reject loudly, never silently narrow
    intercept[Exception](
      spark.sql("APPLY CHANGES INTO cat1 FROM casrc KEYS (id day)"))
    intercept[Exception](
      spark.sql("APPLY CHANGES INTO cat1 FROM casrc KEYS (id) SCD TYPE 3"))
  }

  test("CONVERT TO GRAFT TABLE adopts an existing parquet dir in place") {
    // a plain pre-existing parquet directory, written by anything
    val loc = tmp("sql-convert")
    df((1L, "a", 1.0), (2L, "a", 2.0)).write.mode("append").parquet(loc)
    df((10L, "b", 10.0), (11L, "b", 11.0)).write.mode("append").parquet(loc)
    val before = new java.io.File(loc).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.length).toMap

    val v = spark.sql(
      s"""CONVERT TO GRAFT TABLE sqlconv LOCATION '$loc'
         |PARTITIONED BY (day) STATS BY (id)""".stripMargin)
      .collect().head.getLong(0)
    assert(v == 1L)
    // no data copied: the same file names/sizes now live under data/
    // (hard-link+unlink move), and the root holds no parquet anymore —
    // a naive directory reader fails LOUDLY instead of double-counting
    val moved = Snapshots.entriesAt(loc, 1)
      .map(e => new java.io.File(loc, e.rel))
      .map(f => f.getName -> f.length).toMap
    assert(moved == before)
    assert(!new java.io.File(loc).listFiles().exists(_.getName.endsWith(".parquet")))
    assert(content("SELECT id, day, v FROM sqlconv") ==
      Seq((1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0), (11L, "b", 11.0)))
    // footer stats landed: an id range opens fewer files than the total
    assert(Snapshots.entriesAt(loc, 1).forall(_.props.contains("min.id")))
    // r10 advisor find: adopted files' tags are SYNTHETIC (file ids),
    // so equality on the registered tag column must KEEP them — before
    // the marker, this pruned every file and silently returned empty
    assert(Snapshots.entriesAt(loc, 1).forall(
      _.props.contains(Snapshots.TagSyntheticProp)))
    assert(content("SELECT id, day, v FROM sqlconv WHERE day = 'b'") ==
      Seq((10L, "b", 10.0), (11L, "b", 11.0)))

    // the converted table is immediately a full lake table: mutate it
    spark.sql("DELETE FROM sqlconv WHERE id = 2")
    assert(content("SELECT id, day, v FROM sqlconv") ==
      Seq((1L, "a", 1.0), (10L, "b", 10.0), (11L, "b", 11.0)))
    // and v1 time travel still shows the adopted state
    assert(spark.sql("SELECT count(*) AS n FROM sqlconv VERSION AS OF 1")
      .collect().head.getLong(0) == 4L)

    // OPTIMIZE rewrites synthetic-tagged files through stage(): real
    // tags from the data, marker dropped — the CONVERTed layout becomes
    // a genuinely tag-pruned one. The earlier DELETE's vector
    // materializes in the same pass (r10 DV-aware compact — no manual
    // purge step)
    spark.sql("OPTIMIZE sqlconv").collect()
    assert(!Snapshots.entriesAll(loc).exists(_.props.contains("ref.dv")),
      "OPTIMIZE must materialize deletion vectors")
    val retagged = Snapshots.entriesAll(loc)
    assert(retagged.nonEmpty &&
      retagged.forall(e => !e.props.contains(Snapshots.TagSyntheticProp)))
    assert(retagged.map(_.tag).toSet == Set("a", "b"))
    assert(content("SELECT id, day, v FROM sqlconv WHERE day = 'b'") ==
      Seq((10L, "b", 10.0), (11L, "b", 11.0)))

    // double-convert refuses; hive layouts refuse with the re-ingest hint
    val e = intercept[Exception](spark.sql(
      s"CONVERT TO GRAFT TABLE sqlconv2 LOCATION '$loc' PARTITIONED BY (day)")
      .collect())
    assert(e.getMessage.contains("already holds a table"))
    val hiveLoc = tmp("sql-convert-hive") + "/t"
    df((1L, "a", 1.0)).write.partitionBy("day").parquet(hiveLoc)
    val e2 = intercept[Exception](spark.sql(
      s"CONVERT TO GRAFT TABLE sqlconv3 LOCATION '$hiveLoc' PARTITIONED BY (day)")
      .collect())
    assert(e2.getMessage.contains("hive-partitioned"))
  }

  test("unregistered names are never intercepted; errors are loud") {
    // plain temp view DML goes to Spark and fails with SPARK's error
    df((1L, "a", 1.0)).createOrReplaceTempView("not_lake")
    val e = intercept[Exception](spark.sql("DELETE FROM not_lake WHERE id = 1"))
    assert(!e.getMessage.contains("graft"), s"must be Spark's own error: $e")
    // SELECT on an unregistered name keeps Spark's resolution
    assert(spark.sql("SELECT count(*) AS n FROM not_lake")
      .collect().head.getLong(0) == 1L)

    // TIMESTAMP AS OF before the first commit errors loudly
    mk("sql-ts", "sqlts", (1L, "a", 1.0))
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM sqlts TIMESTAMP AS OF '2001-01-01'").collect())
    assert(e2.getMessage.contains("before the first commit"))

    // malformed MERGE: non-equi ON is rejected with the contract message
    df((1L, "a", 1.0)).createOrReplaceTempView("sqlts_src")
    val e3 = intercept[Exception](spark.sql(
      "MERGE INTO sqlts t USING sqlts_src s ON t.id < s.id WHEN MATCHED THEN DELETE"))
    assert(e3.getMessage.contains("ON must be"))
  }

  /** Sum of FileSourceScan `numFiles` across the executed plan,
    * descending through AQE stages (the DV anti-join plan nests its
    * scans inside query stages after adaptive execution). */
  private def openedFiles(sql: String): (Long, Int) = {
    val df0 = spark.sql(sql)
    val n = df0.collect().length
    (graft.tools.PlanScans.filesOpened(df0), n)
  }


  test("file skipping survives a deletion vector: pruned scan under the anti-join") {
    // 8 days x ~24 rows, 24 range buckets — files big enough that a
    // 1-row delete stays under the 30% COW crossover (stays MOR)
    val rows = for { d <- 0 until 8; i <- 0 until 24 }
      yield (d * 100L + i, s"d$d", i.toDouble)
    val table = tmp("sql-dvprune")
    Snapshots.commitAll(table,
      Snapshots.stageWithStats(df(rows: _*), table, "day", "id", buckets = 24))
    LakeSql.register(spark, "sqldv", table, "day")
    val total = Snapshots.entriesAt(table, 1).size
    assert(total >= 16, s"need a multi-file layout, got $total")

    // one small MOR delete: a deletion vector, no file rewritten
    spark.sql("DELETE FROM sqldv WHERE id = 301")
    assert(Snapshots.entriesAll(table).exists(_.props.contains("ref.dv")),
      "the small delete must stay merge-on-read")

    // r9: this read forfeited ALL manifest pruning until REORG; r10 the
    // pruned base scan sits UNDER the DV anti-join, so a day-equality
    // SELECT still opens only that day's files (plus the sidecar)
    val (files, n) = openedFiles("SELECT id, day, v FROM sqldv WHERE day = 'd3'")
    assert(n == 23, s"deleted row must stay gone, got $n rows")
    assert(files < total / 2,
      s"day equality must keep skipping after a delete: opened $files of $total")
    // and the merged rows are exactly the undeleted day
    assert(content("SELECT id, day, v FROM sqldv WHERE day = 'd3'") ==
      (0 until 24).filter(_ != 1).map(i => (300L + i, "d3", i.toDouble)))
  }

  test("file skipping survives column evolution: grouped pruned scans under the union") {
    import spark.implicits._
    // era 1: 4 days of (id, day, v); era 2: 4 more days WITH an extra w
    // column — two physical schema groups in one snapshot
    val rows1 = for { d <- 0 until 4; i <- 0 until 6 }
      yield (d * 100L + i, s"d$d", i.toDouble)
    val rows2 = for { d <- 4 until 8; i <- 0 until 6 }
      yield (d * 100L + i, s"d$d", i.toDouble, i.toLong)
    val table = tmp("sql-evoprune")
    Snapshots.commitAll(table,
      Snapshots.stageWithStats(rows1.toDF("id", "day", "v"), table, "day", "id",
        buckets = 8))
    Snapshots.commitAll(table,
      Snapshots.stageWithStats(rows2.toDF("id", "day", "v", "w"), table, "day",
        "id", buckets = 8))
    LakeSql.register(spark, "sqlevo", table, "day")
    val total = Snapshots.entriesAll(table).size
    assert(total >= 8, s"need a multi-file layout, got $total")

    // pre-r10 the divergent footers forced an unpruned mergeSchema read
    // (every footer, zero skipping); now each schema group scans through
    // its own pruned FileIndex under the union
    val (fOld, nOld) = openedFiles("SELECT id, day, v, w FROM sqlevo WHERE day = 'd1'")
    assert(nOld == 6 && fOld < total / 2,
      s"era-1 day must prune: opened $fOld of $total, $nOld rows")
    val (fNew, nNew) = openedFiles("SELECT id, day, v, w FROM sqlevo WHERE day = 'd6'")
    assert(nNew == 6 && fNew < total / 2,
      s"era-2 day must prune: opened $fNew of $total, $nNew rows")
    // era-1 rows NULL-fill w; era-2 rows carry it — mergeSchema parity
    val r = spark.sql("SELECT w FROM sqlevo WHERE id = 101").collect()
    assert(r.length == 1 && r.head.isNullAt(0), "era-1 w must NULL-fill")
    assert(spark.sql("SELECT w FROM sqlevo WHERE id = 603").collect()
      .head.getLong(0) == 3L)
    assert(spark.sql("SELECT count(*) AS n FROM sqlevo").collect()
      .head.getLong(0) == 48L)
  }

  test("file skipping survives DV + evolution combined: pruned union under the anti-join") {
    import spark.implicits._
    val rows1 = for { d <- 0 until 4; i <- 0 until 24 }
      yield (d * 100L + i, s"d$d", i.toDouble)
    val rows2 = for { d <- 4 until 8; i <- 0 until 24 }
      yield (d * 100L + i, s"d$d", i.toDouble, i.toLong)
    val table = tmp("sql-dvevo")
    Snapshots.commitAll(table,
      Snapshots.stageWithStats(rows1.toDF("id", "day", "v"), table, "day", "id",
        buckets = 12))
    Snapshots.commitAll(table,
      Snapshots.stageWithStats(rows2.toDF("id", "day", "v", "w"), table, "day",
        "id", buckets = 12))
    LakeSql.register(spark, "sqldve", table, "day")
    val total = Snapshots.entriesAll(table).size
    // a small MOR delete in EACH era: vectors + two schema groups at once
    spark.sql("DELETE FROM sqldve WHERE id IN (101, 601)")
    assert(Snapshots.entriesAll(table).exists(_.props.contains("ref.dv")))

    val (f1, n1) = openedFiles("SELECT id, day, v, w FROM sqldve WHERE day = 'd1'")
    assert(n1 == 23 && f1 < total / 2,
      s"DV+evolved era-1 day must prune: opened $f1 of $total, $n1 rows")
    val (f2, n2) = openedFiles("SELECT id, day, v, w FROM sqldve WHERE day = 'd6'")
    assert(n2 == 23 && f2 < total / 2,
      s"DV+evolved era-2 day must prune: opened $f2 of $total, $n2 rows")
    assert(spark.sql("SELECT count(*) AS n FROM sqldve").collect()
      .head.getLong(0) == 190L)
  }

  test("pruning and reads survive a column rename: physical tag hint bridges") {
    val table = mk("sql-ren", "sqlrn",
      (1L, "a", 1.0), (2L, "b", 2.0), (10L, "b", 10.0))
    Snapshots.renameColumn(spark, table, "day", "d")
    // SQL sees the LOGICAL name; the scan runs under the physical one
    assert(spark.sql("SELECT id FROM sqlrn WHERE d = 'b'")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 10L))
    // a DV on the renamed table keeps merged semantics through SQL
    spark.sql("DELETE FROM sqlrn WHERE id = 2")
    assert(spark.sql("SELECT id FROM sqlrn WHERE d = 'b'")
      .collect().map(_.getLong(0)).toSeq == Seq(10L))
  }

  test("string-column footer stats prune equality and ranges") {
    import spark.implicits._
    // names arrive range-clustered, so per-file [min, max] string
    // bands are tight and both equality and ranges can prune
    val names = ('a' to 'z').map(c => s"${c}name")
    val rows = for { n <- names; i <- 0 until 8 }
      yield (n.hashCode.toLong * 100 + i, "d0", n)
    val table = tmp("sql-strstats")
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      rows.toDF("id", "day", "name"), table, "day", "name", buckets = 13))
    assert(Snapshots.entriesAll(table).forall(e =>
      e.props.contains("smin.name") && e.props.contains("smax.name")),
      "string stats must land in the manifest under their OWN keys")
    LakeSql.register(spark, "sqlss", table, "day")
    val total = Snapshots.entriesAll(table).size
    assert(total >= 8, s"need a multi-file layout, got $total")

    val (fEq, nEq) = openedFiles("SELECT id FROM sqlss WHERE name = 'mname'")
    assert(nEq == 8 && fEq < total / 2,
      s"string equality must prune: opened $fEq of $total")
    val (fRg, nRg) = openedFiles("SELECT id FROM sqlss WHERE name >= 'xname'")
    assert(nRg == 24 && fRg < total / 2,
      s"string range must prune: opened $fRg of $total")
    // soundness at the boundary: every row accounted for
    assert(spark.sql("SELECT count(*) AS n FROM sqlss WHERE name < 'c'")
      .collect().head.getLong(0) == 16L)
    LakeSql.unregister(spark, "sqlss")
  }

  test("date-column footer stats prune ranges (epoch-day integers)") {
    import spark.implicits._
    // a SECONDARY date column (the tag is a plain bucket string), so
    // only its footer stats can prune
    val rows = (0 until 120).map { i =>
      (i.toLong, s"b${i % 2}", java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i / 4)))
    }
    val table = tmp("sql-datestats")
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      rows.toDF("id", "bucket", "d"), table, "bucket", "d", buckets = 10))
    assert(Snapshots.entriesAll(table).forall(_.props.contains("min.d")))
    LakeSql.register(spark, "sqlds", table, "bucket")
    val total = Snapshots.entriesAll(table).size
    assert(total >= 6, s"need a multi-file layout, got $total")

    val (f1, n1) = openedFiles(
      "SELECT id FROM sqlds WHERE d = DATE '2024-01-10'")
    assert(n1 == 4 && f1 < total / 2,
      s"date equality must prune: opened $f1 of $total")
    val (f2, n2) = openedFiles(
      "SELECT id FROM sqlds WHERE d >= DATE '2024-01-25'")
    assert(n2 == 24 && f2 < total / 2,
      s"date range must prune: opened $f2 of $total")
    LakeSql.unregister(spark, "sqlds")
  }

  test("date-tag ranges prune by tag string order; numeric tags never do") {
    import spark.implicits._
    // DATE tag: the ISO rendering is lexicographic, so BETWEEN on the
    // partition column prunes with ZERO stats — the most common
    // analytics slice (`WHERE day BETWEEN d1 AND d2`) previously
    // tag-pruned only on equality
    val rows = (0 until 60).map { i =>
      (i.toLong, java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i / 10)), i.toDouble)
    }
    val table = tmp("sql-datetag")
    Snapshots.commit(table,
      Snapshots.stage(rows.toDF("id", "day", "v"), table, "day"))
    LakeSql.register(spark, "sqldt", table, "day")
    val es = Snapshots.entriesAll(table)
    val inRange = es.count(e => e.tag >= "2024-01-03" && e.tag <= "2024-01-04")
    val (f1, n1) = openedFiles("SELECT id FROM sqldt WHERE day BETWEEN " +
      "DATE '2024-01-03' AND DATE '2024-01-04'")
    assert(n1 == 20 && f1 == inRange,
      s"date-tag BETWEEN must open only in-range tags: $f1 vs $inRange")
    val upper = es.count(_.tag >= "2024-01-05")
    val (f2, n2) = openedFiles(
      "SELECT id FROM sqldt WHERE day >= DATE '2024-01-05'")
    assert(n2 == 20 && f2 == upper)
    LakeSql.unregister(spark, "sqldt")

    // numeric tag: "9" > "10" lexicographically — range pruning must
    // NOT engage (sound: all files open, answer exact)
    val t2 = tmp("sql-numtag")
    val nRows = (1 to 12).flatMap(g => Seq((g.toLong * 100, g, 1.0)))
    Snapshots.commit(t2,
      Snapshots.stage(nRows.toDF("id", "grp", "v"), t2, "grp"))
    LakeSql.register(spark, "sqlnt", t2, "grp")
    val total2 = Snapshots.entriesAll(t2).size
    val (f3, n3) = openedFiles("SELECT id FROM sqlnt WHERE grp >= 9")
    assert(n3 == 4 && f3 == total2,
      "numeric tag ranges must keep every file (string order disagrees)")
    LakeSql.unregister(spark, "sqlnt")
  }

  test("decimal columns record no footer stats; queries stay correct") {
    import spark.implicits._
    // parquet stores small decimals as UNSCALED ints — recording those
    // as stats would make 'WHERE dec = 0.50' prune every file (review
    // find); the annotation gate skips them instead
    val rows = (1 to 40).map(i =>
      (i.toLong, "a", new java.math.BigDecimal(s"0.${10 + i}")))
    val table = tmp("sql-decstats")
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      rows.toDF("id", "day", "dec"), table, "day", "dec", buckets = 4))
    assert(Snapshots.entriesAll(table).forall(e =>
      !e.props.keys.exists(_.endsWith(".dec"))),
      "decimal columns must record no stats (unscaled mismatch)")
    LakeSql.register(spark, "sqldec", table, "day")
    assert(spark.sql("SELECT id FROM sqldec WHERE dec = 0.50")
      .collect().map(_.getLong(0)).toSeq == Seq(40L))
    LakeSql.unregister(spark, "sqldec")
  }

  test("OPTIMIZE WHERE on a CONVERTed table still reaches synthetic-tagged files") {
    import spark.implicits._
    val loc = tmp("sql-convopt")
    (1 to 8).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i.toDouble))
      .toDF("id", "day", "v").repartition(4)
      .write.mode("overwrite").parquet(loc)
    spark.sql(s"CONVERT TO GRAFT TABLE sqlco LOCATION '$loc' PARTITIONED BY (day)")
    assert(Snapshots.entriesAll(loc).forall(
      _.props.contains(Snapshots.TagSyntheticProp)))
    // pre-fix: no synthetic tag equals 'a', so this was a silent no-op
    spark.sql("OPTIMIZE sqlco WHERE day = 'a'").collect()
    val es = Snapshots.entriesAll(loc)
    assert(es.forall(e => !e.props.contains(Snapshots.TagSyntheticProp)),
      "scoped OPTIMIZE must rewrite (and re-tag) converted files")
    assert(spark.sql("SELECT count(*) AS n FROM sqlco").collect()
      .head.getLong(0) == 8L)
    LakeSql.unregister(spark, "sqlco")
  }

  test("OPTIMIZE WHERE IN handles tag values containing commas") {
    val table = tmp("sql-optcomma")
    import spark.implicits._
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      Seq((1L, "a,b", 1.0), (2L, "a,b", 2.0), (3L, "c", 3.0), (4L, "c", 4.0))
        .toDF("id", "day", "v"), table, "day", "id", buckets = 2))
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      Seq((5L, "a,b", 5.0), (6L, "c", 6.0)).toDF("id", "day", "v"),
      table, "day", "id", buckets = 2))
    LakeSql.register(spark, "sqlcm", table, "day")
    assert(Snapshots.entries(table).count(_._2 == "a,b") >= 2)
    spark.sql("OPTIMIZE sqlcm WHERE day IN ('a,b')").collect()
    assert(Snapshots.entries(table).count(_._2 == "a,b") == 1,
      "the comma-valued tag must be scoped, not split apart")
    assert(Snapshots.entries(table).count(_._2 == "c") == 2,
      "the other tag must be untouched")
    LakeSql.unregister(spark, "sqlcm")
  }

  test("OPTIMIZE WHERE scopes maintenance to matching tags") {
    val table = tmp("sql-optwhere")
    // fragment BOTH days across two commits
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      df((1L, "a", 1.0), (10L, "b", 10.0)), table, "day", "id", buckets = 2))
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      df((2L, "a", 2.0), (11L, "b", 11.0)), table, "day", "id", buckets = 2))
    LakeSql.register(spark, "sqlow", table, "day")
    assert(Snapshots.entries(table).count(_._2 == "a") == 2)
    assert(Snapshots.entries(table).count(_._2 == "b") == 2)

    spark.sql("OPTIMIZE sqlow WHERE day = 'a'").collect()
    // day a coalesced, day b left exactly as it was
    assert(Snapshots.entries(table).count(_._2 == "a") == 1,
      "scoped OPTIMIZE must coalesce the named tag")
    assert(Snapshots.entries(table).count(_._2 == "b") == 2,
      "scoped OPTIMIZE must not touch other tags")
    assert(content("SELECT id, day, v FROM sqlow") ==
      Seq((1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0), (11L, "b", 11.0)))

    spark.sql("OPTIMIZE sqlow WHERE day IN ('b')").collect()
    assert(Snapshots.entries(table).count(_._2 == "b") == 1)

    val e = intercept[Exception](
      spark.sql("OPTIMIZE sqlow WHERE v > 2.0").collect())
    assert(e.getMessage.contains("partition column"))
    LakeSql.unregister(spark, "sqlow")
  }

  test("CTAS STATS BY clusters for skipping; INSERT carries decoration forward") {
    val loc = tmp("sql-ctas-stats")
    spark.sql(
      s"""CREATE GRAFT TABLE sqlst LOCATION '$loc' PARTITIONED BY (day)
         |STATS BY (id) AS SELECT
         |  CAST(id AS BIGINT) AS id,
         |  CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS day,
         |  CAST(id AS DOUBLE) AS v
         |FROM range(200)""".stripMargin)
    assert(Snapshots.entriesAll(loc).forall(_.props.contains("min.id")),
      "STATS BY must decorate every CTAS entry with footer stats")
    val total = Snapshots.entriesAll(loc).size
    assert(total >= 4, s"need a multi-file layout, got $total")
    val (files, n) = openedFiles("SELECT id FROM sqlst WHERE id BETWEEN 10 AND 20")
    assert(n == 11 && files < total,
      s"range skipping from the first commit: opened $files of $total")

    // an INSERT must not erode the surface: new files carry stats too
    spark.sql("INSERT INTO sqlst SELECT CAST(1000 AS BIGINT), 'a', CAST(0.0 AS DOUBLE)")
    assert(Snapshots.entriesAll(loc).forall(_.props.contains("min.id")),
      "INSERT INTO must restage with the table's stats decoration")
    // and explicit-column INSERTs ride the same path
    spark.sql("INSERT INTO sqlst (id, day) VALUES (1001, 'b')")
    assert(Snapshots.entriesAll(loc).forall(_.props.contains("min.id")))
    LakeSql.unregister(spark, "sqlst")
  }

  test("ALTER RENAME/DROP COLUMN through SQL; DML works on the new names") {
    val table = mk("sql-alter", "sqlalt",
      (1L, "a", 1.0), (2L, "a", 2.0), (10L, "b", 10.0))
    spark.sql("ALTER GRAFT TABLE sqlalt RENAME COLUMN v TO val")
    assert(spark.sql("SELECT val FROM sqlalt WHERE id = 2")
      .collect().toSeq == Seq(Row(2.0)))
    // DML addresses the NEW name; the restage path bridges to physical
    spark.sql("UPDATE sqlalt SET val = val * 10.0 WHERE id = 2")
    assert(spark.sql("SELECT val FROM sqlalt WHERE id = 2")
      .collect().toSeq == Seq(Row(20.0)))
    // time travel keeps the OLD name for the old version
    assert(spark.sql("SELECT v FROM sqlalt VERSION AS OF 1 WHERE id = 2")
      .collect().toSeq == Seq(Row(2.0)))

    spark.sql("ALTER GRAFT TABLE sqlalt DROP COLUMN val")
    assert(spark.sql("SELECT * FROM sqlalt").columns.toSeq == Seq("id", "day"))
    assert(Snapshots.currentVersion(table) == 4L)
  }

  test("MERGE: multi-conjunct ON (composite key) and explicit-column INSERT") {
    mk("sql-mergec", "sqlmc",
      (1L, "a", 1.0), (1L, "b", 2.0), (10L, "b", 10.0))
    // source agrees with (1,'a') and (10,'b') on BOTH keys; (1,'c') and
    // (77,'a') agree on at most one → NOT MATCHED → explicit insert
    spark.sql(
      """MERGE INTO sqlmc t USING (
        |  SELECT * FROM VALUES
        |    (CAST(1 AS BIGINT), 'a', CAST(100.0 AS DOUBLE)),
        |    (CAST(1 AS BIGINT), 'c', CAST(300.0 AS DOUBLE)),
        |    (CAST(77 AS BIGINT), 'a', CAST(700.0 AS DOUBLE)),
        |    (CAST(10 AS BIGINT), 'b', CAST(110.0 AS DOUBLE))
        |  AS x(id, day, v)) s
        |ON t.id = s.id AND t.day = s.day
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (id, day, v) VALUES (s.id, s.day, s.v + 0.5)
        |""".stripMargin)
    assert(content("SELECT id, day, v FROM sqlmc").sortBy(r => (r._1, r._2)) ==
      Seq((1L, "a", 100.0), (1L, "b", 2.0), (1L, "c", 300.5),
          (10L, "b", 110.0), (77L, "a", 700.5)))
  }

  test("MERGE NOT MATCHED BY SOURCE: scoped sync deletes/updates stale target rows") {
    mk("sql-mergebs", "sqlbs",
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "b", 4.0))
    // source matches 2 and brings 9; BY SOURCE scoped to day b: stale 3
    // deletes, stale 4 updates-by-condition... one clause each kind
    spark.sql(
      """MERGE INTO sqlbs t USING (
        |  SELECT CAST(2 AS BIGINT) AS id, 'a' AS day, CAST(20.0 AS DOUBLE) AS v
        |  UNION ALL
        |  SELECT CAST(9 AS BIGINT), 'c', CAST(90.0 AS DOUBLE)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE AND t.day = 'b' AND t.v < 4.0 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE AND t.day = 'b' AND t.v >= 4.0
        |THEN UPDATE SET v = t.v + 100.0""".stripMargin)
    assert(content("SELECT id, day, v FROM sqlbs") ==
      Seq((1L, "a", 1.0),      // unmatched, outside BY SOURCE scope
          (2L, "a", 20.0),     // matched update
          (4L, "b", 104.0),    // BY SOURCE update
          (9L, "c", 90.0)))    // insert; 3 deleted BY SOURCE
  }

  test("MERGE with an empty source still drives BY SOURCE clauses") {
    mk("sql-mergebe", "sqlbe", (1L, "a", 1.0), (2L, "b", 2.0))
    spark.sql(
      """MERGE INTO sqlbe t USING (
        |  SELECT CAST(NULL AS BIGINT) AS id, 'x' AS day,
        |         CAST(NULL AS DOUBLE) AS v WHERE 1 = 0) s
        |ON t.id = s.id
        |WHEN NOT MATCHED BY SOURCE AND t.day = 'b' THEN DELETE""".stripMargin)
    assert(content("SELECT id, day, v FROM sqlbe") == Seq((1L, "a", 1.0)))
  }

  test("INSERT INTO (cols): positional binding to named columns, rest NULL-fill") {
    mk("sql-inscols", "sqlic", (1L, "a", 1.0))
    spark.sql("INSERT INTO sqlic (id, day) VALUES (5, 'b')")
    val got = spark.sql("SELECT id, day, v FROM sqlic ORDER BY id").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (5L, "b")))
    assert(got(1).isNullAt(2), "unnamed v must NULL-fill")
    // unknown column and arity mismatches are loud
    val e1 = intercept[Exception](
      spark.sql("INSERT INTO sqlic (id, nope) VALUES (6, 'c')"))
    assert(e1.getMessage.contains("unknown column"))
    val e2 = intercept[Exception](
      spark.sql("INSERT INTO sqlic (id, day) VALUES (6, 'c', 3.0)"))
    assert(e2.getMessage.contains("columns"))
  }

  test("MERGE explicit INSERT: unnamed target columns NULL-fill") {
    mk("sql-mergen", "sqlmn", (1L, "a", 1.0))
    spark.sql(
      """MERGE INTO sqlmn t USING (
        |  SELECT CAST(5 AS BIGINT) AS id, 'b' AS day) s
        |ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT (id, day) VALUES (s.id, s.day)""".stripMargin)
    val got = spark.sql("SELECT id, day, v FROM sqlmn ORDER BY id").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (5L, "b")))
    assert(!got(0).isNullAt(2) && got(0).getDouble(2) == 1.0)
    assert(got(1).isNullAt(2), "unnamed v must NULL-fill")
  }

  test("count(*) folds to a LocalRelation from manifest counts; guarded shapes scan") {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    mk("sql-meta-count", "sqlmc",
      (1L to 20L).map(i => (i, if (i <= 10) "a" else "b", i.toDouble)): _*)
    def allLocal(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectLeaves()
        .forall(_.isInstanceOf[LocalRelation])
    val q = spark.sql("SELECT count(*) AS n FROM sqlmc")
    assert(allLocal(q), "bare count(*) must fold — no scan in the plan")
    assert(q.collect().head.getLong(0) == 20L)
    // count(col) folds too when the column carries nulls.<col> stats
    // on every entry (id is the stats column here; null-free files
    // record nulls = 0)
    val qc = spark.sql("SELECT count(id) AS n, count(*) AS m FROM sqlmc")
    assert(allLocal(qc), "count(stats col) must fold via null counts")
    assert(qc.collect().head == Row(20L, 20L))
    // every guard: filters, count(col) WITHOUT null stats, DISTINCT,
    // grouping must SCAN
    val guarded = Seq(
      "SELECT count(*) AS n FROM sqlmc WHERE v > 5.0",
      "SELECT count(v) AS n FROM sqlmc",
      "SELECT count(DISTINCT day) AS n FROM sqlmc",
      "SELECT day, count(*) AS n FROM sqlmc GROUP BY day")
    guarded.foreach { sql =>
      assert(!allLocal(spark.sql(sql)), s"must not fold: $sql") }
    assert(spark.sql(guarded.head).collect().head.getLong(0) == 15L)
    // a deletion vector moves the table off the bare-scan shape: the
    // fold must vanish and the MERGED count stay exact
    spark.sql("DELETE FROM sqlmc WHERE id = 1")
    val qd = spark.sql("SELECT count(*) AS n FROM sqlmc")
    assert(!allLocal(qd), "a DV-bearing table must not fold")
    assert(qd.collect().head.getLong(0) == 19L)
    val qcd = spark.sql("SELECT count(id) AS n FROM sqlmc")
    assert(!allLocal(qcd), "count(col) on a DV-bearing table must not fold")
    assert(qcd.collect().head.getLong(0) == 19L)
  }

  test("DESCRIBE DETAIL answers num_rows from the manifest, opening no data file") {
    val table = mk("sql-detail-meta", "sqldm",
      (1L to 30L).map(i => (i, if (i <= 15) "a" else "b", i.toDouble)): _*)
    def detail() = spark.sql("DESCRIBE DETAIL sqldm").collect().head
    assert(detail().getLong(6) == 30L)
    // a small MOR delete (under the COW crossover): vectors recorded,
    // dv.rows rides the entries
    spark.sql("DELETE FROM sqldm WHERE id <= 2")
    val d1 = detail()
    assert(d1.getLong(4) >= 1L, "the delete must be merge-on-read (dv files)")
    assert(d1.getLong(6) == 28L, "num_rows must fold rows - dv.rows")
    // a second delete folds the vector; the count follows
    spark.sql("DELETE FROM sqldm WHERE id = 3")
    assert(detail().getLong(6) == 27L)
    // THE PROOF it is metadata-only: mutilate a data file on disk —
    // any path that opened data files (the pre-r11 distributed count)
    // would now fail; the manifest fold cannot notice
    val victim = Snapshots.entriesAll(table).head.rel
    assert(new java.io.File(table, victim).delete())
    assert(detail().getLong(6) == 27L,
      "DETAIL must not open data files for num_rows")
  }

  test("VACUUM RETAIN n HOURS resolves the age window through publish times") {
    val table = mk("sql-vac-hours", "sqlvh", (1L, "a", 1.0))
    Snapshots.commit(table,
      Snapshots.stage(df((2L, "b", 2.0)), table, "day"))        // v2
    spark.sql("RESTORE sqlvh TO VERSION AS OF 1")               // v3: b's file now orphanable
    // every snapshot is seconds old: a generous age window keeps all
    // of them — nothing reclaimed, v1 still travelable
    assert(spark.sql("VACUUM sqlvh RETAIN 100 HOURS").collect()
      .head.getLong(0) == 0L)
    assert(spark.sql("SELECT count(*) AS n FROM sqlvh VERSION AS OF 2")
      .collect().head.getLong(0) == 2L)
    // age window of zero: only the newest snapshot survives (keep >= 1
    // floor), so v2's unshared file is reclaimed
    Thread.sleep(20) // publish mtimes strictly before the cutoff
    assert(spark.sql("VACUUM sqlvh RETAIN 0 HOURS").collect()
      .head.getLong(0) >= 1L)
    assert(content("SELECT id, day, v FROM sqlvh") == Seq((1L, "a", 1.0)))
  }

  test("OPTIMIZE MANIFESTS merges the log through SQL") {
    val table = mk("sql-opt-mf", "sqlom", (1L, "a", 1.0))
    (2 to 20).foreach(i => Snapshots.commit(table,
      Snapshots.stage(df((i.toLong, s"d$i", i.toDouble)), table, "day")))
    val v = spark.sql("OPTIMIZE sqlom MANIFESTS 2").collect().head.getLong(0)
    assert(v == 21L)
    val snap = new java.io.File(table, f"_graft_log/snap-$v%09d.txt")
    val mfs = new String(java.nio.file.Files.readAllBytes(snap.toPath))
      .split("\n").count(l => l.nonEmpty && !l.startsWith("#"))
    assert(mfs <= 2, s"SQL manifest compaction must merge the log, got $mfs")
    assert(spark.sql("SELECT count(*) AS n FROM sqlom").collect()
      .head.getLong(0) == 20L)
  }

  test("OPTIMIZE WHERE IN rejects malformed lists instead of narrowing scope") {
    val table = mk("sql-opt-in", "sqloi", (1L, "a", 1.0), (2L, "a", 2.0),
      (3L, "b", 3.0), (4L, "b", 4.0))
    // unquoted and missing-comma items must REJECT the statement — a
    // silently-narrowed scope would skip maintenance the operator asked
    // for (r10 advisor find)
    intercept[IllegalArgumentException] {
      spark.sql("OPTIMIZE sqloi WHERE day IN ('a', b)").collect()
    }
    intercept[IllegalArgumentException] {
      spark.sql("OPTIMIZE sqloi WHERE day IN ('a' 'b')").collect()
    }
    // the well-formed list still compacts both fragmented tags
    spark.sql("OPTIMIZE sqloi WHERE day IN ('a', 'b')").collect()
    assert(Snapshots.entries(table).groupBy(_._2).forall(_._2.size == 1))
  }

  test("MERGE SET and source columns resolve case-insensitively") {
    mk("sql-merge-case", "sqlmc", (1L, "a", 1.0), (2L, "a", 2.0))
    df((2L, "a", 200.0)).createOrReplaceTempView("sqlmc_src")
    // `SET V = …` against target column `v` — Spark resolution is
    // case-insensitive, so the kernel's unknown-column gate must be too
    // (r10 advisor find: spurious rejection), and the SET must APPLY
    spark.sql(
      """MERGE INTO sqlmc t USING sqlmc_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET V = s.v""".stripMargin).collect()
    assert(content("SELECT id, day, v FROM sqlmc") ==
      Seq((1L, "a", 1.0), (2L, "a", 200.0)))
  }

  test("repeated SQL resolution of one snapshot reads zero parquet footers") {
    mk("sql-cache", "sqlfc", (1L, "a", 1.0), (2L, "b", 2.0))
    spark.sql("SELECT id FROM sqlfc").collect() // first resolution may read
    val before = Snapshots.footerReads.get()
    spark.sql("SELECT sum(v) AS s FROM sqlfc").collect()
    spark.sql("SELECT id FROM sqlfc WHERE day = 'a'").collect()
    assert(Snapshots.footerReads.get() == before,
      "same-version re-resolutions must be served from the schema cache")
  }
}
