package graft

import graft.ops.lake.Snapshots
import graft.sql.LakeSql
import org.scalatest.funsuite.AnyFunSuite

/** Model check of the SQL SURFACE: a random statement sequence issued
  * entirely as `spark.sql` text — CREATE/INSERT (positional and
  * explicit-column)/MERGE (upsert, clause, and BY SOURCE sync forms)/
  * UPDATE/DELETE/RESTORE/OPTIMIZE/RENAME COLUMN with mid-rename DML,
  * plus VERSION AS OF probes — tracked against a pure in-memory model.
  * The kernel already carries its own randomized model (MutationsSpec);
  * this one proves the PARSER → COMMAND → KERNEL lowering and the
  * resolution-rule reads compose under arbitrary interleavings, not
  * just the per-statement specs. */
class LakeSqlModelSpec extends AnyFunSuite with SparkFixture {

  test("SQL statements track a pure model under a random sequence") {
    val rnd = new scala.util.Random(7741)
    val table = tmp("sql-model")
    var model = Map.empty[Long, (String, Double)] // id -> (day, v)
    var history = Map.empty[Long, Map[Long, (String, Double)]]
    var nextId = 0L

    def fresh(tag: String, n: Int): Seq[(Long, String, Double)] =
      (1 to n).map { _ => nextId += 1; (nextId, tag, rnd.nextInt(1000).toDouble) }
    def values(rows: Seq[(Long, String, Double)]): String =
      "(SELECT CAST(id AS BIGINT) AS id, day, CAST(v AS DOUBLE) AS v FROM VALUES " +
        rows.map { case (i, d, v) => s"($i, '$d', $v)" }.mkString(", ") +
        " AS x(id, day, v))"
    def snapshot(): Unit = { history += Snapshots.currentVersion(table) -> model }
    def stateVia(sql: String): Seq[(Long, String, Double)] =
      spark.sql(sql).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq
    def check(step: Int): Unit = {
      val want = model.toSeq.map { case (id, (d, v)) => (id, d, v) }.sortBy(_._1)
      // through the resolution rule AND through the kernel: must agree
      assert(stateVia("SELECT id, day, v FROM mdl") == want,
        s"SQL read diverged at step $step")
    }

    var evolved = false // positional INSERT needs full arity after evolution
    val seed = fresh("a", 3) ++ fresh("b", 3)
    spark.sql(
      s"""CREATE GRAFT TABLE mdl LOCATION '$table' PARTITIONED BY (day)
         |AS SELECT * FROM ${values(seed)}""".stripMargin)
    model = seed.map(r => r._1 -> ((r._2, r._3))).toMap
    snapshot(); check(0)
    // CDC mirror of the model table: APPLY CHANGES interleaves with
    // every other statement kind, and at each catch-up the mirror must
    // equal the model — end-to-end proof that the feed + net-effect +
    // keyed-apply chain composes with RESTORE, MERGE, OPTIMIZE,
    // evolution, rename-and-back, and INSERT OVERWRITE
    val mirrorT = tmp("sql-model-mirror")
    LakeSql.register(spark, "mdlm", mirrorT, "day")

    for (step <- 1 to 32) {
      val tag = Seq("a", "b", "c")(rnd.nextInt(3))
      rnd.nextInt(15) match {
        case 0 => // INSERT (explicit columns once the schema evolved —
          // positional binding demands the full union arity, per SQL)
          val rows = fresh(tag, 1 + rnd.nextInt(3))
          if (evolved)
            spark.sql(s"INSERT INTO mdl (id, day, v) SELECT * FROM ${values(rows)}")
          else spark.sql(s"INSERT INTO mdl SELECT * FROM ${values(rows)}")
          model ++= rows.map(r => r._1 -> ((r._2, r._3)))
        case 1 if model.nonEmpty => // MERGE upsert (UPDATE SET * / INSERT *)
          val upd = rnd.shuffle(model.toSeq).take(1 + rnd.nextInt(2))
            .map { case (id, (d, _)) => (id, d, rnd.nextInt(1000).toDouble) }
          val ins = fresh(tag, 1)
          spark.sql(
            s"""MERGE INTO mdl t USING ${values(upd ++ ins)} s ON t.id = s.id
               |WHEN MATCHED THEN UPDATE SET *
               |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
          model ++= (upd ++ ins).map(r => r._1 -> ((r._2, r._3)))
        case 2 if model.nonEmpty => // DELETE (crossover may go MOR or COW)
          val ids = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(2))
          spark.sql(s"DELETE FROM mdl WHERE id IN (${ids.mkString(", ")})")
          model --= ids
        case 3 if model.nonEmpty => // UPDATE one row
          val id = rnd.shuffle(model.keys.toSeq).head
          spark.sql(s"UPDATE mdl SET v = v * 3.0 WHERE id = $id")
          val (d, v) = model(id); model += id -> ((d, v * 3.0))
        case 4 if model.nonEmpty => // clause MERGE: low deletes, high folds in
          val ids = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(2))
          val srcUpd = ids.map { id =>
            val (d, _) = model(id); (id, d, rnd.nextInt(1000).toDouble) }
          val srcIns = fresh(tag, 1)
          spark.sql(
            s"""MERGE INTO mdl t USING ${values(srcUpd ++ srcIns)} s ON t.id = s.id
               |WHEN MATCHED AND s.v < 300.0 THEN DELETE
               |WHEN MATCHED THEN UPDATE SET v = s.v + t.v
               |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
          srcUpd.foreach { case (id, d, sv) =>
            if (sv < 300.0) model -= id
            else { val (_, tv) = model(id); model += id -> ((d, sv + tv)) }
          }
          model ++= srcIns.map(r => r._1 -> ((r._2, r._3)))
        case 5 if history.size > 1 => // RESTORE to a random old version
          val v = rnd.shuffle(history.keys.toSeq).head
          spark.sql(s"RESTORE mdl TO VERSION AS OF $v")
          model = history(v)
        case 6 => // OPTIMIZE: layout only — DV-aware since r10, vectors
          // materialize in the same pass (no manual purge step)
          spark.sql("OPTIMIZE mdl")
        case 7 if history.nonEmpty => // VERSION AS OF probe vs history
          val v = rnd.shuffle(history.keys.toSeq).head
          val want = history(v).toSeq
            .map { case (id, (d, vv)) => (id, d, vv) }.sortBy(_._1)
          assert(stateVia(s"SELECT id, day, v FROM mdl VERSION AS OF $v") == want,
            s"VERSION AS OF $v diverged at step $step")
        case 8 if model.nonEmpty => // BY SOURCE scoped sync on one tag (r10)
          val t0 = rnd.shuffle(model.values.map(_._1).toSeq).head
          val keep = model.toSeq.filter(_._2._1 == t0)
          val restated = rnd.shuffle(keep)
            .take(math.max(1, keep.size - rnd.nextInt(2)))
            .map { case (id, (d, _)) => (id, d, rnd.nextInt(1000).toDouble) }
          spark.sql(
            s"""MERGE INTO mdl t USING ${values(restated)} s ON t.id = s.id
               |WHEN MATCHED THEN UPDATE SET v = s.v
               |WHEN NOT MATCHED BY SOURCE AND t.day = '$t0' THEN DELETE
               |""".stripMargin)
          val restatedIds = restated.map(_._1).toSet
          model = model.filter { case (id, (d, _)) =>
            d != t0 || restatedIds(id) } ++
            restated.map(r => r._1 -> ((r._2, r._3)))
        case 9 => // explicit-column INSERT, shuffled binding order (r10)
          val r = fresh(tag, 1).head
          spark.sql(s"INSERT INTO mdl (v, id, day) " +
            s"VALUES (CAST(${r._3} AS DOUBLE), CAST(${r._1} AS BIGINT), '${r._2}')")
          model += r._1 -> ((r._2, r._3))
        case 10 => // rename there-and-back with DML in the middle (r10):
          // the stage family must resolve live logical names throughout
          spark.sql("ALTER GRAFT TABLE mdl RENAME COLUMN v TO w")
          val rr = fresh(tag, 1).head
          spark.sql(s"INSERT INTO mdl (id, day, w) " +
            s"VALUES (CAST(${rr._1} AS BIGINT), '${rr._2}', CAST(${rr._3} AS DOUBLE))")
          spark.sql("ALTER GRAFT TABLE mdl RENAME COLUMN w TO v")
          model += rr._1 -> ((rr._2, rr._3))
        case 11 => // COLUMN EVOLUTION (r10 session 2): a kernel append
          // lands an extra column; later random DML must run mergeSchema
          // throughout or rewrites would drop it / conditions break —
          // the model ignores the column, which is exactly the point
          // (id/day/v semantics must be untouched by its presence)
          import spark.implicits._
          val ev = fresh(tag, 1).head
          Snapshots.commit(table, Snapshots.stage(
            Seq((ev._1, ev._2, ev._3, step.toLong))
              .toDF("id", "day", "v", "extra"), table, "day"))
          evolved = true
          model += ev._1 -> ((ev._2, ev._3))
        case 12 => // log maintenance: manifest merge is content-invisible
          spark.sql("OPTIMIZE mdl MANIFESTS 2")
        case 13 if model.nonEmpty => // INSERT OVERWRITE one tag (r11 s3,
          // the replaceWhere shape): re-state the slice rescaled plus a
          // fresh row; every other tag must carry untouched
          val t0 = rnd.shuffle(model.values.map(_._1).toSeq).head
          val restated = model.toSeq.filter(_._2._1 == t0)
            .map { case (id, (d, vv)) => (id, d, vv * 2.0) } :+ fresh(t0, 1).head
          // positional arity follows the LIVE schema, not the `evolved`
          // flag — RESTORE can rewind to a pre-evolution snapshot
          // (schema is snapshot-scoped), and the flag would go stale
          val arity = spark.sql("SELECT * FROM mdl LIMIT 0").columns.length
          val pad = Seq.fill(arity - 3)("CAST(NULL AS BIGINT)")
          spark.sql(
            s"""INSERT OVERWRITE mdl WHERE day = '$t0'
               |SELECT ${(Seq("id", "day", "v") ++ pad).mkString(", ")}
               |FROM ${values(restated)}""".stripMargin)
          model = model.filter { case (_, (d, _)) => d != t0 } ++
            restated.map(r => r._1 -> ((r._2, r._3)))
        case 14 => // CDC catch-up: the mirror converges to the model
          spark.sql("APPLY CHANGES INTO mdlm FROM mdl KEYS (id)")
          val want = model.toSeq.map { case (id, (d, v)) => (id, d, v) }.sortBy(_._1)
          if (want.nonEmpty || Snapshots.currentVersion(mirrorT) >= 1)
            assert(stateVia("SELECT id, day, v FROM mdlm") == want,
              s"CDC mirror diverged at step $step")
        case _ => ()
      }
      snapshot(); check(step)
    }

    // closing CDC catch-up: whatever the sequence did, the mirror ends
    // equal to the model (and survives a VACUUM of the source, which
    // only reclaims unreferenced history)
    spark.sql("APPLY CHANGES INTO mdlm FROM mdl KEYS (id)")
    spark.sql("VACUUM mdl")
    check(99)
    assert(stateVia("SELECT id, day, v FROM mdlm") ==
      model.toSeq.map { case (id, (d, v)) => (id, d, v) }.sortBy(_._1),
      "closing CDC mirror state")
    LakeSql.unregister(spark, "mdl")
    LakeSql.unregister(spark, "mdlm")
  }
}
