package graft

import graft.ops.lake.{Constraints, Mutations, Snapshots}
import graft.sql.LakeSql
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CHECK-constraint contracts: write-time enforcement on every staging
  * path, atomic rejection (no commit, no stray files), SQL NULL
  * semantics, existing-data validation at ADD, and the schema-op
  * interlock. */
class ConstraintsSpec extends AnyFunSuite with SparkFixture {

  private def df(rows: (Long, String, Double)*) = {
    import spark.implicits._
    rows.toDF("id", "day", "v")
  }

  private def mkTable(sub: String, rows: (Long, String, Double)*): String = {
    val table = tmp(sub)
    Snapshots.commitAll(table,
      Snapshots.stageWithStats(df(rows: _*), table, "day", "id", buckets = 2))
    table
  }

  private def rowsOf(table: String): Seq[(Long, String, Double)] =
    Snapshots.readMerged(spark, table).select("id", "day", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq

  private def dataFiles(table: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    walk(new java.io.File(table, "data"))
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSet
  }

  test("violating write rejected atomically: no commit, no stray staged files") {
    val table = mkTable("con-basic", (1L, "a", 1.0), (2L, "b", 2.0))
    Constraints.add(spark, table, "nonneg", "v >= 0.0")
    assert(Constraints.active(table) == Map("nonneg" -> "v >= 0.0"))

    val v = Snapshots.currentVersion(table)
    val files = dataFiles(table)
    val e = intercept[IllegalArgumentException] {
      Snapshots.commit(table, Snapshots.stage(df((3L, "c", -5.0)), table, "day"))
    }
    assert(e.getMessage.contains("nonneg") && e.getMessage.contains("1 violating"))
    assert(Snapshots.currentVersion(table) == v, "no commit must exist")
    assert(dataFiles(table) == files, "staged files must be cleaned up")
    assert(rowsOf(table) == Seq((1L, "a", 1.0), (2L, "b", 2.0)))

    // a clean write on the same table still lands
    Snapshots.commit(table, Snapshots.stage(df((3L, "c", 5.0)), table, "day"))
    assert(rowsOf(table) == Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 5.0)))
  }

  test("every mutation path enforces: merge, update; delete untouched") {
    val table = mkTable("con-paths", (1L, "a", 1.0), (2L, "b", 2.0))
    Constraints.add(spark, table, "cap", "v <= 100.0")

    // MERGE whose update breaks the cap: rejected, table unchanged
    intercept[IllegalArgumentException] {
      Mutations.mergeInto(spark, table, df((1L, "a", 999.0)), "id", "day")
    }
    assert(rowsOf(table) == Seq((1L, "a", 1.0), (2L, "b", 2.0)))

    // UPDATE breaking the cap: rejected
    intercept[IllegalArgumentException] {
      Mutations.updateWhere(spark, table, col("id") === 2,
        Map("v" -> (col("v") + 200.0)), "day")
    }
    assert(rowsOf(table) == Seq((1L, "a", 1.0), (2L, "b", 2.0)))

    // passing mutations still work; DV delete stages nothing → never gated
    Mutations.mergeInto(spark, table, df((1L, "a", 50.0)), "id", "day")
    Mutations.deleteWhere(spark, table, col("id") === 2)
    assert(rowsOf(table) == Seq((1L, "a", 50.0)))
  }

  test("SQL CHECK NULL semantics: null check value passes") {
    val table = tmp("con-null")
    import spark.implicits._
    val rows = Seq((1L, "a", Some(1.0)), (2L, "a", None))
      .toDF("id", "day", "v")
    Snapshots.commit(table, Snapshots.stage(rows, table, "day"))
    // v IS NULL → check is NULL → passes (SQL CHECK), so ADD succeeds
    Constraints.add(spark, table, "pos", "v > 0.0")
    // and a new null row also passes
    Snapshots.commit(table, Snapshots.stage(
      Seq((3L, "b", None: Option[Double])).toDF("id", "day", "v"), table, "day"))
    assert(Snapshots.readMerged(spark, table).count() == 3)
  }

  test("ADD validates existing data; DROP retires; RESTORE restores the set") {
    val table = mkTable("con-add", (1L, "a", 1.0), (2L, "b", -2.0))
    val e = intercept[IllegalArgumentException](
      Constraints.add(spark, table, "nonneg", "v >= 0.0"))
    assert(e.getMessage.contains("existing data violates"))
    assert(Constraints.active(table).isEmpty)

    Constraints.add(spark, table, "capped", "v <= 10.0") // v2: valid
    // constraints survive unrelated commits (inherited props)
    Snapshots.commit(table, Snapshots.stage(df((3L, "c", 3.0)), table, "day"))
    assert(Constraints.active(table) == Map("capped" -> "v <= 10.0"))

    Constraints.drop(spark, table, "capped") // v4
    assert(Constraints.active(table).isEmpty)
    Snapshots.commit(table, Snapshots.stage(df((4L, "d", 99.0)), table, "day"))

    // restore to v3 (constraint present): the SET is version-scoped
    Snapshots.rollback(table, 3)
    assert(Constraints.active(table) == Map("capped" -> "v <= 10.0"))
    intercept[IllegalArgumentException] {
      Snapshots.commit(table, Snapshots.stage(df((5L, "e", 50.0)), table, "day"))
    }
  }

  test("schema ops refuse to move a constrained column") {
    val table = mkTable("con-schema", (1L, "a", 1.0))
    Constraints.add(spark, table, "pos", "v > 0.0")
    val e = intercept[IllegalArgumentException](
      Snapshots.renameColumn(spark, table, "v", "amount"))
    assert(e.getMessage.contains("pos"))
    val e2 = intercept[IllegalArgumentException](
      Snapshots.dropColumn(spark, table, "v"))
    assert(e2.getMessage.contains("pos"))
    // unconstrained columns still rename freely
    Snapshots.renameColumn(spark, table, "id", "doc_id")
    assert(Snapshots.read(spark, table).columns.contains("doc_id"))
  }

  test("SQL surface: ALTER GRAFT TABLE ADD/DROP CONSTRAINT, INSERT gated") {
    val table = mkTable("con-sql", (1L, "a", 1.0), (2L, "b", 2.0))
    LakeSql.register(spark, "cont", table, "day")

    val v = spark.sql(
      "ALTER GRAFT TABLE cont ADD CONSTRAINT nonneg CHECK (v >= 0.0)")
      .collect().head.getLong(0)
    assert(v == 2L)
    intercept[Exception](spark.sql(
      "INSERT INTO cont SELECT 3L AS id, 'c' AS day, -1.0 AS v").collect())
    assert(rowsOf(table) == Seq((1L, "a", 1.0), (2L, "b", 2.0)))

    spark.sql("ALTER GRAFT TABLE cont DROP CONSTRAINT nonneg").collect()
    spark.sql("INSERT INTO cont SELECT 3L AS id, 'c' AS day, -1.0 AS v").collect()
    assert(rowsOf(table) == Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", -1.0)))

    // malformed check text fails AT PARSE, before any command exists
    intercept[Exception](spark.sql(
      "ALTER GRAFT TABLE cont ADD CONSTRAINT broken CHECK (v >=)"))
  }
}
