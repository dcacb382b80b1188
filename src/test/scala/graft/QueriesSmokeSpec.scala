package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs on sf0.001, returns rows, and its oracle
  * wiring is consistent (one spec per operator entry — the sbt-test
  * analog of the driver's t1/t2 gates). */
class QueriesSmokeSpec extends AnyFunSuite with SparkFixture {

  test("registry is consistent") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Queries whose correct fixture output is empty: dd5c's near-dup
    * threshold (cos ≥ 0.9) exceeds the fixture's max pairwise cosine
    * (≈0.48, TESTDATA facts) — its row signal lives in DedupSpec's
    * planted-dup fixture instead. */
  private val emptyOnFixture = Set("dd5c_embedding_lsh_dup")

  SparkEntry.all.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      val df = q.fn(spark, Sf)
      if (emptyOnFixture(q.name)) assert(df.count() == 0, s"${q.name} expected empty on fixture")
      else assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }
}
