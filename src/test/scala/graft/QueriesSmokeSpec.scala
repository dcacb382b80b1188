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

  SparkEntry.all.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      val df = q.fn(spark, Sf)
      assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }
}
