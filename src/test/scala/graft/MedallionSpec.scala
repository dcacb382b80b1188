package graft

import org.scalatest.funsuite.AnyFunSuite

class MedallionSpec extends AnyFunSuite with SparkFixture {

  test("bronze→silver→gold→check pipeline runs end-to-end and gates clean") {
    val base = tmp("medallion")
    val s = graft.ops.Medallion.run(spark, Sf, base)
    assert(s.bronzeRows == 1000)
    assert(s.silverRows == 1000) // event_id is unique in fixtures
    assert(s.goldRows > 0)
    assert(s.uniqueViolations == 0 && s.nullViolations == 0)
    // gold is day-partitioned (Q5-healable layout)
    val parts = new java.io.File(s"$base/gold").listFiles()
      .count(_.getName.startsWith("event_date="))
    assert(parts == 30)
  }
}
