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

  test("a failing declarative contract blocks gold materialization") {
    import graft.ops.quality._
    val base = tmp("medallion-fail")
    // symbol's domain in silver is the 5 event types — a contract that
    // only accepts 'click' must fail the gate BEFORE gold is built
    val strict = Seq(TableContract("silver", Seq(
      ColumnSpec("trade_id", Seq(Unique, NotNull)),
      ColumnSpec("symbol", Seq(AcceptedValues(Seq("click")))))))
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Medallion.run(spark, Sf, base, contract = strict)
    }
    assert(ex.getMessage.contains("gold not built"))
    assert(new java.io.File(s"$base/silver").exists, "silver should exist")
    assert(!new java.io.File(s"$base/gold").exists,
      "gold must not be materialized when the contract fails")
  }
}
