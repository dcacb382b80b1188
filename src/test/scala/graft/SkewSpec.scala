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
  }
}
