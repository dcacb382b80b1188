package graft

import graft.engine.Exact
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** r17 optimization: [[Exact.fixSum]] replaced [[Exact.decSum]] on the
  * gold/event-time money aggregates (AggCostProbe: three decimal sums
  * cost 1.44 s vs 0.26 s fixed-point over one 600k-row scan task at
  * sf0.1). The swap is sound ONLY if the two paths are bit-identical on
  * the input domains involved — these tests pin that equality on every
  * fixture money column, every touched query shape, and a randomized
  * money domain (including nulls, negatives, group-level all-null).
  */
class FixSumSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val t = graft.engine.Tables(spark, Sf)

  private def assertEqual(df: org.apache.spark.sql.DataFrame,
                          dec: org.apache.spark.sql.Column,
                          fix: org.apache.spark.sql.Column,
                          keys: Seq[String]): Unit = {
    val diffs = df.groupBy(keys.map(col): _*)
      .agg(dec.as("dec"), fix.as("fix"))
      .filter(col("dec") =!= col("fix") ||
        (col("dec").isNull !== col("fix").isNull))
      .count()
    assert(diffs === 0L)
  }

  test("fixSum == decSum on every fixture money column") {
    val li = t.lineitem
    assertEqual(li, Exact.decSum(col("l_quantity")),
      Exact.fixSum(col("l_quantity"), 2), Seq("l_returnflag", "l_linestatus"))
    assertEqual(li, Exact.decSum(col("l_extendedprice")),
      Exact.fixSum(col("l_extendedprice"), 2), Seq("l_returnflag", "l_linestatus"))
    assertEqual(li,
      Exact.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
      Exact.fixSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4),
      Seq("l_returnflag", "l_linestatus"))
    assertEqual(li, Exact.decSum(col("l_quantity") * col("l_quantity")),
      Exact.fixSum(col("l_quantity") * col("l_quantity"), 4), Seq("l_returnflag"))
    assertEqual(t.orders, Exact.decSum(col("o_totalprice")),
      Exact.fixSum(col("o_totalprice"), 2), Seq("o_orderstatus"))
    assertEqual(t.events, Exact.decSum(col("value")),
      Exact.fixSum(col("value"), 2), Seq("event_type"))
  }

  test("fixSumRaw == decSumRaw (type and value) for Revenue's notional") {
    val notional =
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("notional")
    val dec = t.lineitem.select(col("l_returnflag").as("k"), notional)
      .groupBy("k").agg(Exact.decSumRaw(col("notional")).as("s"))
    val fix = t.lineitem.select(col("l_returnflag").as("k"), notional)
      .groupBy("k").agg(Exact.fixSumRaw(col("notional"), 4).as("s"))
    assert(dec.schema("s").dataType === fix.schema("s").dataType) // DECIMAL(25,6)
    val d = dec.collect().map(r => r.get(0) -> r.get(1)).toMap
    val f = fix.collect().map(r => r.get(0) -> r.get(1)).toMap
    assert(d === f)
  }

  test("fixSum == decSum on randomized money domains (nulls, negatives)") {
    // 2-decimal money up to 1e6 in magnitude, 4-decimal products up to
    // 1e5, ~5% nulls, one group entirely null
    val money2 = Gen.chooseNum(-100000000L, 100000000L).map(c => c / 100.0)
    val money4 = Gen.chooseNum(-1000000000L, 1000000000L).map(c => c / 10000.0)
    def rows(g: Gen[Double], n: Int): Seq[(Int, Option[Double])] =
      (0 until n).map { i =>
        val v = if (i % 20 == 19) None
                else g.apply(Gen.Parameters.default, Seed(i.toLong))
        (if (i % 100 == 0) 9999 else i % 7, v) // group 9999 gets ~1% of rows
      } ++ Seq((12345, None), (12345, None)) // an all-null group
    val df2 = rows(money2, 5000).toDF("k", "v")
    assertEqual(df2, Exact.decSum(col("v")), Exact.fixSum(col("v"), 2), Seq("k"))
    val df4 = rows(money4, 5000).toDF("k", "v")
    assertEqual(df4, Exact.decSum(col("v")), Exact.fixSum(col("v"), 4), Seq("k"))
  }

  /** r18 (VERDICT #2): the two-level salted form replaced single-level
    * fixSum at the low-cardinality d=4 sites (q1/j4/s16) whose per-group
    * LONG bound fell below the 100 TB design point. Equality holds by
    * integer reassociation; pinned here on fixtures and the randomized
    * domain, against BOTH decSum and single-level fixSum. */
  private def twoLevel(df: org.apache.spark.sql.DataFrame, v: org.apache.spark.sql.Column,
                       d: Int, keys: Seq[String]): org.apache.spark.sql.DataFrame =
    df.groupBy((keys.map(col) :+ Exact.saltCol(col("salt_key")).as("_salt")): _*)
      .agg(Exact.fixSumPart(v, d).as("p"))
      .groupBy(keys.map(col): _*)
      .agg(Exact.fixSumCombine(col("p"), d).as("s"))

  test("two-level fixSumPart/Combine == decSum == fixSum (fixtures + random)") {
    val li = t.lineitem.withColumn("salt_key", col("l_orderkey"))
    val keys = Seq("l_returnflag", "l_linestatus")
    val dp = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val two = twoLevel(li, dp, 4, keys)
    val one = li.groupBy(keys.map(col): _*)
      .agg(Exact.fixSum(dp, 4).as("s"))
    val dec = li.groupBy(keys.map(col): _*)
      .agg(Exact.decSum(dp).as("s"))
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.get(0), r.get(1)) -> r.get(2)).toMap
    assert(m(two) === m(dec))
    assert(m(two) === m(one))

    // randomized 4-decimal domain incl. nulls and an all-null group
    val money4 = Gen.chooseNum(-1000000000L, 1000000000L).map(c => c / 10000.0)
    val rows = (0 until 5000).map { i =>
      val v = if (i % 20 == 19) None
              else Some(money4.apply(Gen.Parameters.default, Seed(i.toLong)).get)
      (if (i % 100 == 0) 9999 else i % 7, i.toLong, v)
    } ++ Seq((12345, -1L, None), (12345, -2L, None))
    val df = rows.toDF("k", "salt_key", "v")
    val t2 = twoLevel(df, col("v"), 4, Seq("k")).collect()
      .map(r => r.get(0) -> r.get(1)).toMap
    val t1 = df.groupBy("k").agg(Exact.decSum(col("v")).as("s")).collect()
      .map(r => r.get(0) -> r.get(1)).toMap
    assert(t2 === t1)
  }

  test("fixSum diverges on >scale-decimal inputs (the documented ban)") {
    // 1.0000025's shortest repr rounds HALF_UP to 1.000003 in the
    // decimal cast, but its binary value sits below the midpoint, so
    // the fixed-point path yields 1.000002 — the reason fixSum is
    // reserved for inputs exact at <= `decimals` digits.
    val df = Seq((1, 1.0000025)).toDF("k", "v")
    val dec = df.groupBy("k").agg(Exact.decSum(col("v"))).collect().head.getDouble(1)
    val fix = df.groupBy("k").agg(Exact.fixSum(col("v"), 6)).collect().head.getDouble(1)
    assert(dec === 1.000003 && fix === 1.000002)
  }
}
