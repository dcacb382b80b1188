package graft

import graft.engine.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PlanRulesSpec extends AnyFunSuite with SparkFixture {

  test("to_date equality on normalized events ts pushes a nanos range to parquet") {
    val df = Tables(spark, Sf).events
      .filter(to_date(col("ts")) === lit("2024-01-15").cast("date"))
      .select("event_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(ts,1705276800000000000)"),
      s"expected pushed range filter in:\n$plan")
    assert(plan.contains("LessThan(ts,1705363200000000000)"), plan)
    // and the rewrite preserves the result
    val viaRule = df.count()
    val manual = graft.ops.silver.Staging.dateParamScan(spark, Sf).count()
    assert(viaRule == manual)
  }

  test("rule leaves other date predicates untouched") {
    val t = Tables(spark, Sf)
    val n = t.lineitem
      .filter(to_date(col("l_shipdate")) === lit("1997-10-31").cast("date"))
      .count()
    assert(n >= 0) // no rewrite applies (not the nanos chain); must not break
  }

  test("GroupedTopK plans as partial/final pair around a survivors-only exchange") {
    val df = graft.ops.gold.Windows.topkPerGroupNative(spark, Sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("GroupedTopKPartial"), plan)
    assert(plan.contains("GroupedTopKFinal"), plan)
    // the exchange between the pair sits ABOVE the partial node, so the
    // shuffled rows are the bounded survivors, not the full input
    val lines = plan.split("\n")
    val partialIdx = lines.indexWhere(_.contains("GroupedTopKPartial"))
    val finalIdx = lines.indexWhere(_.contains("GroupedTopKFinal"))
    val between = lines.slice(finalIdx, partialIdx)
    assert(finalIdx < partialIdx &&
      between.exists(l => l.contains("Exchange hashpartitioning(c_mktsegment")), plan)
  }

  test("GroupedTopK matches the window-form top-k row for row") {
    val window = graft.ops.gold.Windows.topkPerGroup(spark, Sf).collect().toSeq
    val native = graft.ops.gold.Windows.topkPerGroupNative(spark, Sf).collect().toSeq
    assert(window == native)
  }

  test("tx5 bigram profile runs through the native GroupedTopK pair") {
    val df = graft.ops.ext.TextAnalysis.bigramProfile(spark, Sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("GroupedTopKPartial"), plan)
    assert(plan.contains("GroupedTopKFinal"), plan)
    // per-group survivor bound: exactly ≤10 bigrams per language
    val perLang = df.groupBy("lang").count().collect()
    assert(perLang.nonEmpty && perLang.forall(_.getLong(1) <= 10))
  }
}
