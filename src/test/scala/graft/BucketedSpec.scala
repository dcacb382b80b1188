package graft

import graft.ops.gold.Bucketed
import org.scalatest.funsuite.AnyFunSuite

class BucketedSpec extends AnyFunSuite with SparkFixture {

  test("bucketed equi-join plans without a shuffle exchange") {
    // force a sort-merge join so bucketing (not broadcast) carries it —
    // on an ISOLATED session: suites run in parallel against one shared
    // session, and a global broadcast-threshold window would silently
    // reshape every concurrently-planning suite's joins (r14 flake find)
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val join = Bucketed.bucketedJoin(s, Sf)
    val plan = join.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(join.count() > 0)
  }

  test("bucketed aggregate matches the raw-table result") {
    val t = graft.engine.Tables(spark, Sf)
    val raw = t.lineitem
      .join(t.orders, org.apache.spark.sql.functions.col("l_orderkey") ===
        org.apache.spark.sql.functions.col("o_orderkey"))
      .count()
    assert(Bucketed.bucketedJoin(spark, Sf).count() == raw)
  }
}
