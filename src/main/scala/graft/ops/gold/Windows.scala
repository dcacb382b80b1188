package graft.ops.gold

import graft.engine.{Exact, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window functions (SURVEY §2.6 — absent in the reference, exposed as
  * first-class capability). Every window is keyed (partitionBy), so the
  * physical plan is one hash exchange + in-partition sort: no global sort,
  * scales with the key cardinality. Running sums use exact decimal so the
  * oracle's prefix sums agree bit-for-bit.
  */
object Windows {

  /** Ranking + per-group top-k: top 3 orders by value per market segment.
    * customer is SF-scaling, so no static broadcast hint — AQE converts
    * the join to broadcast when its measured size permits. */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val joined = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    joined
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_mktsegment"), col("rk").cast("bigint").as("rk"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy("c_mktsegment", "rk")
  }

  val topkPerGroupOracle: String =
    """SELECT c_mktsegment, CAST(rk AS BIGINT) AS rk, o_orderkey, o_totalprice FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY c_mktsegment
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |) WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin

  /** w1b: the same top-3-per-segment through the native
    * [[graft.plans.GroupedTopK]] operator — bounded per-group heaps
    * partial/final around a survivors-only exchange, instead of the
    * full-data exchange + per-partition sort the window form pays. The
    * rank is recomputed afterwards over the ≤ k·|groups| survivors
    * (negligible). Shares w1's oracle: output must be row-identical. */
  def topkPerGroupNative(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val joined = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "o_orderkey", "o_totalprice")
    val survivors = graft.plans.GroupedTopK(
      joined, Seq("c_mktsegment"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 3)
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    survivors
      .withColumn("rk", row_number().over(w))
      .select(col("c_mktsegment"), col("rk").cast("bigint").as("rk"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy("c_mktsegment", "rk")
  }

  /** lag/lead analytics per user over event time. */
  def lagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables(spark, dir).events
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_value", lead(col("value"), 1).over(w))
      .withColumn("prev_gap_ms", Exact.epochMs(col("ts")) - lag(Exact.epochMs(col("ts")), 1).over(w))
      .select("event_id", "user_id", "value", "prev_value", "next_value", "prev_gap_ms")
      .orderBy("event_id")
  }

  val lagLeadOracle: String =
    """SELECT event_id, user_id, value,
      |  lag(value, 1) OVER w AS prev_value,
      |  lead(value, 1) OVER w AS next_value,
      |  epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER w AS prev_gap_ms
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  /** Running (prefix) sum per user — exact decimal accumulation. */
  def runningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir).events
      .withColumn("running_value",
        sum(col("value").cast(DecimalType(25, 6))).over(w)
          .cast(DecimalType(25, 6)).cast("double"))
      .select("event_id", "user_id", "running_value")
      .orderBy("event_id")
  }

  val runningSumOracle: String =
    """SELECT event_id, user_id,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(25,6)) AS DOUBLE) AS running_value
      |FROM events ORDER BY event_id""".stripMargin

  /** RANGE frame: trailing 1-hour sum per user, ordered by epoch-ms so
    * both engines use an identical numeric range frame. */
  def rangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val withMs = Tables(spark, dir).events
      .withColumn("ts_ms", Exact.epochMs(col("ts")))
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"))
      .rangeBetween(-3600000L, 0L)
    withMs
      .withColumn("trailing_1h",
        sum(col("value").cast(DecimalType(25, 6))).over(w)
          .cast(DecimalType(25, 6)).cast("double"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .select("event_id", "user_id", "ts_ms", "trailing_1h", "n_1h")
      .orderBy("event_id")
  }

  val rangeFrameOracle: String =
    """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w AS DECIMAL(25,6)) AS DOUBLE) AS trailing_1h,
      |  COUNT(*) OVER w AS n_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
      |             RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** w5: the distribution-ranking family — dense_rank, percent_rank,
    * cume_dist, ntile — per order priority by order value. One hash
    * exchange on the partition key + in-partition sort serves all four
    * functions (a single Window physical node); ties are broken by
    * o_orderkey so every rank is engine-deterministic. percent_rank and
    * cume_dist are exact integer ratios evaluated in double — identical
    * bit patterns cross-engine — rounded to 6 for the compared output. */
  def rankingSuite(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables(spark, dir).orders
      .withColumn("drk", dense_rank().over(w).cast("bigint"))
      .withColumn("prk", round(percent_rank().over(w), 6))
      .withColumn("cd", round(cume_dist().over(w), 6))
      .withColumn("quartile", ntile(4).over(w).cast("bigint"))
      .select("o_orderkey", "o_orderpriority", "o_totalprice",
        "drk", "prk", "cd", "quartile")
      .orderBy("o_orderkey")
  }

  val rankingSuiteOracle: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
      |  CAST(dense_rank() OVER w AS BIGINT) AS drk,
      |  round(percent_rank() OVER w, 6) AS prk,
      |  round(cume_dist() OVER w, 6) AS cd,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** w6: ORDERED-STAGE FUNNEL — the product-analytics kernel (what
    * fraction of users progress view → click → purchase, in that
    * order?). Naive funnels re-scan per stage; this is ONE pass: per
    * user, stage timestamps fold as chained conditional minima —
    * `v = min ts(view)`, `c = min ts(click, ts ≥ v)`,
    * `p = min ts(purchase, ts ≥ c)` — each a plain aggregate over the
    * previous stage's scalar, so the whole funnel is two keyed
    * aggregates and two bare-key broadcast-joinable re-attachments on
    * the SAME user_id partitioning (no window sort, no per-stage
    * scans; min is max-decomposable so every agg is map-side
    * combinable). Ordering uses (ts, event_id) lexicographic packing
    * — ns ties broken identically in both engines. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.engine.Caching.persist(
      Tables(spark, dir).eventsNs
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), col("event_type"),
          // lexicographic struct compare == (ts, event_id) ordering in
          // both engines; min over it is a plain mergeable aggregate
          struct(col("ts"), col("event_id")).as("k")))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("k")).as("vk"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("k") >= col("vk"))
      .groupBy("user_id").agg(min(col("k")).as("ck"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("k") >= col("ck"))
      .groupBy("user_id").agg(min(col("k")).as("pk"))
    Tables(spark, dir).eventsNs.select("user_id").distinct()
      .join(v, Seq("user_id"), "left_outer")
      .join(c, Seq("user_id"), "left_outer")
      .join(p, Seq("user_id"), "left_outer")
      .select(
        col("user_id"),
        col("vk").isNotNull.as("reached_view"),
        col("ck").isNotNull.as("reached_click"),
        col("pk").isNotNull.as("reached_purchase"),
        expr("vk.ts div 1000000").as("view_ms"),
        expr("ck.ts div 1000000").as("click_ms"),
        expr("pk.ts div 1000000").as("purchase_ms"))
      .orderBy("user_id")
  }

  val funnelOracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, {'tns': epoch_ns(ts), 'eid': event_id} AS k
      |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      |v AS (
      |  SELECT user_id, min(k) AS vk FROM ev
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT ev.user_id, min(k) AS ck
      |  FROM ev JOIN v ON ev.user_id = v.user_id
      |  WHERE event_type = 'click' AND k >= vk GROUP BY 1),
      |p AS (
      |  SELECT ev.user_id, min(k) AS pk
      |  FROM ev JOIN c ON ev.user_id = c.user_id
      |  WHERE event_type = 'purchase' AND k >= ck GROUP BY 1),
      |u AS (SELECT DISTINCT user_id FROM events)
      |SELECT u.user_id AS user_id,
      |  (vk IS NOT NULL) AS reached_view,
      |  (ck IS NOT NULL) AS reached_click,
      |  (pk IS NOT NULL) AS reached_purchase,
      |  (vk).tns // 1000000 AS view_ms,
      |  (ck).tns // 1000000 AS click_ms,
      |  (pk).tns // 1000000 AS purchase_ms
      |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
      |       LEFT JOIN p USING (user_id)
      |ORDER BY user_id""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("w1_topk_per_group", topkPerGroupOracle)(topkPerGroup),
    QueryDef.sql("w1b_topk_native", topkPerGroupOracle)(topkPerGroupNative),
    QueryDef.sql("w2_lag_lead", lagLeadOracle)(lagLead),
    QueryDef.sql("w3_running_sum", runningSumOracle)(runningSum),
    QueryDef.sql("w4_range_frame", rangeFrameOracle)(rangeFrame),
    QueryDef.sql("w5_ranking_suite", rankingSuiteOracle)(rankingSuite),
    QueryDef.sql("w6_funnel", funnelOracle)(funnel))
}
