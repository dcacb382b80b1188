package graft.ops.gold

import graft.engine.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sorts / limits / top-k / set operations (SURVEY §2.7). Top-k plans as
  * TakeOrderedAndProject (per-partition heap + driver merge of k rows —
  * no global sort even at 100 TB). Set ops are distinct-shuffles on the
  * full row.
  */
object SortSetOps {

  /** O1 + top-k: ORDER BY ... LIMIT with a unique tie-break. */
  def topk(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  val topkOracle: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** O2: union-all across per-source frames (`pd.concat` ≅ unionByName). */
  def unionAll(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), lit("signup_feed").as("src"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), lit("error_feed").as("src"))
    signups.unionByName(errors).orderBy("event_id")
  }

  val unionAllOracle: String =
    """SELECT event_id, user_id, 'signup_feed' AS src FROM events WHERE event_type = 'signup'
      |UNION ALL
      |SELECT event_id, user_id, 'error_feed' AS src FROM events WHERE event_type = 'error'
      |ORDER BY event_id""".stripMargin

  /** INTERSECT (distinct) — customers that did place orders, by key. */
  def intersectKeys(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.select(col("c_custkey").as("custkey"))
      .intersect(t.orders.select(col("o_custkey").as("custkey")))
      .orderBy("custkey")
  }

  val intersectKeysOracle: String =
    """SELECT c_custkey AS custkey FROM customer
      |INTERSECT
      |SELECT o_custkey AS custkey FROM orders
      |ORDER BY custkey""".stripMargin

  /** EXCEPT (distinct) — customer keys without a top-decile order
    * (filtered right side keeps the difference non-empty at every SF). */
  def exceptKeys(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.select(col("c_custkey").as("custkey"))
      .except(t.orders.filter(col("o_totalprice") > 450000.0)
        .select(col("o_custkey").as("custkey")))
      .orderBy("custkey")
  }

  val exceptKeysOracle: String =
    """SELECT c_custkey AS custkey FROM customer
      |EXCEPT
      |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000.0
      |ORDER BY custkey""".stripMargin

  /** UNION (distinct): overlapping key sets unioned with dedup. */
  def unionDistinct(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders.filter(col("o_totalprice") > 300000.0).select(col("o_custkey").as("custkey"))
      .union(t.orders.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey")))
      .distinct()
      .orderBy("custkey")
  }

  val unionDistinctOracle: String =
    """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000.0
      |UNION
      |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY custkey""".stripMargin

  /** EXCEPT ALL — multiset difference: each customer key survives
    * `max(orders_placed − high_value_orders, 0)` times. Plans as a
    * count-per-row aggregate + generate (Spark's ExceptAll rewrite),
    * not a row-by-row anti loop. */
  def exceptAllKeys(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders.select(col("o_custkey").as("custkey"))
      .exceptAll(t.orders.filter(col("o_totalprice") > 300000.0)
        .select(col("o_custkey").as("custkey")))
      .orderBy("custkey")
  }

  val exceptAllKeysOracle: String =
    """SELECT o_custkey AS custkey FROM orders
      |EXCEPT ALL
      |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000.0
      |ORDER BY custkey""".stripMargin

  /** INTERSECT ALL — multiset intersection: a key appears
    * `min(n_left, n_right)` times. */
  def intersectAllKeys(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders.select(col("o_custkey").as("custkey"))
      .intersectAll(t.orders.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey")))
      .orderBy("custkey")
  }

  val intersectAllKeysOracle: String =
    """SELECT o_custkey AS custkey FROM orders
      |INTERSECT ALL
      |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY custkey""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("o1_topk", topkOracle)(topk),
    QueryDef.sql("o2_union_all", unionAllOracle)(unionAll),
    QueryDef.sql("o5_union_distinct", unionDistinctOracle)(unionDistinct),
    QueryDef.sql("o3_intersect", intersectKeysOracle)(intersectKeys),
    QueryDef.sql("o4_except", exceptKeysOracle)(exceptKeys),
    QueryDef.sql("o6_except_all", exceptAllKeysOracle)(exceptAllKeys),
    QueryDef.sql("o7_intersect_all", intersectAllKeysOracle)(intersectAllKeys))
}
