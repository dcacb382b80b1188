package graft.ops.ext

import graft.engine.{Caching, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph importance scoring — the crawl-side quality signal of a
  * pretraining pipeline (RefinedWeb/Common-Crawl-style pipelines rank
  * hosts by link centrality before any text is fetched; the reference
  * has no graph operator at all, so this is a beyond-reference
  * capability row alongside dd6's connected components).
  *
  * PageRank is the canonical such score. The engine shape is the
  * textbook iterative one: an EDGE-LIST table (never an adjacency
  * matrix), per-round `join(ranks) → groupBy(dst).sum` — one shuffle
  * join + one aggregation per round, every aggregate map-side
  * combinable, no driver-side graph state beyond the node count. The
  * fixture graph is the customer↔supplier co-purchase bipartite graph
  * (both directions materialized, so there are no dangling nodes and no
  * leaked mass term to carry).
  *
  * Arithmetic is EXACT fixed-point (the [[Similarity.KmQ]] discipline):
  * total mass `M = 10¹²` is distributed in integer quanta and every
  * step — contribution `r div deg`, damping `(17·s) div 20` (= 0.85),
  * teleport `(3·(M div N)) div 20` (= 0.15/N) — is a BIGINT truncating
  * division both engines implement identically. Float PageRank would
  * hash-mismatch across engines (addition order); integer PageRank is
  * bit-deterministic under any partitioning.
  */
object GraphRank {

  /** Supplier-node id offset (keys share one BIGINT id space). */
  val NodeOff = 1000000000L
  /** Total rank mass in integer quanta (10¹² ⇒ per-node error from
    * truncation is ≤ 20 quanta/round — 11 orders below the signal). */
  val Mass = 1000000000000L
  /** Unrolled power-iteration rounds (fixed, so the plan is static and
    * the oracle restates the same three rounds as chained CTEs). */
  val Rounds = 3

  /** One PageRank power-iteration chain over arbitrary `nodes(id)` /
    * `edges(src, dst)` frames (spec entry). `nodeCount` is the only
    * driver-side scalar (an O(1) metadata count). */
  private[graft] def pageRankOf(
      nodes: DataFrame, edges: DataFrame, nodeCount: Long, rounds: Int): DataFrame = {
    val e = Caching.persist(edges)
    val deg = Caching.persist(e.groupBy("src").agg(count(lit(1)).as("d")))
    val r0 = Mass / nodeCount
    val base = (3L * r0) / 20L
    var ranks = nodes.withColumn("r", lit(r0))
    for (_ <- 1 to rounds) {
      val acc = e.join(ranks.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("id"), expr("r div d").as("contrib"))
        .groupBy("id").agg(sum("contrib").as("acc"))
      ranks = nodes.join(acc, Seq("id"), "left_outer")
        .select(col("id"),
          (lit(base) + expr("(17 * coalesce(acc, 0L)) div 20")).as("r"))
    }
    ranks
  }

  /** pr1: 3-round fixed-point PageRank over the customer↔supplier
    * co-purchase graph. A customer with no orders receives exactly the
    * teleport base; hub suppliers accumulate rank proportional to their
    * buyer fan-in. */
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val pairs = t.orders.select("o_orderkey", "o_custkey")
      .join(t.lineitem.select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), (col("l_suppkey") + NodeOff).as("s"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
    val nodes = t.customer.select(col("c_custkey").as("id"))
      .unionByName(t.supplier.select((col("s_suppkey") + NodeOff).as("id")))
    // node count is dim-table metadata (|customer| + |supplier|), not a
    // graph traversal — the one scalar the integer arithmetic needs
    val n = nodes.count()
    pageRankOf(nodes, edges, n, Rounds)
      .select(col("id").as("node_id"), col("r").as("rank_q"))
      .orderBy("node_id")
  }

  lazy val pageRankOracle: String = {
    val m = Mass
    def round(prev: String, out: String): String =
      s"""$out AS (
        |  SELECT n.id,
        |         CAST(cst.base + (17 * coalesce(s.acc, 0)) // 20 AS BIGINT) AS r
        |  FROM nodes n
        |  LEFT JOIN (
        |    SELECT e.dst AS id, CAST(sum(p.r // deg.d) AS BIGINT) AS acc
        |    FROM edges e JOIN $prev p ON p.id = e.src JOIN deg ON deg.src = e.src
        |    GROUP BY e.dst) s ON n.id = s.id
        |  CROSS JOIN cst)""".stripMargin
    s"""WITH pairs AS (
      |  SELECT DISTINCT o.o_custkey AS c, $NodeOff + l.l_suppkey AS s
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      |edges AS (
      |  SELECT c AS src, s AS dst FROM pairs
      |  UNION ALL SELECT s, c FROM pairs),
      |nodes AS (
      |  SELECT c_custkey AS id FROM customer
      |  UNION ALL SELECT $NodeOff + s_suppkey FROM supplier),
      |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
      |cst AS (
      |  SELECT $m // count(*) AS r0, (3 * ($m // count(*))) // 20 AS base
      |  FROM nodes),
      |r0 AS (SELECT id, cst.r0 AS r FROM nodes CROSS JOIN cst),
      |${round("r0", "r1")},
      |${round("r1", "r2")},
      |${round("r2", "r3")}
      |SELECT id AS node_id, r AS rank_q FROM r3 ORDER BY node_id""".stripMargin
  }

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("pr1_pagerank", pageRankOracle)(pageRank))
}
