package graft.ops.gold

import graft.engine.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality assertion operators (SURVEY §2.11 Q3): the dbt
  * `unique` / `not_null` tests as first-class DataFrame ops returning the
  * violating rows (empty result = test passed). Exercised here against a
  * deliberately-corrupted union so the violation path is non-vacuous.
  */
object Assertions {

  /** Rows violating key uniqueness: `SELECT key, n FROM t GROUP BY key
    * HAVING count(*) > 1` — the dbt-unique compile shape. */
  def uniqueViolations(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Null-count per required column — the dbt-not_null compile shape,
    * as one aggregate pass over all columns. */
  def notNullReport(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** q3a: unique-key check over events with the first 50 keys duplicated
    * (re-ingest simulation) — exactly those keys must be reported. */
  def uniqueCheck(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events.select("event_id", "user_id")
    val corrupted = ev.unionByName(ev.filter(col("event_id") < 50))
    uniqueViolations(corrupted, "event_id").orderBy("event_id")
  }

  val uniqueCheckOracle: String =
    """WITH corrupted AS (
      |  SELECT event_id, user_id FROM events
      |  UNION ALL
      |  SELECT event_id, user_id FROM events WHERE event_id < 50
      |)
      |SELECT event_id, count(*) AS n FROM corrupted
      |GROUP BY event_id HAVING count(*) > 1 ORDER BY event_id""".stripMargin

  /** q3b: not-null report over events plus one injected all-null row. */
  def notNullCheck(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("event_id"), col("user_id"), col("event_type"))
    val nullRow = ev.sparkSession.sql(
      "SELECT CAST(NULL AS BIGINT) event_id, CAST(NULL AS BIGINT) user_id, CAST(NULL AS STRING) event_type")
    notNullReport(ev.unionByName(nullRow), Seq("event_id", "user_id", "event_type"))
  }

  val notNullCheckOracle: String =
    """WITH t AS (
      |  SELECT event_id, user_id, event_type FROM events
      |  UNION ALL
      |  SELECT NULL, NULL, NULL
      |)
      |SELECT CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_id,
      |       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_id,
      |       CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_type
      |FROM t""".stripMargin

  /** Rows whose column value falls outside a literal accepted set — the
    * dbt-accepted_values compile shape for the config-declared (small,
    * literal) domain: a codegen'd `IN` filter, no driver round-trip. */
  def acceptedValuesViolations(df: DataFrame, column: String, accepted: Seq[String]): DataFrame =
    df.filter(!col(column).isin(accepted: _*) || col(column).isNull)

  /** Accepted set as a DataFrame (derived or reference-table domains):
    * a left-anti join on the value column. NULL join keys never match,
    * so null-valued rows fall through as violations — the same semantics
    * as the literal form — and the domain never materializes on the
    * driver, which is what survives a high-cardinality accepted set at
    * 100 TB (AQE broadcasts the domain side when it is actually small). */
  def acceptedValuesViolations(df: DataFrame, column: String, accepted: DataFrame): DataFrame =
    df.join(
      accepted.select(col(accepted.columns.head).as(column)).distinct(),
      Seq(column), "left_anti")

  /** q3c: accepted-values check over event_type with two rogue rows
    * injected (typo + null) — exactly those must be reported. The
    * accepted domain is the pre-corruption distinct set, kept as a
    * DataFrame (no collect anywhere in the path). */
  def acceptedValuesCheck(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events.select("event_id", "event_type")
    val accepted = ev.select("event_type").distinct()
    val rogue = ev.sparkSession.sql(
      """SELECT * FROM VALUES (900001L, 'cliick'), (900002L, CAST(NULL AS STRING))
        |AS t(event_id, event_type)""".stripMargin)
    acceptedValuesViolations(ev.unionByName(rogue), "event_type", accepted)
      .select("event_id", "event_type")
      .orderBy(col("event_id"))
  }

  val acceptedValuesCheckOracle: String =
    """WITH t AS (
      |  SELECT event_id, event_type FROM events
      |  UNION ALL SELECT 900001, 'cliick'
      |  UNION ALL SELECT 900002, NULL
      |)
      |SELECT event_id, event_type FROM t
      |WHERE event_type IS NULL
      |   OR event_type NOT IN (SELECT DISTINCT event_type FROM events)
      |ORDER BY event_id""".stripMargin

  /** Child keys with no parent — the dbt-relationships (referential
    * integrity) compile shape: a left-anti join on the parent key. */
  def relationshipViolations(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
      Seq(childKey), "left_anti")

  /** q3d: referential check lineitem.l_orderkey → orders.o_orderkey with
    * a synthetic orphan range injected — exactly the orphans report. */
  def relationshipCheck(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val li = t.lineitem.select("l_orderkey", "l_linenumber")
    val orphans = li.filter(col("l_orderkey") <= 32)
      .select((col("l_orderkey") + lit(900000000L)).as("l_orderkey"), col("l_linenumber"))
    relationshipViolations(li.unionByName(orphans), "l_orderkey", t.orders, "o_orderkey")
      .groupBy("l_orderkey").agg(count(lit(1)).as("n_orphans"))
      .orderBy("l_orderkey")
  }

  val relationshipCheckOracle: String =
    """WITH orphans AS (
      |  SELECT l_orderkey + 900000000 AS l_orderkey, l_linenumber
      |  FROM lineitem WHERE l_orderkey <= 32
      |),
      |child AS (
      |  SELECT l_orderkey, l_linenumber FROM lineitem
      |  UNION ALL SELECT l_orderkey, l_linenumber FROM orphans
      |)
      |SELECT l_orderkey, count(*) AS n_orphans FROM child
      |WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
      |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  /** q3e: the declarative quality contract (dbt schema.yml analog,
    * [[graft.ops.quality.Contract]]) compiled and evaluated as one
    * report — an events contract whose accepted-values domain
    * deliberately excludes 'error' (non-vacuous violation count) plus a
    * cross-table relationships check, all in a single union plan. */
  def contractReport(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.quality._
    val contracts = Seq(
      TableContract("events", Seq(
        ColumnSpec("event_id", Seq(Unique, NotNull)),
        ColumnSpec("user_id", Seq(NotNull)),
        ColumnSpec("event_type", Seq(NotNull,
          AcceptedValues(Seq("click", "purchase", "signup", "view")))))),
      TableContract("lineitem", Seq(
        ColumnSpec("l_orderkey", Seq(Relationship("orders", "o_orderkey"))))))
    val t = Tables(spark, dir)
    Contract.report(contracts, {
      case "events" => t.events
      case "lineitem" => t.lineitem
      case "orders" => t.orders
    })
  }

  val contractReportOracle: String =
    """SELECT * FROM (
      |  SELECT 'events' AS table_name, 'event_id' AS column_name, 'not_null' AS check_name,
      |         (SELECT count(*) FROM events WHERE event_id IS NULL) AS n_violations
      |  UNION ALL
      |  SELECT 'events', 'event_id', 'unique',
      |         (SELECT count(*) FROM (SELECT event_id FROM events GROUP BY event_id HAVING count(*) > 1))
      |  UNION ALL
      |  SELECT 'events', 'user_id', 'not_null',
      |         (SELECT count(*) FROM events WHERE user_id IS NULL)
      |  UNION ALL
      |  SELECT 'events', 'event_type', 'not_null',
      |         (SELECT count(*) FROM events WHERE event_type IS NULL)
      |  UNION ALL
      |  SELECT 'events', 'event_type', 'accepted_values',
      |         (SELECT count(*) FROM events
      |          WHERE event_type IS NULL OR event_type NOT IN ('click','purchase','signup','view'))
      |  UNION ALL
      |  SELECT 'lineitem', 'l_orderkey', 'relationships',
      |         (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
      |) ORDER BY table_name, column_name, check_name""".stripMargin

  /** q6: ingest-volume anomaly detection — the dbt-source-freshness /
    * volume-monitor check an orchestrated pipeline runs before trusting
    * a partition: flag a day whose row count deviates from its trailing
    * 7-day window by more than 2× in either direction. The window runs
    * over the DAY-GRAIN rollup (O(days) rows — a decade is ~3.7k rows),
    * never the event table, so the unpartitioned ordering is a
    * metadata-sized sort, and the deviation test is pure integer
    * cross-multiplication (`n·days > 2·sum`) — no float mean/stddev to
    * drift between engines. */
  def volumeAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir).events
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("day").rowsBetween(-7, -1)
    daily
      .withColumn("trailing_sum", coalesce(sum("n").over(w), lit(0L)))
      .withColumn("trailing_days", count("n").over(w))
      .select(
        col("day"), col("n"),
        col("trailing_sum"), col("trailing_days"),
        (col("trailing_days") >= 3 &&
          (col("n") * col("trailing_days") > col("trailing_sum") * 2 ||
            col("n") * col("trailing_days") * 2 < col("trailing_sum")))
          .as("anomaly"))
      .orderBy("day")
  }

  val volumeAnomalyOracle: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events GROUP BY 1)
      |SELECT day, CAST(n AS BIGINT) AS n,
      |  CAST(coalesce(sum(n) OVER w, 0) AS BIGINT) AS trailing_sum,
      |  CAST(count(n) OVER w AS BIGINT) AS trailing_days,
      |  (count(n) OVER w >= 3 AND
      |    (n * (count(n) OVER w) > (coalesce(sum(n) OVER w, 0)) * 2 OR
      |     n * (count(n) OVER w) * 2 < coalesce(sum(n) OVER w, 0))) AS anomaly
      |FROM daily
      |WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
      |ORDER BY day""".stripMargin

  /** q7: table profiling — the dbt-docs / data-catalog statistics pass:
    * per column, null count, exact distinct cardinality, and typed
    * extremes (numeric min/max as DOUBLE, string/date extremes as
    * strings), emitted long-form one row per column. Everything
    * computes in ONE aggregate over one scan — the multiple DISTINCT
    * aggregates plan as a single Expand (per-column replication), not
    * six scans. Extremes are picked values, never arithmetic, so
    * cross-engine equality is exact; a 100 TB profiler would swap the
    * exact distincts for HLL sketches (a8/a8b), which is a one-line
    * change here and the documented trade-off. */
  def tableProfile(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    o.agg(
      count(lit(1)).as("n"),
      count(col("o_orderkey")).as("c1"), countDistinct(col("o_orderkey")).as("d1"),
      min(col("o_orderkey")).cast("double").as("mn1"), max(col("o_orderkey")).cast("double").as("mx1"),
      count(col("o_custkey")).as("c2"), countDistinct(col("o_custkey")).as("d2"),
      min(col("o_custkey")).cast("double").as("mn2"), max(col("o_custkey")).cast("double").as("mx2"),
      count(col("o_totalprice")).as("c3"), countDistinct(col("o_totalprice")).as("d3"),
      min(col("o_totalprice")).as("mn3"), max(col("o_totalprice")).as("mx3"),
      count(col("o_orderstatus")).as("c4"), countDistinct(col("o_orderstatus")).as("d4"),
      min(col("o_orderstatus")).as("smn4"), max(col("o_orderstatus")).as("smx4"),
      count(col("o_orderpriority")).as("c5"), countDistinct(col("o_orderpriority")).as("d5"),
      min(col("o_orderpriority")).as("smn5"), max(col("o_orderpriority")).as("smx5"),
      count(col("o_orderdate")).as("c6"), countDistinct(col("o_orderdate")).as("d6"),
      min(col("o_orderdate")).cast("date").cast("string").as("smn6"),
      max(col("o_orderdate")).cast("date").cast("string").as("smx6"))
      .select(expr(
        """stack(6,
          |  'o_orderkey',     n - c1, d1, mn1, mx1, cast(null as string), cast(null as string),
          |  'o_custkey',      n - c2, d2, mn2, mx2, cast(null as string), cast(null as string),
          |  'o_totalprice',   n - c3, d3, mn3, mx3, cast(null as string), cast(null as string),
          |  'o_orderstatus',  n - c4, d4, cast(null as double), cast(null as double), smn4, smx4,
          |  'o_orderpriority',n - c5, d5, cast(null as double), cast(null as double), smn5, smx5,
          |  'o_orderdate',    n - c6, d6, cast(null as double), cast(null as double), smn6, smx6
          |) as (col_name, n_nulls, n_distinct, min_num, max_num, min_str, max_str)""".stripMargin))
      .orderBy("col_name")
  }

  val tableProfileOracle: String =
    """WITH a AS (SELECT count(*) AS n,
      |  count(o_orderkey) c1, count(DISTINCT o_orderkey) d1,
      |    min(o_orderkey)::DOUBLE mn1, max(o_orderkey)::DOUBLE mx1,
      |  count(o_custkey) c2, count(DISTINCT o_custkey) d2,
      |    min(o_custkey)::DOUBLE mn2, max(o_custkey)::DOUBLE mx2,
      |  count(o_totalprice) c3, count(DISTINCT o_totalprice) d3,
      |    min(o_totalprice) mn3, max(o_totalprice) mx3,
      |  count(o_orderstatus) c4, count(DISTINCT o_orderstatus) d4,
      |    min(o_orderstatus) smn4, max(o_orderstatus) smx4,
      |  count(o_orderpriority) c5, count(DISTINCT o_orderpriority) d5,
      |    min(o_orderpriority) smn5, max(o_orderpriority) smx5,
      |  count(o_orderdate) c6, count(DISTINCT o_orderdate) d6,
      |    CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR) smn6,
      |    CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR) smx6
      |  FROM orders)
      |SELECT 'o_orderkey' AS col_name, CAST(n - c1 AS BIGINT) AS n_nulls,
      |  CAST(d1 AS BIGINT) AS n_distinct, mn1 AS min_num, mx1 AS max_num,
      |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM a
      |UNION ALL SELECT 'o_custkey', CAST(n - c2 AS BIGINT), CAST(d2 AS BIGINT),
      |  mn2, mx2, NULL, NULL FROM a
      |UNION ALL SELECT 'o_totalprice', CAST(n - c3 AS BIGINT), CAST(d3 AS BIGINT),
      |  mn3, mx3, NULL, NULL FROM a
      |UNION ALL SELECT 'o_orderstatus', CAST(n - c4 AS BIGINT), CAST(d4 AS BIGINT),
      |  NULL, NULL, smn4, smx4 FROM a
      |UNION ALL SELECT 'o_orderpriority', CAST(n - c5 AS BIGINT), CAST(d5 AS BIGINT),
      |  NULL, NULL, smn5, smx5 FROM a
      |UNION ALL SELECT 'o_orderdate', CAST(n - c6 AS BIGINT), CAST(d6 AS BIGINT),
      |  NULL, NULL, smn6, smx6 FROM a
      |ORDER BY col_name""".stripMargin

  /** q8: distribution-drift monitor (PSI) — the data-quality gate a
    * training pipeline runs before admitting a new crawl snapshot: the
    * categorical mix of the current window vs a reference window,
    * scored by Population Stability Index contribution per category
    * ((p−q)·ln(p/q), the symmetrized-KL summand; > 0.1 total is the
    * conventional "investigate" line). Laplace-smoothed (+1 per
    * category) so a category absent from one side stays finite. The
    * whole computation is one pass: per-category conditional counts,
    * totals re-attached as a broadcast single-row frame — the exchange
    * carries #categories rows, never events. ln() is transcendental so
    * the compared column is round(·, 6) (the tx10 discipline —
    * tie-probability ≈ 0, unlike dyadic-rational outputs). */
  def driftPsi(spark: SparkSession, dir: String): DataFrame = {
    val split = lit("2024-01-15").cast("date")
    val counts = Tables(spark, dir).events
      .groupBy("event_type")
      .agg(
        sum(when(to_date(col("ts")) <= split, 1L).otherwise(0L)).as("n_ref"),
        sum(when(to_date(col("ts")) > split, 1L).otherwise(0L)).as("n_cur"))
    val tot = counts.agg(
      sum("n_ref").as("t_ref"), sum("n_cur").as("t_cur"),
      count(lit(1)).as("cats"))
    counts.crossJoin(broadcast(tot))
      .withColumn("p", (col("n_ref") + 1).cast("double") / (col("t_ref") + col("cats")))
      .withColumn("q", (col("n_cur") + 1).cast("double") / (col("t_cur") + col("cats")))
      .select(
        col("event_type"), col("n_ref"), col("n_cur"),
        round((col("p") - col("q")) * log(col("p") / col("q")), 6).as("psi_contrib"))
      .orderBy("event_type")
  }

  val driftPsiOracle: String =
    """WITH counts AS (
      |  SELECT event_type,
      |    CAST(sum(CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
      |    CAST(sum(CASE WHEN CAST(ts AS DATE) >  DATE '2024-01-15' THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
      |  FROM events GROUP BY 1),
      |tot AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur, count(*) AS cats FROM counts),
      |pq AS (
      |  SELECT event_type, n_ref, n_cur,
      |    CAST(n_ref + 1 AS DOUBLE) / (t_ref + cats) AS p,
      |    CAST(n_cur + 1 AS DOUBLE) / (t_cur + cats) AS q
      |  FROM counts CROSS JOIN tot)
      |SELECT event_type, n_ref, n_cur,
      |       round((p - q) * ln(p / q), 6) AS psi_contrib
      |FROM pq ORDER BY event_type""".stripMargin

  /** q9's screening threshold: a candidate whose SKETCHED uniqueness
    * ratio falls below this is rejected without an exact scan. With the
    * sketch's 2% target rsd, a TRUE key (ratio 1.0) mis-screening here
    * would need a ~5-sigma HLL underestimate -- and the engine/oracle
    * screen decisions agree deterministically unless a candidate's true
    * ratio sits within sketch error of the threshold (none of the
    * declared candidates is anywhere near it: 1.0, 1.0, ~0.25, ~0.76).
    */
  val KeyScreenRatio = 0.9

  /** q9: candidate-key discovery -- the data-profiling step schema
    * inference and contract authoring start from, composed the way it
    * must run at 100 TB: SKETCH-FIRST. Phase 1 screens ALL candidates
    * with ONE HLL aggregate per table (approx_count_distinct is not a
    * true DISTINCT aggregate, so any number of candidates fuse into a
    * single scan with no Expand row-doubling); phase 2 runs the exact
    * single-distinct confirmation scan ONLY for candidates the sketch
    * says could be keys (ratio >= [[KeyScreenRatio]]). Rejected
    * candidates report is_key = false with NULL distinct/ratio -- the
    * sketch proved the verdict, so the table is never rescanned for
    * them (here: lineitem gets ZERO exact scans, both its candidates
    * screen out). The fixture set includes a true composite negative:
    * (l_orderkey, l_linenumber) is NOT unique in this generator's
    * lineitem -- a verdict a uniqueness checker must be able to return,
    * and one the screen alone decides. Ref analog: dbt's schema tests
    * declare uniqueness (`dbt_project/models/staging/schema.yml`);
    * this op DISCOVERS it. */
  def keyDiscovery(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val candidates: Seq[(String, String, Seq[String])] = Seq(
      ("events", "events.event_id", Seq("event_id")),
      ("orders", "orders.o_orderkey", Seq("o_orderkey")),
      ("lineitem", "lineitem.l_orderkey", Seq("l_orderkey")),
      ("lineitem", "lineitem.l_orderkey+l_linenumber", Seq("l_orderkey", "l_linenumber")))
    def table(name: String) = name match {
      case "events" => t.events; case "orders" => t.orders; case _ => t.lineitem
    }
    // \u0001-separated and NULL-PROPAGATING: composite parts can't
    // collide, and a NULL part nulls the whole key (dropped by both
    // distinct forms) -- plain concat matches the oracle's `||`;
    // concat_ws would silently SKIP null parts and collide ('a',NULL)
    // with ('a','')
    def key(cols: Seq[String]) = cols.map(c => col(c).cast("string"))
      .reduceLeft((a, b) => concat(a, lit("\u0001"), b))
    // phase 1: one sketch scan per TABLE covering all its candidates;
    // verdicts cross the driver as one row per table (bounded metadata,
    // like every collect in this engine). The per-table scans are
    // INDEPENDENT jobs over different single-row-group files, so they
    // are submitted from a small thread pool and overlap (guide §2.6:
    // actions are only sequential because the driver calls them
    // sequentially) — sequentially each scan left every other core
    // idle; measured 2.24 s → ~1.5 s at sf0.1 (r17). Result map keyed
    // by table name, so completion order cannot affect the output.
    val screen: Map[String, (Long, Map[String, Long])] = {
      // daemon threads + a bounded await (r17 ADVICE): with non-daemon
      // workers and Duration.Inf, one wedged scan hung the query — and
      // the driver — forever with no failure path; now a stuck scan
      // surfaces as a TimeoutException and the daemon pool can never
      // keep the JVM alive on its own
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        candidates.map(_._1).distinct.size,
        (r: Runnable) => {
          val t = new Thread(r, "q9-screen-scan")
          t.setDaemon(true)
          t
        })
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        val futures = candidates.groupBy(_._1).map { case (tbl, cs) =>
          scala.concurrent.Future {
            val aggs = count(lit(1)).as("n_rows") +:
              cs.map { case (_, label, cols) =>
                approx_count_distinct(key(cols), 0.02).as(label) }
            val row = table(tbl).agg(aggs.head, aggs.tail: _*).collect().head
            (tbl, (row.getAs[Long]("n_rows"),
              cs.map { case (_, label, _) => label -> row.getAs[Long](label) }.toMap))
          }
        }.toSeq
        scala.concurrent.Await
          .result(scala.concurrent.Future.sequence(futures),
            scala.concurrent.duration.Duration(30, "min"))
          .toMap
      } finally pool.shutdown()
    }
    // phase 2: exact confirmation scans ONLY for sketch survivors --
    // each its own single-distinct aggregate (the scan is column-pruned
    // to the key columns, so the cost center is the distinct
    // aggregation, and separate aggs keep it map-combinable without the
    // Expand row-doubling of the fused multi-distinct form; measured:
    // the q7-style one-pass Expand variant is 1.5x slower here at sf0.1
    // AND sf1 -- fuse only when scan IO dominates, e.g. un-cached
    // object-store reads)
    val results = candidates.map { case (tbl, label, cols) =>
      val (nRows, sketched) = screen(tbl)
      if (sketched(label) >= KeyScreenRatio * nRows)
        table(tbl)
          .agg(count(lit(1)).as("n_rows"), countDistinct(key(cols)).as("n_distinct"))
          .select(
            lit(label).as("candidate"),
            col("n_rows"),
            col("n_distinct"),
            (col("n_distinct").cast("double") / col("n_rows")).as("uniq_ratio"),
            (col("n_distinct") === col("n_rows")).as("is_key"),
            lit(true).as("screened"))
      else
        spark.range(1).select(
          lit(label).as("candidate"),
          lit(nRows).as("n_rows"),
          lit(null).cast("bigint").as("n_distinct"),
          lit(null).cast("double").as("uniq_ratio"),
          lit(false).as("is_key"),
          lit(false).as("screened"))
    }
    results.reduceLeft(_ unionByName _).orderBy("candidate")
  }

  /** The oracle mirrors the screen with the EXACT ratio -- equal to the
    * sketch decision whenever no candidate's true ratio sits within
    * sketch error of [[KeyScreenRatio]] (see its scaladoc). */
  val keyDiscoveryOracle: String = {
    def cand(label: String, tbl: String, keyExpr: String): String =
      s"""SELECT '$label' AS candidate, count(*) AS n_rows,
         |       CASE WHEN count(DISTINCT $keyExpr) >= $KeyScreenRatio * count(*)
         |            THEN count(DISTINCT $keyExpr) END AS n_distinct,
         |       CASE WHEN count(DISTINCT $keyExpr) >= $KeyScreenRatio * count(*)
         |            THEN count(DISTINCT $keyExpr)::DOUBLE / count(*) END AS uniq_ratio,
         |       count(DISTINCT $keyExpr) = count(*) AS is_key,
         |       count(DISTINCT $keyExpr) >= $KeyScreenRatio * count(*) AS screened
         |FROM $tbl""".stripMargin
    s"""SELECT * FROM (
      |  ${cand("events.event_id", "events", "CAST(event_id AS VARCHAR)")}
      |  UNION ALL
      |  ${cand("orders.o_orderkey", "orders", "CAST(o_orderkey AS VARCHAR)")}
      |  UNION ALL
      |  ${cand("lineitem.l_orderkey", "lineitem", "CAST(l_orderkey AS VARCHAR)")}
      |  UNION ALL
      |  ${cand("lineitem.l_orderkey+l_linenumber", "lineitem",
        "CAST(l_orderkey AS VARCHAR) || chr(1) || CAST(l_linenumber AS VARCHAR)")}
      |) ORDER BY candidate""".stripMargin
  }

  /** q10's minimum group size: quasi-identifier combinations matched by
    * fewer than this many rows are re-identification risks. */
  val AnonK = 5

  /** q10: k-anonymity audit — the privacy-governance check a
    * training-data platform runs beside PII scrubbing (tx12) and
    * subject deletion (s23): every combination of quasi-identifiers
    * (here event_type × day × value band, the Sweeney QI notion) must
    * match ≥ [[AnonK]] rows, else the combination alone re-identifies.
    * One map-combinable aggregate over the QI tuple; the report is the
    * violating combinations (empty = table is k-anonymous), each with
    * its row and distinct-subject counts. At 100 TB the QI cardinality
    * (types × days × bands) is millions of groups at most — the
    * aggregate output is bounded by the QI domain, never by rows.
    * Ref analog: none — governance extension alongside dbt-style
    * checks (`dbt_project/models/staging/schema.yml`). */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(
        col("event_type"),
        to_date(col("ts")).as("event_date"),
        floor(col("value") / 100).cast("bigint").as("value_band"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .filter(col("n") < AnonK)
      .orderBy("event_type", "event_date", "value_band")

  val kAnonymityOracle: String =
    s"""SELECT event_type, CAST(ts AS DATE) AS event_date,
      |       CAST(floor(value / 100) AS BIGINT) AS value_band,
      |       count(*) AS n, count(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY 1, 2, 3 HAVING count(*) < $AnonK
      |ORDER BY event_type, event_date, value_band""".stripMargin

  /** q11: EXPECT-OR-QUARANTINE routing — the DLT `expect_or_drop` +
    * quarantine-table shape the reference's assert-only quality layer
    * lacks (its checks can only pass or abort the run,
    * `data_quality.py` analog). One pass tags every row with the FIRST
    * failed rule of an ORDERED expectation list; failing rows land in a
    * QUARANTINE lake table carrying that reason, clean rows land in the
    * main table, and both publish in ONE
    * [[graft.ops.lake.Snapshots.commitPair]] transaction — a crash can
    * delay the pair, never diverge it, and no row is dropped silently
    * (clean + quarantined = input, checked by the oracle's totals).
    * The result reads BACK from the two committed tables — per-day
    * clean counts next to per-reason quarantine counts — so routing,
    * first-failure attribution, and the atomic publish all sit inside
    * the hash gate.
    *
    * Scale: rule evaluation is one codegen'd `when` chain (no UDF, no
    * second scan); the route is two filtered writes of one cached
    * frame; the quarantine table is a normal lake table (replayable,
    * CDC-able) rather than a log line. */
  def quarantineRoute(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.lake.Snapshots
    def scratch(p: String) = graft.engine.Graft.freshDir(
      p + dir.replaceAll("[^A-Za-z0-9.]", "_"))
    val mainT = scratch("q11-main-")
    val quarT = scratch("q11-quar-")
    val txn = scratch("q11-txn-")
    Snapshots.recoverPairs(txn) // writer-startup convergence
    val ev = Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "event_type", "value", "event_date")
    // ordered expectations; the FIRST failure names the reason
    val rules: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "known_type" -> col("event_type")
        .isin("click", "view", "purchase", "signup"),
      "value_in_range" -> (col("value") >= 0.0 && col("value") <= 150.0))
    val reason = rules.foldRight(lit(null).cast("string")) {
      case ((n, c), acc) => when(!coalesce(c, lit(false)), lit(n)).otherwise(acc)
    }
    val tagged = ev.withColumn("q_reason", reason).cache()
    try {
      val clean = tagged.filter(col("q_reason").isNull).drop("q_reason")
      val bad = tagged.filter(col("q_reason").isNotNull)
      Snapshots.commitPair(txn,
        Snapshots.prepare(mainT, Snapshots.stage(clean, mainT, "event_date"), _ => true),
        Snapshots.prepare(quarT, Snapshots.stage(bad, quarT, "event_date"), _ => true))
    } finally tagged.unpersist()
    val quarCounts = Snapshots.read(spark, quarT)
      .groupBy(col("q_reason").as("bucket"))
      .agg(count(lit(1)).as("n"))
    Snapshots.read(spark, mainT)
      .agg(count(lit(1)).as("n"))
      .select(lit("clean").as("bucket"), col("n"))
      .unionByName(quarCounts)
      .orderBy("bucket")
  }

  lazy val quarantineRouteOracle: String =
    """WITH t AS (
      |  SELECT CASE
      |    WHEN event_type IS NULL
      |      OR event_type NOT IN ('click', 'view', 'purchase', 'signup')
      |      THEN 'known_type'
      |    WHEN value IS NULL OR NOT (value >= 0.0 AND value <= 150.0)
      |      THEN 'value_in_range'
      |    ELSE 'clean' END AS bucket
      |  FROM events)
      |SELECT 'clean' AS bucket, count(*) AS n FROM t WHERE bucket = 'clean'
      |UNION ALL
      |SELECT bucket, count(*) AS n FROM t WHERE bucket <> 'clean'
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("q11_quarantine_route", quarantineRouteOracle)(quarantineRoute),
    QueryDef.sql("q3a_unique_check", uniqueCheckOracle)(uniqueCheck),
    QueryDef.sql("q3b_not_null_check", notNullCheckOracle)(notNullCheck),
    QueryDef.sql("q3c_accepted_values", acceptedValuesCheckOracle)(acceptedValuesCheck),
    QueryDef.sql("q3d_relationships", relationshipCheckOracle)(relationshipCheck),
    QueryDef.sql("q3e_contract_report", contractReportOracle)(contractReport),
    QueryDef.sql("q6_volume_anomaly", volumeAnomalyOracle)(volumeAnomaly),
    QueryDef.sql("q7_table_profile", tableProfileOracle)(tableProfile),
    QueryDef.sql("q8_drift_psi", driftPsiOracle)(driftPsi),
    QueryDef.sql("q9_key_discovery", keyDiscoveryOracle)(keyDiscovery),
    QueryDef.sql("q10_k_anonymity", kAnonymityOracle)(kAnonymity))
}
