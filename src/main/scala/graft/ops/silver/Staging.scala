package graft.ops.silver

import graft.engine.{Exact, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Silver/staging layer: the reference's bronze→silver projections
  * (`dbt_project/models/staging/stg_binance_trades.sql`, the consumer
  * re-projection at `producer/kafka_to_s3_bronze.py:30-46`, and the
  * cast-with-coerce backfill at
  * `airflow/dags/ingest_binance_last_3_days.py:48-63`) on the `events`
  * fixture. All narrow ops — no shuffle except where dedup requires the
  * per-key exchange.
  */
object Staging {

  /** P3/F7: envelope flatten + rename; JSON payload field extraction.
    * `props` plays the role of the raw WS payload. */
  def jsonFlatten(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events.select(
      col("event_id"),
      lower(col("event_type")).as("symbol"),
      get_json_object(col("props"), "$.k").cast("long").as("k"),
      Exact.epochMs(col("ts")).as("event_time_ms"))
      .orderBy("event_id")

  val jsonFlattenOracle: String =
    """SELECT event_id, lower(event_type) AS symbol,
      |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |       epoch_ms(ts) AS event_time_ms
      |FROM events ORDER BY event_id""".stripMargin

  /** P4/F11: cast-with-coerce — pandas `to_numeric(errors="coerce")`
    * semantics (bad input → NULL, not error) via try_cast under ANSI. */
  def castCoerce(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents.select(
      col("doc_id"),
      expr("try_cast(lang AS double)").as("bad_cast"),
      expr("try_cast(cast(n_chars AS string) AS double)").as("ok_cast"),
      expr("try_cast(source AS bigint)").as("bad_int"))
      .orderBy("doc_id")

  val castCoerceOracle: String =
    """SELECT doc_id,
      |       TRY_CAST(lang AS DOUBLE) AS bad_cast,
      |       TRY_CAST(CAST(n_chars AS VARCHAR) AS DOUBLE) AS ok_cast,
      |       TRY_CAST(source AS BIGINT) AS bad_int
      |FROM documents ORDER BY doc_id""".stripMargin

  /** P6: the stg_binance_trades cast/rename/derive projection. */
  def stgProjection(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events.select(
      col("event_id").cast("string").as("trade_id"),
      col("event_type").as("symbol"),
      Exact.epochMs(col("ts")).as("event_time_ms"),
      col("value").as("price"),
      get_json_object(col("props"), "$.k").cast("double").as("quantity"),
      to_date(col("ts")).as("event_date"))
      .orderBy(col("trade_id").cast("long"))

  val stgProjectionOracle: String =
    """SELECT CAST(event_id AS VARCHAR) AS trade_id, event_type AS symbol,
      |       epoch_ms(ts) AS event_time_ms, value AS price,
      |       CAST(json_extract_string(props, '$.k') AS DOUBLE) AS quantity,
      |       CAST(ts AS DATE) AS event_date
      |FROM events ORDER BY CAST(trade_id AS BIGINT)""".stripMargin

  /** A4 (exact form): key-uniqueness dedup via dropDuplicates-style
    * DISTINCT on a derived key set. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .select(col("user_id"), col("event_type"))
      .distinct()
      .orderBy("user_id", "event_type")

  val dedupExactOracle: String =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  /** A4 (last-write-wins form): the idiomatic Spark MERGE-on-unique-key —
    * row_number over (key ORDER BY recency DESC) = 1. Key here is
    * (user_id, event_type); latest by (ts, event_id). One shuffle on the
    * dedup key; at scale this is the same exchange a MERGE would need. */
  def dedupLww(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables(spark, dir).events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("last_event_id"), col("value").as("last_value"))
      .orderBy("user_id", "event_type")
  }

  val dedupLwwOracle: String =
    """SELECT user_id, event_type, event_id AS last_event_id, value AS last_value
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
      |                           ORDER BY ts DESC, event_id DESC) = 1
      |ORDER BY user_id, event_type""".stripMargin

  /** P10: scalar-subquery high-watermark filter (dbt incremental
    * `WHERE event_time > (SELECT max(event_time) FROM {{ this }})`),
    * exercised through the SQL entry path. */
  def watermarkFilter(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).events.createOrReplaceTempView("graft_events")
    spark.sql(
      """SELECT event_id, user_id, event_type,
        |       unix_millis(cast(ts as timestamp)) AS ts_ms
        |FROM graft_events
        |WHERE ts > (SELECT max(ts) FROM graft_events
        |            WHERE ts < TIMESTAMP '2024-01-28 00:00:00')
        |ORDER BY event_id""".stripMargin)
  }

  val watermarkFilterOracle: String =
    """SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms
      |FROM events
      |WHERE ts > (SELECT max(ts) FROM events
      |            WHERE ts < TIMESTAMP '2024-01-28 00:00:00')
      |ORDER BY event_id""".stripMargin

  /** S4/P11: parameterized date-equality scan — the partition-pruned read
    * (`build_fact_fee_tax.py:26-35`). The date equality is rewritten as a
    * half-open range on the RAW epoch-nanos column so it pushes down to
    * the parquet row groups (a filter on the converted timestamp would
    * force a full scan — the difference between touching one day and
    * 100 TB). On a date-partitioned layout the same range prunes at the
    * source listing (see Sinks.partitionedSinkRoundtrip). */
  def dateParamScan(spark: SparkSession, dir: String): DataFrame = {
    val day = java.time.LocalDate.parse("2024-01-15")
    val t = Tables(spark, dir)
    val ranged =
      if (t.eventsTsIsRawNanos) {
        val nanosPerDay = 86400L * 1000000000L
        val lo = day.toEpochDay * nanosPerDay
        t.eventsRaw.filter(col("ts") >= lo && col("ts") < lo + nanosPerDay)
      } else
        // native-timestamp encoding: the half-open NTZ range is directly
        // pushable — parquet row-group stats filter it with no rewrite
        t.eventsRaw.filter(
          expr(s"ts >= TIMESTAMP_NTZ '$day 00:00:00' AND " +
               s"ts < TIMESTAMP_NTZ '${day.plusDays(1)} 00:00:00'"))
    ranged
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  val dateParamScanOracle: String =
    """SELECT event_id, user_id, event_type, value FROM events
      |WHERE CAST(ts AS DATE) = DATE '2024-01-15' ORDER BY event_id""".stripMargin

  /** S14: incremental MERGE emulation without a table format — the
    * dbt incremental `unique_key` upsert (`fact_trades.sql:1-11`) as
    * union + last-write-wins. `base` models rows already in the target,
    * `incoming` a re-ingest batch with refreshed values; MERGE keeps the
    * incoming row per key. Scales as one shuffle on the unique key. */
  def incrementalMerge(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val base = ev.filter(col("ts") < lit("2024-01-20").cast("timestamp_ntz"))
      .select(col("event_id"), lit(1L).as("src_batch"), col("value"))
    val incoming = ev.filter(col("ts") >= lit("2024-01-15").cast("timestamp_ntz"))
      .select(col("event_id"), lit(2L).as("src_batch"),
        (col("value") + 1.0).as("value"))
    val w = Window.partitionBy("event_id").orderBy(col("src_batch").desc)
    base.unionByName(incoming)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_id", "src_batch", "value")
      .orderBy("event_id")
  }

  val incrementalMergeOracle: String =
    """WITH base AS (
      |  SELECT event_id, CAST(1 AS BIGINT) AS src_batch, value FROM events
      |  WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
      |), incoming AS (
      |  SELECT event_id, CAST(2 AS BIGINT) AS src_batch, value + 1.0 AS value FROM events
      |  WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
      |), merged AS (
      |  SELECT * FROM base UNION ALL SELECT * FROM incoming
      |)
      |SELECT event_id, src_batch, value FROM merged
      |QUALIFY row_number() OVER (PARTITION BY event_id ORDER BY src_batch DESC) = 1
      |ORDER BY event_id""".stripMargin

  /** s20: SCD Type-2 dimension build — the warehouse-standard history
    * table that S14's MERGE (type-1, overwrite-in-place) cannot express:
    * each user's tracked attribute (their latest event_type, read as a
    * "segment") becomes a versioned interval row with
    * `[valid_from, valid_to)` bounds, one open (`is_current`) row per
    * key. Classic two-step: suppress no-op rows (`lag` — an event that
    * doesn't change the attribute creates no version), then close each
    * interval with the next change's timestamp (`lead`). Both windows
    * share one partitioning (`user_id`) and one ordering, so the whole
    * build is a single shuffle + one sort — Catalyst folds the two
    * Window nodes onto the same exchange (no re-sort between them).
    * Ordering ties break on event_id, and time stays in raw int64
    * nanos until the final ms projection (`div`, not `/` — a double
    * quotient of epoch-nanos loses precision past 2⁵³), so the build
    * is deterministic and engine-portable at any timestamp jitter. */
  /** The SCD2 history at wire-format ns grain — the join-ready form
    * ([[scd2PitJoin]] needs full precision: ms-truncated boundaries can
    * collide with event times and mis-file a fact into the adjacent
    * version). Columns: user_id, version, segment, valid_from_ns,
    * valid_to_ns (null = open). */
  private[graft] def scd2Ns(spark: SparkSession, dir: String): DataFrame =
    scd2NsOf(Tables(spark, dir).eventsNs)

  /** [[scd2Ns]] over any change-log frame with (user_id, event_type,
    * ts, event_id) columns. */
  private[graft] def scd2NsOf(events: DataFrame): DataFrame = {
    val ev = events
      .select(col("user_id"), col("event_type").as("segment"),
        col("ts").as("at_ns"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy(col("at_ns"), col("event_id"))
    ev.withColumn("prev", lag(col("segment"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("segment"))
      .withColumn("version", row_number().over(w).cast("bigint"))
      .withColumn("valid_to_ns", lead(col("at_ns"), 1).over(w))
      .select(col("user_id"), col("version"), col("segment"),
        col("at_ns").as("valid_from_ns"), col("valid_to_ns"))
  }

  def scd2Build(spark: SparkSession, dir: String): DataFrame =
    scd2Ns(spark, dir)
      .select(
        col("user_id"),
        col("version"),
        col("segment"),
        expr("valid_from_ns div 1000000").as("valid_from_ms"),
        expr("valid_to_ns div 1000000").as("valid_to_ms"),
        col("valid_to_ns").isNull.as("is_current"))
      .orderBy("user_id", "version")

  val scd2BuildOracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_type AS segment, epoch_ns(ts) AS at_ns, event_id
      |  FROM events),
      |chg AS (
      |  SELECT user_id, segment, at_ns, event_id FROM (
      |    SELECT *, lag(segment) OVER (PARTITION BY user_id ORDER BY at_ns, event_id) AS prev
      |    FROM ev)
      |  WHERE prev IS NULL OR prev <> segment)
      |SELECT user_id,
      |  CAST(row_number() OVER w AS BIGINT) AS version,
      |  segment,
      |  at_ns // 1000000 AS valid_from_ms,
      |  lead(at_ns) OVER w // 1000000 AS valid_to_ms,
      |  (lead(at_ns) OVER w IS NULL) AS is_current
      |FROM chg
      |WINDOW w AS (PARTITION BY user_id ORDER BY at_ns, event_id)
      |ORDER BY user_id, version""".stripMargin

  /** j10: POINT-IN-TIME join against the SCD2 history — "which segment
    * was this user in when they purchased?", the temporal join every
    * versioned-dimension warehouse runs. The join is an equi-join on
    * the dimension key with the validity interval as an IN-JOIN
    * residual (`valid_from ≤ ts < valid_to`, open tail = +∞): fan-out
    * per fact row is bounded by that user's version count, the
    * exchange is the plain user_id hash partition both sides already
    * want, and exactly one version matches per fact (intervals
    * partition the timeline from the user's first event; zero-width
    * intervals from same-instant changes match nothing by the
    * half-open test). Comparison runs at full int64-ns precision —
    * the ms-truncated boundaries s20 publishes can COLLIDE with event
    * times and mis-file a fact into the adjacent version (the spec
    * pins a same-ms boundary case). */
  def scd2PitJoin(spark: SparkSession, dir: String): DataFrame = {
    // the dimension is the NON-purchase activity profile: version it from
    // the other event types only — a dimension derived from the facts
    // themselves would put every purchase inside its own just-opened
    // 'purchase' segment and the join would be a tautology
    val dim = scd2NsOf(Tables(spark, dir).eventsNs
      .filter(col("event_type") =!= "purchase"))
    val facts = Tables(spark, dir).eventsNs
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("at_ns"), col("value"))
    // left outer: a purchase BEFORE the user's first profile event has no
    // valid version yet and surfaces with a null segment (fact precedes
    // dimension birth — report it, don't drop it)
    facts.join(dim,
        facts("user_id") === dim("user_id") &&
          col("at_ns") >= col("valid_from_ns") &&
          (col("valid_to_ns").isNull || col("at_ns") < col("valid_to_ns")),
        "left_outer")
      .select(
        facts("event_id").as("purchase_event_id"),
        facts("user_id").as("user_id"),
        expr("at_ns div 1000000").as("purchase_ts_ms"),
        dim("version").as("segment_version"),
        dim("segment").as("segment_at_purchase"),
        facts("value").as("value"))
      .orderBy("purchase_event_id")
  }

  val scd2PitJoinOracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_type AS segment, epoch_ns(ts) AS at_ns, event_id
      |  FROM events WHERE event_type <> 'purchase'),
      |chg AS (
      |  SELECT user_id, segment, at_ns, event_id FROM (
      |    SELECT *, lag(segment) OVER (PARTITION BY user_id ORDER BY at_ns, event_id) AS prev
      |    FROM ev)
      |  WHERE prev IS NULL OR prev <> segment),
      |dim AS (
      |  SELECT user_id, CAST(row_number() OVER w AS BIGINT) AS version, segment,
      |    at_ns AS valid_from_ns, lead(at_ns) OVER w AS valid_to_ns
      |  FROM chg
      |  WINDOW w AS (PARTITION BY user_id ORDER BY at_ns, event_id)),
      |f AS (
      |  SELECT event_id, user_id, epoch_ns(ts) AS at_ns, value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT f.event_id AS purchase_event_id, f.user_id AS user_id,
      |  f.at_ns // 1000000 AS purchase_ts_ms,
      |  dim.version AS segment_version, dim.segment AS segment_at_purchase,
      |  f.value AS value
      |FROM f LEFT JOIN dim ON f.user_id = dim.user_id
      |  AND f.at_ns >= dim.valid_from_ns
      |  AND (dim.valid_to_ns IS NULL OR f.at_ns < dim.valid_to_ns)
      |ORDER BY purchase_event_id""".stripMargin

  /** P1-adjacent resilience: malformed/missing JSON fields coerce to NULL
    * (PERMISSIVE semantics), never fail the pipeline — per-doc parse
    * health surfaces as counters a quality gate can threshold. */
  def malformedJson(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.missing_key").as("missing_key"),
        get_json_object(concat(lit("{broken"), col("props")), "$.k").as("broken_parse"),
        get_json_object(col("props"), "$.k").isNotNull.as("parse_ok"))
      .orderBy("event_id")

  val malformedJsonOracle: String =
    """SELECT event_id,
      |  json_extract_string(props, '$.missing_key') AS missing_key,
      |  CASE WHEN json_valid('{broken' || props)
      |       THEN json_extract_string('{broken' || props, '$.k') END AS broken_parse,
      |  json_extract_string(props, '$.k') IS NOT NULL AS parse_ok
      |FROM events ORDER BY event_id""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("p3_json_flatten", jsonFlattenOracle)(jsonFlatten),
    QueryDef.sql("p13_malformed_json", malformedJsonOracle)(malformedJson),
    QueryDef.sql("p4_cast_coerce", castCoerceOracle)(castCoerce),
    QueryDef.sql("p6_stg_projection", stgProjectionOracle)(stgProjection),
    QueryDef.sql("a4_dedup_exact", dedupExactOracle)(dedupExact),
    QueryDef.sql("a4_dedup_lww", dedupLwwOracle)(dedupLww),
    QueryDef.sql("p10_watermark_filter", watermarkFilterOracle)(watermarkFilter),
    QueryDef.sql("p11_date_param_scan", dateParamScanOracle)(dateParamScan),
    QueryDef.sql("s14_incremental_merge", incrementalMergeOracle)(incrementalMerge),
    QueryDef.sql("s20_scd2_dim", scd2BuildOracle)(scd2Build),
    QueryDef.sql("j10_scd2_pit_join", scd2PitJoinOracle)(scd2PitJoin))
}
