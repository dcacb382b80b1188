package graft.streaming

import graft.engine.{Exact, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowing (SURVEY §2.8). The same `window`/`session_window`
  * expressions run in both batch and Structured Streaming; here they are
  * exercised in batch mode so the DuckDB oracle can replay them, and
  * `Pipelines` (+ the StreamingSpec) runs the true streaming path with
  * watermarks over the identical expressions — Spark's unified-engine
  * guarantee is what makes that equivalence real.
  */
object EventTime {

  /** T-tumbling: hourly tumbling window per event_type — the streaming
    * analog of the reference's `hour=` partitioning. */
  def tumblingHourly(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Exact.fixSum(col("value"), 2).as("sum_value"))
      .select(Exact.epochMs(col("w.start")).as("hour_start_ms"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour_start_ms", "event_type")

  val tumblingHourlyOracle: String =
    """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_start_ms, event_type,
      |       count(*) AS n,
      |       CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour_start_ms, event_type""".stripMargin

  /** Sliding window: 2-hour window sliding by 1 hour. Each event lands in
    * two windows; the oracle unions the two aligned hour-truncations. */
  def slidingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), Exact.fixSum(col("value"), 2).as("sum_value"))
      .select(Exact.epochMs(col("w.start")).as("win_start_ms"),
        col("n"), col("sum_value"))
      .orderBy("win_start_ms")

  val slidingWindowOracle: String =
    """WITH assigned AS (
      |  SELECT epoch_ms(date_trunc('hour', ts)) AS win_start_ms, value FROM events
      |  UNION ALL
      |  SELECT epoch_ms(date_trunc('hour', ts) - INTERVAL 1 HOUR) AS win_start_ms, value FROM events
      |)
      |SELECT win_start_ms, count(*) AS n,
      |       CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_value
      |FROM assigned GROUP BY 1 ORDER BY win_start_ms""".stripMargin

  /** Session windows with a 30-minute gap per user. Oracle: classic
    * gaps-and-islands. New session when the gap from the previous event
    * is >= the timeout (Spark sessions are half-open [start, last+gap)). */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        Exact.fixSum(col("value"), 2).as("sum_value"))
      .select(col("user_id"), Exact.epochUs(col("w.start")).as("session_start_us"),
        col("n"), col("sum_value"))
      .orderBy("user_id", "session_start_us")

  val sessionWindowsOracle: String =
    """WITH marked AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |           OR ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts) + INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |), grouped AS (
      |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM marked
      |)
      |SELECT user_id, epoch_us(min(ts)) AS session_start_us, count(*) AS n,
      |       CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_value
      |FROM grouped GROUP BY user_id, session_id
      |ORDER BY user_id, session_start_us""".stripMargin

  /** T4 — GAP FILL + FORWARD FILL (r14): the OHLCV-bar shape the
    * reference's trade domain needs but its pandas pipeline never
    * builds — a DENSE hourly grid per series between the corpus's
    * global min/max hour, with no-trade hours materialized as
    * zero-count bars carrying the last seen close forward. Order of
    * operations is what makes it 100 TB-safe: the CORPUS is touched
    * once by a map-combinable groupBy down to (series, hour) grain;
    * the grid is generated from a 1-row bounds agg (`sequence` +
    * explode — hours are calendar-bounded, ~87k rows per decade) cross
    * joined to the distinct series; the left join and the forward-fill
    * window then run over BAR-scale data, partitioned by series (a
    * million symbols = a million independent window partitions). The
    * per-bar close is the max-event_id event's value — ids are unique,
    * so the verdict is deterministic under any partitioning (a raw
    * `last(ts)` would tie-break arbitrarily on equal timestamps). */
  def gapFillHourly(spark: SparkSession, dir: String): DataFrame =
    gapFillHourlyOf(Tables(spark, dir).events)

  /** [[gapFillHourly]]'s core over any `(event_id, ts, event_type,
    * value)` frame — split out so the spec can plant known gaps. */
  private[graft] def gapFillHourlyOf(ev: DataFrame): DataFrame =
    gapFill(ev, "ts", "event_type", "value", "event_id")

  /** The GENERIC gap-fill operator (r15 — column-parameterized so the
    * `gap_fill()` SQL table function can reach it): a dense `grain`
    * grid (minute/hour/day/week/month, default hour) per `seriesCol`
    * between the corpus's global min/max bar, no-activity bars
    * materialized as zero-count bars carrying the last seen close
    * forward; the per-bar close is the max-`idCol` row's `valueCol`
    * (ids are unique ⇒ deterministic under any partitioning).
    * Output: `seriesCol` (its own name), then `<grain>_start_ms`,
    * `n`, `sum_value`, `close_ffill`.
    * See [[gapFillHourly]] for the one-corpus-pass scale shape. */
  def gapFill(ev: DataFrame, tsCol: String, seriesCol: String,
              valueCol: String, idCol: String,
              grain: String = "hour"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // calendar grains only: the grid steps by ONE grain unit, so the
    // truncation and the step must agree (date_trunc + sequence both
    // understand these; month steps calendar-correctly)
    val g = grain.toLowerCase
    require(Set("minute", "hour", "day", "week", "month")(g),
      s"gapFill: grain must be minute/hour/day/week/month, got '$grain'")
    // DST safety (r15 advisor): grid arithmetic (date_trunc, the
    // day-chunked 1440-minute expansion, sequence stepping) is
    // session-timezone-local — on a DST-observing zone a spring-forward
    // day's minute grid would spill into the next day (duplicate rows)
    // and a fall-back day would drop its repeated hour. Graft.configure
    // pins UTC; a bespoke session must use a fixed-offset zone, where
    // every day is exactly 1440 minutes and the math below is exact.
    val sessTz = ev.sparkSession.sessionState.conf.sessionLocalTimeZone
    // ZoneId.SHORT_IDS: Spark itself resolves three-letter ids through
    // it ("EST" is a Spark-valid fixed-offset zone), so the guard must
    // grade the same zone Spark will compute with, not crash on it
    // (r16 review find)
    require(java.time.ZoneId.of(sessTz, java.time.ZoneId.SHORT_IDS)
        .normalized().getRules.isFixedOffset,
      s"gapFill: session timezone '$sessTz' observes offset transitions " +
        "(DST) — the dense grid needs a fixed-offset zone; set " +
        "spark.sql.session.timeZone to UTC (Graft.configure does)")
    val startMs = s"${g}_start_ms"
    def resolve(c: String): String =
      ev.columns.find(_.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"gapFill: no column '$c' (has ${ev.columns.mkString(", ")})"))
    val ts = resolve(tsCol)
    val series = resolve(seriesCol)
    val value = resolve(valueCol)
    val id = resolve(idCol)
    // the rewrite's working/output names must not collide with the
    // caller's series name (every other column is dropped at the agg)
    val reserved = Set("hour", "n", "sv", "close", "lo", "hi",
      startMs, "sum_value", "close_ffill", "__bhour", "__bseries")
    require(!reserved(series.toLowerCase),
      s"gapFill: series column '$series' is reserved by the rewrite; " +
        "rename it upstream")
    // ONE corpus pass: bounds and the series set are derived from the
    // bar-grain aggregate (min/max of truncated hours ≡ truncated
    // min/max of ts; bar-grain distinct series ≡ corpus distinct),
    // persisted so the grid's two tiny reads hit bar-scale data — the
    // first cut re-scanned the corpus for each (review find)
    val bars = graft.engine.Caching.persist(ev
      .groupBy(date_trunc(g, col(ts)).as("hour"), col(series))
      .agg(count(lit(1)).as("n"), Exact.fixSum(col(value), 2).as("sv"),
        max_by(col(value), col(id)).as("close")))
    // grid generation: ONE sequence() array per corpus is fine at
    // calendar grains (~87k hours per decade), but a MINUTE grid would
    // materialize the whole span in a single row's array (~5.3M
    // elements per decade — one task's memory, r15 review find);
    // sub-hour grains explode DAYS first, then the ≤ 1440 minutes
    // inside each day, so no array outgrows a day
    val bounds = bars.agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
    val gridBars =
      if (g == "minute")
        bounds.select(col("lo"), col("hi"),
            explode(sequence(date_trunc("day", col("lo")),
              date_trunc("day", col("hi")), expr("INTERVAL 1 DAY"))).as("d"))
          .select(explode(sequence(
            greatest(col("lo"), col("d")),
            least(col("hi"), col("d") + expr("INTERVAL 1439 MINUTE")),
            expr("INTERVAL 1 MINUTE"))).as("hour"))
      else
        bounds.select(explode(sequence(col("lo"), col("hi"),
          expr(s"INTERVAL 1 ${g.toUpperCase}"))).as("hour"))
    val grid = gridBars.crossJoin(bars.select(series).distinct())
    val w = Window.partitionBy(series).orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL-SAFE series join (r15 review find): a NULL series is a real
    // group — the agg keeps it and distinct() grids it — but an
    // equi-join would never match it back, silently replacing its
    // activity with fabricated all-zero bars; `<=>` keeps it whole.
    // The bars side renames its join columns so the window/select refs
    // stay unambiguous after the join.
    val barsR = bars.withColumnRenamed("hour", "__bhour")
      .withColumnRenamed(series, "__bseries")
    // max_by keeps valueCol's own type: the fill's zero must match it
    // or a DECIMAL close would silently widen to DOUBLE (r15 review
    // find — decSum's sum_value is already double by contract)
    val closeType = bars.schema("close").dataType
    grid.join(barsR,
        col("hour") === col("__bhour") && col(series) <=> col("__bseries"),
        "left")
      .select(col(series), Exact.epochMs(col("hour")).as(startMs),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sv"), lit(0.0)).as("sum_value"),
        coalesce(last(col("close"), ignoreNulls = true).over(w),
          lit(0).cast(closeType)).as("close_ffill"))
      .orderBy(series, startMs)
  }

  val gapFillHourlyOracle: String =
    s"""WITH b AS (
      |  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
      |         ${Exact.decSumSql("value")} AS sv,
      |         arg_max(value, event_id) AS close
      |  FROM events GROUP BY 1, 2),
      |bounds AS (
      |  SELECT date_trunc('hour', min(ts)) AS lo,
      |         date_trunc('hour', max(ts)) AS hi FROM events),
      |grid AS (
      |  SELECT g.hour, t.event_type
      |  FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
      |        FROM bounds) g
      |  CROSS JOIN (SELECT DISTINCT event_type FROM events) t)
      |SELECT g.event_type, epoch_ms(g.hour) AS hour_start_ms,
      |       COALESCE(b.n, 0) AS n, COALESCE(b.sv, 0.0) AS sum_value,
      |       COALESCE(last_value(b.close IGNORE NULLS) OVER (
      |         PARTITION BY g.event_type ORDER BY g.hour
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS close_ffill
      |FROM grid g LEFT JOIN b ON b.hour = g.hour AND b.event_type = g.event_type
      |ORDER BY g.event_type, hour_start_ms""".stripMargin

  /** t4b: [[gapFill]] through PLAIN SQL (r15) — the `gap_fill('table',
    * 'ts', 'series', 'value', 'id')` table function over a registered
    * lake table; the t4 business question re-asked through the second
    * front door, sharing t4's oracle restatement. */
  def gapFillHourlySql(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.lake.Snapshots
    val ev = Tables(spark, dir).events
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val t = graft.engine.Graft.freshDir(
      "t4b-events-" + dir.replaceAll("[^A-Za-z0-9.]", "_"))
    Snapshots.commit(t, Snapshots.stage(
      ev.withColumn("day", lit("d")), t, "day"))
    graft.sql.LakeSql.register(spark, "t4bev", t, "day")
    spark.sql(
      """SELECT event_type, hour_start_ms, n, sum_value, close_ffill
        |FROM gap_fill('t4bev', 'ts', 'event_type', 'value', 'event_id')
        |ORDER BY event_type, hour_start_ms""".stripMargin)
  }

  /** t4c: the DAY grain through the TVF (r15) — same machinery, the
    * grid steps by calendar days and the bar column names itself
    * `day_start_ms`; the oracle restates with `date_trunc('day')` and
    * a 1-day `generate_series`. */
  def gapFillDailySql(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.lake.Snapshots
    val ev = Tables(spark, dir).events
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val t = graft.engine.Graft.freshDir(
      "t4c-events-" + dir.replaceAll("[^A-Za-z0-9.]", "_"))
    Snapshots.commit(t, Snapshots.stage(
      ev.withColumn("day", lit("d")), t, "day"))
    graft.sql.LakeSql.register(spark, "t4cev", t, "day")
    spark.sql(
      """SELECT event_type, day_start_ms, n, sum_value, close_ffill
        |FROM gap_fill('t4cev', 'ts', 'event_type', 'value', 'event_id',
        |              'day')
        |ORDER BY event_type, day_start_ms""".stripMargin)
  }

  val gapFillDailyOracle: String =
    s"""WITH b AS (
      |  SELECT date_trunc('day', ts) AS d, event_type, count(*) AS n,
      |         ${Exact.decSumSql("value")} AS sv,
      |         arg_max(value, event_id) AS close
      |  FROM events GROUP BY 1, 2),
      |bounds AS (
      |  SELECT date_trunc('day', min(ts)) AS lo,
      |         date_trunc('day', max(ts)) AS hi FROM events),
      |grid AS (
      |  SELECT g.d, t.event_type
      |  FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d
      |        FROM bounds) g
      |  CROSS JOIN (SELECT DISTINCT event_type FROM events) t)
      |SELECT g.event_type, epoch_ms(g.d) AS day_start_ms,
      |       COALESCE(b.n, 0) AS n, COALESCE(b.sv, 0.0) AS sum_value,
      |       COALESCE(last_value(b.close IGNORE NULLS) OVER (
      |         PARTITION BY g.event_type ORDER BY g.d
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS close_ffill
      |FROM grid g LEFT JOIN b ON b.d = g.d AND b.event_type = g.event_type
      |ORDER BY g.event_type, day_start_ms""".stripMargin

  /** t5 — OHLCV CANDLES (r15): the trade domain's native bar — per
    * (series, hour): open = the FIRST event's value, high/low =
    * min/max, close = the LAST event's value, volume = exact decimal
    * sum, n = trade count. "First"/"last" are deterministic under any
    * partitioning: the verdict orders by the (ts, event_id) TUPLE
    * (`max_by`/`min_by` over a struct — lexicographic), never by ts
    * alone, whose ties would break arbitrarily; the oracle restates
    * the same rule as window first/last over `ORDER BY ts, event_id`.
    * One map-combinable groupBy — bar-grain output, corpus touched
    * once; at 100 TB this is THE shape that turns a trade firehose
    * into chartable bars. */
  def ohlcvBars(spark: SparkSession, dir: String): DataFrame =
    ohlcvBarsOf(Tables(spark, dir).events)

  /** The one OHLCV aggregate list, shared verbatim by the batch form
    * and the append-mode stream so the two can never drift.
    *
    * UPGRADE NOTE (r17 ADVICE): the r17 decSum→fixSum switch changed the
    * streaming AGGREGATION STATE SCHEMA (DECIMAL(25,6) sum buffer →
    * LONG). Resuming a structured-streaming checkpoint written by the
    * pre-r17 build fails the state-store schema compatibility check —
    * deliberate and loud; discard such checkpoints on upgrade (every
    * bench/test drain already starts from a fresh checkpoint). */
  private def ohlcvAggs: Seq[org.apache.spark.sql.Column] = Seq(
    min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
    max(col("value")).as("high"),
    min(col("value")).as("low"),
    max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
    Exact.fixSum(col("value"), 2).as("volume"),
    count(lit(1)).as("n"))

  private def ohlcvOut = Seq(col("open"), col("high"), col("low"),
    col("close"), col("volume"), col("n"))

  private[graft] def ohlcvBarsOf(ev: DataFrame): DataFrame =
    ev
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(ohlcvAggs.head, ohlcvAggs.tail: _*)
      .select(col("event_type") +: Exact.epochMs(col("h")).as("hour_start_ms")
        +: ohlcvOut: _*)
      .orderBy("event_type", "hour_start_ms")

  /** [[ohlcvBars]]'s APPEND-MODE streaming form (r16, the r15 verdict
    * item — the complete-mode twin re-stated every bar each trigger,
    * correct but unbounded over an infinite stream): the SAME
    * aggregate list over a watermarked 1-hour `window`, so each bar
    * emits exactly ONCE, when the watermark passes its hour's close —
    * at which point the bar's state is also EVICTED, keeping state
    * size proportional to open hours × series, not stream history.
    * Trades later than `delay` are dropped by contract (the watermark
    * semantics); the complete-mode twin remains the re-statement form
    * for consumers who prefer late-trade corrections over bounded
    * state. This finalized-hour emission is exactly the reference's
    * hourly bronze partitioning cadence
    * (`kafka_to_s3_bronze.py:49-54`). No presentation sort: append
    * streams cannot sort, and the bar's identity
    * (event_type, hour_start_ms) is carried on every row. */
  def ohlcvBarsStream(ev: DataFrame, delay: String = "10 minutes"): DataFrame = {
    // the batch twin buckets by date_trunc('hour') — SESSION-LOCAL hour
    // boundaries — while append streaming must bucket by `window()`,
    // which aligns to the UTC epoch. The two coincide exactly when the
    // session zone is a WHOLE-HOUR fixed offset; on a fractional offset
    // (UTC+05:30) the doors would silently bucket the same trade into
    // different bars (r16 review find) — refuse instead.
    val tz = ev.sparkSession.sessionState.conf.sessionLocalTimeZone
    val rules = java.time.ZoneId.of(tz, java.time.ZoneId.SHORT_IDS)
      .normalized().getRules
    require(rules.isFixedOffset &&
      rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds % 3600 == 0,
      s"ohlcvBarsStream: session timezone '$tz' is not a whole-hour " +
        "fixed offset — its local hour boundaries differ from the " +
        "epoch-aligned streaming windows, so streamed bars would not " +
        "equal the batch bars; set spark.sql.session.timeZone to UTC " +
        "(Graft.configure does)")
    ev.withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(ohlcvAggs.head, ohlcvAggs.tail: _*)
      .select(col("event_type") +:
        Exact.epochMs(col("window.start")).as("hour_start_ms")
        +: ohlcvOut: _*)
  }

  val ohlcvBarsOracle: String =
    s"""WITH ranked AS (
      |  SELECT date_trunc('hour', ts) AS h, event_type, value,
      |         first_value(value) OVER (
      |           PARTITION BY date_trunc('hour', ts), event_type
      |           ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS open,
      |         last_value(value) OVER (
      |           PARTITION BY date_trunc('hour', ts), event_type
      |           ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close
      |  FROM events)
      |SELECT event_type, epoch_ms(h) AS hour_start_ms,
      |       any_value(open) AS open, max(value) AS high, min(value) AS low,
      |       any_value(close) AS close,
      |       ${Exact.decSumSql("value")} AS volume, count(*) AS n
      |FROM ranked GROUP BY h, event_type
      |ORDER BY event_type, hour_start_ms""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("t1_tumbling_hourly", tumblingHourlyOracle)(tumblingHourly),
    QueryDef.sql("t5_ohlcv_bars", ohlcvBarsOracle)(ohlcvBars),
    QueryDef.sql("t2_sliding_window", slidingWindowOracle)(slidingWindow),
    QueryDef.sql("t3_session_window", sessionWindowsOracle)(sessionWindows),
    QueryDef.sql("t4_gap_fill", gapFillHourlyOracle)(gapFillHourly),
    QueryDef.sql("t4b_gap_fill_sql", gapFillHourlyOracle)(gapFillHourlySql),
    QueryDef.sql("t4c_gap_fill_daily_sql", gapFillDailyOracle)(gapFillDailySql))
}
