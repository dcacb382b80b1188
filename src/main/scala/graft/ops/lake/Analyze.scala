package graft.ops.lake

import graft.engine.{Exact, Graft, QueryDef, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANALYZE TABLE — table-level column statistics in snapshot props
  * (the `ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS` verb):
  * exact per-column NDV and null counts plus the row count, recorded
  * as `tbl.stat.*` props so they ride every later commit (inherited
  * namespace) with the ANALYZED VERSION stamped alongside
  * (`tbl.stat.v`) — consumers can see staleness instead of guessing.
  *
  * This is the input a cost-based choice needs WITHOUT scanning:
  * broadcast vs dynamic-file-pruning vs shuffle-hash all hinge on
  * "how many distinct keys" ([[DynamicFilter.strategyByStats]] reads
  * these to skip the key-collect job entirely when the recorded NDV
  * says the IN-list path cannot fit its cap). Footer stats give
  * min/max/null per FILE; NDV is the one number they cannot provide —
  * it needs this one deliberate pass.
  *
  * Scale: ONE aggregation job over the merged table computes every
  * requested column's exact `count(distinct)` + null count together
  * (Catalyst plans multi-distinct via Expand — the row stream
  * multiplies by #distinct-aggs, the price of exactness in one pass).
  * Exact NDV keeps the stats oracle-checkable; a 100 TB operator who
  * prefers one cheap pass can ANALYZE a column subset — stats are
  * per-column and absent columns simply record nothing.
  *
  * Ref analog: none — the reference delegates statistics to BigQuery's
  * planner; this engine records its own. Shape follows the public
  * Spark/Delta ANALYZE TABLE surface re-expressed over snapshot props.
  */
object Analyze {

  private val VProp = "tbl.stat.v"
  private val RowsProp = "tbl.stat.rows"
  private def ndvKey(phys: String) = s"tbl.stat.ndv.$phys"
  private def nullsKey(phys: String) = s"tbl.stat.nulls.$phys"

  /** Commit `props` plus a freshness stamp under each of `vKeys` —
    * ATOMICALLY truthful about which version the stamp names.
    *
    * The stamp a stats family records as "the version these stats
    * describe" is the refresh's OWN props-only commit when nothing
    * intervened, the SCANNED version otherwise. Stamping the
    * pre-commit version unconditionally (r15) left every stamp lagging
    * the live version by the refresh commit itself, so a small
    * staleness budget re-triggered the zero-scan refresh on every user
    * commit forever (r15 advisor — the stale-by-construction
    * treadmill); the props-only commit republishes the folded rows
    * byte-identically, so stats that describe v describe v+1 exactly
    * as well — but ONLY while v is still the live version.
    *
    * Atomicity (r16 advisor find): the old check-then-commit
    * (`refreshStamp` reads currentVersion, then commitProps re-reads
    * it) let a concurrent data commit slip between the two — the props
    * commit landed at cur+2 while the stamp named cur+1, a data commit
    * the stats never described. The claim is now a CAS:
    * [[Snapshots.commitPropsAt]] publishes EXACTLY cur+1 or throws,
    * and on conflict the loop re-reads — at which point cur != scanned
    * and the stamp falls back to the truthful scanned version (the
    * stats surface as stale, the safe direction; strategyByStats must
    * never read pre-append row counts as fresh). */
  private def commitStamped(table: String, scanned: Long,
      vKeys: Seq[String], props: Map[String, String]): Long = {
    // retries are CAPPED, matching commitAllWithRetry's discipline: an
    // unbounded loop here would block the committing thread for as long
    // as contention lasts — and maybeAutoRefresh runs INSIDE
    // commitPrepared, so that thread is a user's data commit. The
    // budget (~4 s of exponential backoff) is sized for the thing it
    // guards against — a writer STORM, not routine interleaving: a
    // too-tight cap (63 ms, first cut) threw away a completed
    // multi-minute ANALYZE scan under a 10 ms-cadence streaming sink
    // (r17 second review pass). After the cap the refresh fails
    // loudly; the auto-refresh hook catches and warns (stats surface
    // stale — the documented consumer fallback), direct ANALYZE
    // callers see the error with their scan results intact to re-commit.
    val maxRetries = 20
    var backoffMs = 1L
    for (_ <- 0 until maxRetries) {
      val cur = Snapshots.currentVersion(table)
      val stamp = (if (cur == scanned) cur + 1 else scanned).toString
      try return Snapshots.commitPropsAt(table, cur,
        props ++ vKeys.map(_ -> stamp))
      catch {
        case _: Snapshots.ConcurrentCommitException =>
          Thread.sleep(backoffMs); backoffMs = math.min(500L, backoffMs * 2)
      }
    }
    throw new IllegalStateException(
      s"commitStamped($table): lost the props-commit race $maxRetries " +
        "times — stats left unrecorded (consumers fall back to their " +
        "pre-stats behavior); re-run when the writer storm settles")
  }

  /** Compute and record stats for `columns` (empty = every column) of
    * `table`'s live snapshot. Returns one (column, ndv, nulls) row per
    * analyzed column plus the row count; the same rows the SQL verb
    * surfaces. */
  /** MAP anywhere in a type makes `count(distinct)` un-plannable
    * (maps are not groupable/orderable in Spark) — the shared
    * [[graft.engine.Schemas.mapFree]] predicate. */
  private def analyzable(dt: org.apache.spark.sql.types.DataType): Boolean =
    graft.engine.Schemas.mapFree(dt)

  def analyze(spark: SparkSession, table: String,
              columns: Seq[String] = Seq.empty): (Long, Seq[(String, Long, Long)]) = {
    val v = Snapshots.currentVersion(table)
    require(v >= 1, s"analyze($table): no committed snapshot")
    val df = Mutations.readMerged(spark, table, mergeSchema = true)
    // requested names resolve to the SCHEMA's canonical spelling —
    // props keyed under a caller's case variant would silently miss
    // every later ndvOf/strategyByStats lookup (r12 review find);
    // explicitly-requested un-analyzable types reject loudly, the
    // all-columns default skips them (r12 review find) — shared with
    // [[analyzeApprox]] via [[resolveCols]]
    val cols = resolveCols(table, df, columns)
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap(c => Seq(
      count_distinct(col(s"`$c`")).as(s"__ndv_$c"),
      sum(when(col(s"`$c`").isNull, 1L).otherwise(0L)).as(s"__nulls_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = row.getLong(0)
    val stats = cols.zipWithIndex.map { case (c, i) =>
      (c, row.getLong(1 + 2 * i),
        if (row.isNullAt(2 + 2 * i)) 0L else row.getLong(2 + 2 * i))
    }
    val props = Map(RowsProp -> rows.toString) ++
      stats.flatMap { case (c, ndv, nulls) =>
        val p = Snapshots.physicalName(table, c)
        Seq(ndvKey(p) -> ndv.toString, nullsKey(p) -> nulls.toString)
      }
    commitStamped(table, v, Seq(VProp), props)
    (rows, stats)
  }

  /** SKETCH-BASED stats refresh (r14, the [[histogramApprox]] story
    * for the NDV family): exact [[analyze]] plans multi-distinct via
    * Expand — the row stream multiplies by #distinct-aggs, the price
    * of oracle-checkable exactness — which at 100 TB invites the same
    * permanent staleness the histogram's global sort did, and stale
    * stats silently disable every CBO consumer. This form computes NDV
    * via `approx_count_distinct` (HyperLogLog++: bounded per-partition
    * sketches, partial merge, ONE narrow aggregation with no Expand
    * and no shuffle beyond the final merge) and records into the SAME
    * props, so [[ndvOf]]/[[DynamicFilter.strategyByStats]]/
    * [[graft.ops.gold.Skew.strategyByStats]] read either form
    * transparently. Null counts and the row count stay exact (plain
    * sums — they were never the expensive part). NDV error is bounded
    * by `relativeSD`; an estimate feeding COST choices, never a
    * correctness gate. */
  def analyzeApprox(spark: SparkSession, table: String,
                    columns: Seq[String] = Seq.empty,
                    relativeSD: Double = 0.02): (Long, Seq[(String, Long, Long)]) = {
    val v = Snapshots.currentVersion(table)
    require(v >= 1, s"analyzeApprox($table): no committed snapshot")
    require(relativeSD > 0.0 && relativeSD < 0.4,
      s"analyzeApprox($table): relativeSD must be in (0, 0.4), got $relativeSD")
    // ONE merged read serves resolution and the aggregate (r14 review
    // find — the duplicate manifest/schema pass is the cost this verb
    // exists to avoid)
    val df = Mutations.readMerged(spark, table, mergeSchema = true)
    val (cols, aggDf) = approxStatsOn(df, table, columns, relativeSD)
    val row = aggDf.head()
    val rows = row.getLong(0)
    val stats = cols.zipWithIndex.map { case (c, i) =>
      (c, row.getLong(1 + 2 * i),
        if (row.isNullAt(2 + 2 * i)) 0L else row.getLong(2 + 2 * i))
    }
    val props = Map(RowsProp -> rows.toString) ++
      stats.flatMap { case (c, ndv, nulls) =>
        val p = Snapshots.physicalName(table, c)
        Seq(ndvKey(p) -> ndv.toString, nullsKey(p) -> nulls.toString)
      }
    commitStamped(table, v, Seq(VProp), props)
    (rows, stats)
  }

  /** ZERO-SCAN stats refresh from per-file HLL sketches
    * ([[Snapshots.withHll]], r14): NDV folds by UNIONING the sidecar
    * sketches each file recorded when its rows were first written —
    * no data file (or footer) opens at all; row and null counts fold
    * from the per-entry manifest props the commit protocol already
    * records. The one Spark job runs over #files sketch rows —
    * manifest scale, not data scale: on a 10⁶-file table a stats
    * refresh costs seconds of metadata work instead of a table scan,
    * which is what actually keeps CBO stats fresh enough for the
    * staleness-guarded consumers to stay enabled.
    *
    * Records into the SAME props as [[analyze]]/[[analyzeApprox]].
    * Refuses loudly when the fold would lie: deletion vectors present
    * (sketches describe pre-delete file content — compact first or pay
    * the [[analyzeApprox]] scan), an entry without a sketch/row
    * count/null count (pre-HLL commit or all-NULL file). Estimates are
    * HLL++-accurate; the union over many small sketches is exactly as
    * good as one big sketch over the same rows (the mergeability
    * contract). */
  def analyzeFromSketches(spark: SparkSession, table: String,
                          columns: Seq[String]): (Long, Seq[(String, Long, Long)]) = {
    val scanned = Snapshots.currentVersion(table)
    val (rows, stats, props) = ndvFoldFromSketches(spark, table, columns)
    commitStamped(table, scanned, Seq(VProp), props)
    (rows, stats)
  }

  /** [[analyzeFromSketches]]'s fold without the commit: (rows, stats,
    * props-minus-version-stamp) — so [[maybeAutoRefresh]] can fold
    * every due family into ONE props commit (r15 advisor: one commit
    * per family leapfrogged every other family's stamp). */
  private def ndvFoldFromSketches(spark: SparkSession, table: String,
                                  columns: Seq[String])
      : (Long, Seq[(String, Long, Long)], Map[String, String]) = {
    require(columns.nonEmpty,
      s"analyzeFromSketches($table): name the sketched columns")
    val v = Snapshots.currentVersion(table)
    require(v >= 1, s"analyzeFromSketches($table): no committed snapshot")
    val entries = Snapshots.entriesAll(table)
    require(entries.nonEmpty,
      s"analyzeFromSketches($table): empty table — nothing to fold")
    entries.find(_.props.contains(Snapshots.DvRefProp)).foreach { e =>
      throw new IllegalStateException(
        s"analyzeFromSketches($table): ${e.rel} carries a deletion " +
          "vector — per-file sketches describe pre-delete content, so " +
          "the fold would over-count; compact first or run " +
          "analyzeApprox (one scan)")
    }
    def entryLong(e: Snapshots.Entry, key: String, what: String): Long =
      e.props.get(key).flatMap(_.toLongOption).getOrElse(
        throw new IllegalStateException(
          s"analyzeFromSketches($table): entry ${e.rel} records no " +
            s"$what — pre-r11 commit? run analyzeApprox instead"))
    val rows = entries.map(entryLong(_, Snapshots.RowsProp, "row count")).sum
    val stats = columns.map { c =>
      val pcol = Snapshots.physicalName(table, c)
      val bytes = Snapshots.hllSketches(table, entries, pcol)
      // every file all-NULL in this column: zero distinct values, and
      // hll_union_agg over zero rows would answer NULL (r16)
      val ndv = if (bytes.isEmpty) 0L
        else spark.createDataset(bytes)(
          org.apache.spark.sql.Encoders.BINARY).toDF("s")
        .agg(expr("hll_sketch_estimate(hll_union_agg(s, true))"))
        .head().getLong(0)
      val nulls = entries.map(entryLong(_, s"nulls.$pcol", s"null count for $pcol")).sum
      (c, ndv, nulls)
    }
    val props = Map(RowsProp -> rows.toString) ++
      stats.flatMap { case (c, ndv, nulls) =>
        val p = Snapshots.physicalName(table, c)
        Seq(ndvKey(p) -> ndv.toString, nullsKey(p) -> nulls.toString)
      }
    (rows, stats, props)
  }

  // ---- AUTO ANALYZE (r15, the r14 verdict item) ---------------------

  /** Table properties declaring commit-time stats auto-refresh:
    * `maxstale` is the staleness BUDGET in versions, `cols` the
    * comma-separated logical columns to keep fresh. Both live in the
    * inherited `tbl.` namespace, so every later commit carries them. */
  private[graft] val AutoStaleProp = "tbl.autoanalyze.maxstale"
  private[graft] val AutoColsProp = "tbl.autoanalyze.cols"
  private[graft] val AutoFreqColsProp = "tbl.autoanalyze.freqcols"
  private[graft] val AutoHistColsProp = "tbl.autoanalyze.histcols"

  /** Declare AUTO ANALYZE on `table`: whenever a commit leaves the
    * recorded stats more than `maxStaleVersions` versions behind the
    * just-published snapshot, [[Snapshots.commitPrepared]] re-folds
    * the write-time per-file HLL sketches ([[analyzeFromSketches]] —
    * manifest-scale work, ZERO data reads) for `columns`, so every
    * consumer of the NDV/ROWS family ([[DynamicFilter.strategyByStats]],
    * the broadcast/containment inputs of
    * [[graft.ops.gold.Skew.strategyByStats]] and
    * [[graft.ops.gold.JoinOrder.orderByStats]]) keeps its fast path
    * without anyone remembering to run ANALYZE. The closing piece of
    * the r14 stats substrate: refresh was already zero-data-read;
    * now it is also zero-operator. `freqColumns` (r15) additionally
    * keeps the FREQUENCY family fresh — the salt election's evidence —
    * from the per-file top-k sidecars ([[Snapshots.withTopK]] /
    * [[frequentKeysFromSketches]]: a pure driver-side fold, not even a
    * Spark job), each frequency column refreshing against its OWN
    * per-family version stamp. SCOPE: HISTOGRAMS have no write-time
    * sketch to fold and keep their manual (or [[histogramApprox]])
    * refresh; past their own staleness budget those consumers degrade
    * exactly as without AUTO ANALYZE.
    *
    * `columns` must be sketched at write time ([[Snapshots.withHll]] /
    * `stageWithStats`) — a refresh finding no sketch (or a deletion
    * vector) WARNS and leaves the stats stale rather than failing the
    * already-published commit; consumers degrade to their documented
    * pre-stats behavior, exactly as with manual staleness.
    *
    * SQL door: the declaration is two plain table properties, so
    * `ALTER GRAFT TABLE t SET TBLPROPERTIES
    * ('tbl.autoanalyze.maxstale'='16', 'tbl.autoanalyze.cols'='id')`
    * is the exact equivalent — no new grammar needed. */
  def autoAnalyze(table: String, columns: Seq[String],
                  maxStaleVersions: Long = 16,
                  freqColumns: Seq[String] = Seq.empty,
                  histColumns: Seq[String] = Seq.empty): Long = {
    require(columns.nonEmpty || freqColumns.nonEmpty || histColumns.nonEmpty,
      s"autoAnalyze($table): name the columns")
    require(maxStaleVersions >= 1,
      s"autoAnalyze($table): maxStaleVersions must be >= 1 (the refresh " +
        s"itself commits a props version), got $maxStaleVersions")
    require((columns ++ freqColumns ++ histColumns).forall(!_.contains(",")),
      s"autoAnalyze($table): column names must be comma-free")
    // a RE-declaration replaces the whole declaration: an omitted
    // family is retired, not silently inherited from the previous one
    // (r15 review find — a freq family gone sidecar-less would
    // otherwise warn on every commit forever with no way out)
    def declare(p: String, cs: Seq[String]) =
      if (cs.nonEmpty) Map(p -> cs.mkString(",")) else Map.empty[String, String]
    def retire(p: String, cs: Seq[String]) =
      if (cs.isEmpty) Set(p) else Set.empty[String]
    Snapshots.commitProps(table,
      Map(AutoStaleProp -> maxStaleVersions.toString) ++
        declare(AutoColsProp, columns) ++
        declare(AutoFreqColsProp, freqColumns) ++
        declare(AutoHistColsProp, histColumns),
      unset = retire(AutoColsProp, columns) ++
        retire(AutoFreqColsProp, freqColumns) ++
        retire(AutoHistColsProp, histColumns))
  }

  /** Retire the AUTO ANALYZE declaration. */
  def autoAnalyzeOff(table: String): Long =
    Snapshots.commitProps(table, Map.empty,
      unset = Set(AutoStaleProp, AutoColsProp, AutoFreqColsProp,
        AutoHistColsProp))

  // the refresh's own commitProps re-enters commitPrepared: bail by
  // thread, not by staleness math alone — belt over suspenders
  private val refreshing = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }

  /** Commit-time hook, called by [[Snapshots.commitPrepared]] AFTER the
    * snapshot is published, with the published version's full prop set
    * (so the no-op path — no AUTO ANALYZE declared — costs one map
    * lookup, zero IO). Refresh failures never fail the commit: the
    * snapshot is already live, so a sketchless column or a DV-bearing
    * table warns and degrades to stale stats (the consumers' documented
    * fallback). Needs an active session for the manifest-scale HLL
    * fold; commits from sessionless contexts skip with a warning. */
  private[lake] def maybeAutoRefresh(table: String, committed: Long,
                                     props: Map[String, String]): Unit = {
    val budget = props.get(AutoStaleProp).flatMap(_.toLongOption)
    if (budget.isEmpty || refreshing.get()) return
    def declared(p: String): Seq[String] = props.get(p)
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq.empty)
    val cols = declared(AutoColsProp)
    val freqCols = declared(AutoFreqColsProp)
    val histCols = declared(AutoHistColsProp)
    if (cols.isEmpty && freqCols.isEmpty && histCols.isEmpty) return
    // never-recorded reads as infinitely stale: the declaration alone
    // bootstraps the first fold (per family — frequencies stamp their
    // own per-column version)
    def stale(v: Option[Long]): Boolean = v.forall(committed - _ > budget.get)
    val ndvDue = cols.nonEmpty &&
      stale(props.get(VProp).flatMap(_.toLongOption))
    // the rename mapping is already IN the published props — deriving
    // the physical name through Snapshots.physicalName would re-read
    // the snapshot log on EVERY commit just to decide "not stale"
    // (r15 review find; this hook's no-op path is contractually
    // zero-IO)
    val renames = props.collect {
      case (key, lg) if key.startsWith(Snapshots.LogicalPropPrefix) =>
        key.drop(Snapshots.LogicalPropPrefix.length) -> lg
    }
    def physOf(c: String): String =
      renames.collectFirst { case (ph, lg) if lg == c => ph }.getOrElse(c)
    val freqDue = freqCols.filter { c =>
      stale(props.get(freqVKey(physOf(c))).flatMap(_.toLongOption))
    }
    val histDue = histCols.filter { c =>
      stale(props.get(histVKey(physOf(c))).flatMap(_.toLongOption))
    }
    if (!ndvDue && freqDue.isEmpty && histDue.isEmpty) return
    refreshing.set(true)
    try {
      def warn(what: String, e: Throwable): Unit =
        System.err.println(s"[autoanalyze] $table: $what refresh failed " +
          s"(${e.getMessage}); stats left stale — consumers fall back " +
          "to their pre-stats behavior")
      // EVERY due family folds into ONE props commit (r15 advisor: one
      // commit per family advanced the version under the other
      // families' stamps — with a small budget the refresh re-triggered
      // on every user commit forever). Per-family failure isolation
      // stays: a failed fold just contributes nothing to the commit.
      val acc = scala.collection.mutable.Map.empty[String, String]
      val stampKeys = scala.collection.mutable.ArrayBuffer.empty[String]
      // each family refreshes at the RECORDED resolution — folding at
      // the defaults silently reset a user's chosen k/buckets on the
      // first auto refresh (r16 advisor find; the same precision rule
      // withSketchesLike applies to rewrite-time sidecars). The
      // REQUESTED resolution prop (histResKey/freqResKey, stamped by
      // every record path) is authoritative; a pre-r17 table without
      // it falls back to the recorded list's length — imperfect (a
      // distinct-limited column under-records), but better than the
      // defaults, and self-healing: the fallback fold re-records the
      // explicit prop. Clamps are per FAMILY (hist ≤ 1024, freq ≤ 256
      // — min(256) here once silently halved a 512-bucket histogram,
      // r17 review find). Nothing recorded yet → defaults bootstrap.
      def resolution(resKey: String, listKey: String,
                     lo: Int, hi: Int, dflt: Int): Int =
        props.get(resKey).flatMap(_.toIntOption)
          .orElse(props.get(listKey).map(_.split(",").count(_.nonEmpty)))
          .filter(_ >= lo).map(math.min(hi, _)).getOrElse(dflt)
      // frequencies first: a pure driver-side sidecar fold, no session
      // needed
      freqDue.foreach { c =>
        try {
          val (_, p, vk) = freqFoldFromSketches(table, c,
            k = resolution(freqResKey(physOf(c)), freqKey(physOf(c)), 1, 256, 16))
          acc ++= p; stampKeys += vk
        }
        catch { case scala.util.control.NonFatal(e) => warn(s"freq($c)", e) }
      }
      // histograms fold driver-side too (r16 — the quantile sidecars)
      histDue.foreach { c =>
        try {
          val (_, p, vk) = histFoldFromSketches(table, c,
            buckets = resolution(histResKey(physOf(c)), histKey(physOf(c)), 2, 1024, 32))
          acc ++= p; stampKeys += vk
        }
        catch { case scala.util.control.NonFatal(e) => warn(s"hist($c)", e) }
      }
      if (ndvDue) {
        SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession) match {
          case None =>
            System.err.println(s"[autoanalyze] $table: NDV stats stale " +
              "but no active SparkSession for the sketch fold; left stale")
          case Some(spark) =>
            try {
              val (_, _, p) = ndvFoldFromSketches(spark, table, cols)
              acc ++= p; stampKeys += VProp
            }
            catch { case scala.util.control.NonFatal(e) => warn("sketch", e) }
        }
      }
      if (stampKeys.nonEmpty) {
        // each family stamps THIS commit's own version: the distance a
        // later commit computes then excludes the refresh itself
        try commitStamped(table, committed, stampKeys.toSeq, acc.toMap)
        catch { case scala.util.control.NonFatal(e) => warn("commit", e) }
      }
    } finally refreshing.set(false)
  }

  /** The one-row aggregate behind [[analyzeApprox]]. */
  private def approxStatsOn(df: DataFrame, table: String,
                            columns: Seq[String],
                            relativeSD: Double): (Seq[String], DataFrame) = {
    val cols = resolveCols(table, df, columns, "analyzeApprox")
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap(c => Seq(
      approx_count_distinct(col(s"`$c`"), relativeSD).as(s"__ndv_$c"),
      sum(when(col(s"`$c`").isNull, 1L).otherwise(0L)).as(s"__nulls_$c")))
    (cols, df.agg(aggs.head, aggs.tail: _*))
  }

  /** Spec doorway: the [[approxStatsOn]] aggregate, so the plan shape
    * is pinnable (NO Expand — the exact multi-distinct signature; one
    * partial/final HLL++ aggregate). */
  private[graft] def approxStatsDf(spark: SparkSession, table: String,
                                   columns: Seq[String],
                                   relativeSD: Double): DataFrame =
    approxStatsOn(Mutations.readMerged(spark, table, mergeSchema = true),
      table, columns, relativeSD)._2

  /** Shared column resolution for [[analyze]]/[[analyzeApprox]]:
    * requested names resolve to the schema's canonical spelling,
    * explicitly-requested un-analyzable (MAP-bearing) types reject
    * loudly, the all-columns default skips them. */
  private def resolveCols(table: String, df: DataFrame,
                          columns: Seq[String],
                          verb: String = "analyze"): Seq[String] = {
    // `verb` names the CALLING operation in errors — a failure raised
    // from analyzeApprox must not point the operator at analyze
    // (r14 review find)
    val all = df.schema.fields.toSeq
    val resolved = columns.map(c =>
      all.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"$verb($table): unknown column '$c' " +
            s"(table has ${all.map(_.name).mkString(", ")})")))
    resolved.foreach(f => require(analyzable(f.dataType),
      s"$verb($table): column '${f.name}' has type ${f.dataType.sql}, " +
        "which count(distinct) cannot group (MAP somewhere in the type) — " +
        "omit it or analyze other columns"))
    (if (columns.nonEmpty) resolved
     else all.filter(f => analyzable(f.dataType))).map(_.name)
  }

  private def histKey(phys: String) = s"tbl.stat.hist.$phys"
  private def histMinKey(phys: String) = s"tbl.stat.hist.min.$phys"
  private def histVKey(phys: String) = s"tbl.stat.hist.v.$phys"

  /** REQUESTED resolution of the recorded histogram/frequency family,
    * stamped by every record path — what [[maybeAutoRefresh]] restores.
    * Inferring resolution from the recorded LIST length alone was a
    * one-way ratchet (r17 review find): a distinct-limited column (or
    * duplicate rank collapse in the exact histogram) records fewer
    * entries than asked, and a length-derived refresh then pins the
    * shrunken count forever even after the column gains cardinality.
    * Legacy tables without the prop still fall back to the length. */
  private def histResKey(phys: String) = s"tbl.stat.hist.k.$phys"
  private def freqResKey(phys: String) = s"tbl.stat.freq.k.$phys"

  /** EXACT equi-height histogram for a numeric/date/timestamp column:
    * the k bucket UPPER boundaries are the values at global sort ranks
    * `floor(i·n/k)` (1-indexed, i = 1..k) — value-at-rank is
    * well-defined under ties, so the result is deterministic and
    * DuckDB-restatable (the s56 oracle), unlike percentile
    * interpolation semantics that differ across engines. Recorded as
    * a comma-joined prop (`tbl.stat.hist.<phys>`) next to the NDV
    * stats.
    *
    * Scale: one DISTRIBUTED range-sort of the single projected column
    * + a zipWithIndex pass — no single-partition window, no driver
    * materialization beyond the k boundaries. A deliberate maintenance
    * op, same contract as [[analyze]]. */
  def histogram(spark: SparkSession, table: String, column: String,
                buckets: Int = 32): Seq[Double] = {
    require(buckets >= 2 && buckets <= 1024,
      s"histogram($table): buckets must be in [2, 1024], got $buckets")
    val scanned = Snapshots.currentVersion(table)
    val df0 = Mutations.readMerged(spark, table, mergeSchema = true)
    val (fname, e) = histSpaceCol(table, column, df0)
    val vals = df0.select(e.as("v")).na.drop()
    val n = vals.count()
    if (n == 0L) return Seq.empty
    val ranks = (1 to buckets)
      .map(i => math.max(1L, i.toLong * n / buckets) - 1).distinct.toSeq.sorted
    // rank 0 rides along for free: the GLOBAL MIN is the first bucket's
    // true lower edge — without it rangeSelectivity approximated bucket
    // 1 as a point, a documented 1/k error (r12 verdict)
    val wanted = (ranks :+ 0L).toSet
    val got = vals.orderBy(col("v")).rdd.zipWithIndex()
      .filter { case (_, idx) => wanted.contains(idx) }
      .map { case (r, idx) => (idx, r.getDouble(0)) }
      .collect().toMap
    val bounds = ranks.map(got)
    val phys = Snapshots.physicalName(table, fname)
    // staleness is recorded PER STATS FAMILY: the histogram stamps its
    // own version key rather than overwriting `tbl.stat.v` — reusing
    // the shared marker silently over-reported the freshness of the
    // NDV/null stats an earlier analyze() recorded (r12 advisor find)
    commitStamped(table, scanned, Seq(histVKey(phys)), Map(
      histKey(phys) -> bounds.mkString(","),
      histMinKey(phys) -> got(0L).toString,
      histResKey(phys) -> buckets.toString))
    bounds
  }

  /** Shared column→histogram-value-space projection: the column's own
    * doubles for numerics, epoch days for DATE, epoch micros for
    * TIMESTAMP — [[histogram]] and [[histogramApprox]] must record in
    * the SAME space or a refresh would silently change the units every
    * consumer ([[rangeSelectivity]], strategyForRange) reads. */
  private[lake] def histSpaceCol(table: String, column: String, df0: DataFrame,
                           verb: String = "histogram"): (String, org.apache.spark.sql.Column) = {
    val f = df0.schema.fields.find(_.name.equalsIgnoreCase(column)).getOrElse(
      throw new IllegalArgumentException(
        s"$verb($table): unknown column '$column'"))
    import org.apache.spark.sql.types._
    val e = f.dataType match {
      case _: NumericType => col(f.name).cast(DoubleType)
      case DateType => unix_date(col(f.name)).cast(DoubleType)
      case TimestampType => unix_micros(col(f.name)).cast(DoubleType)
      case dt => throw new IllegalArgumentException(
        s"$verb($table): column '${f.name}' has type ${dt.sql} — " +
          "histograms need an ordered numeric/date/timestamp column")
    }
    (f.name, e)
  }

  /** SKETCH-BASED histogram refresh (r14, r13 verdict item 4) — the
    * PRODUCTION maintenance path. [[histogram]] is exact by design
    * (value-at-rank, DuckDB-restatable — the s56 oracle needs it), but
    * its global sort + zipWithIndex prices a 100 TB refresh so high it
    * invites permanent staleness, and stale stats silently disable the
    * whole CBO path ([[DynamicFilter.strategyForRange]]'s lag budget).
    * This form computes the k boundaries from Spark's
    * `approx_percentile` — a MERGEABLE Greenwald-Khanna quantile
    * summary: each partition folds its rows into a bounded sketch,
    * partial sketches merge at the final aggregate, and NOTHING is
    * globally sorted or shuffled beyond the k scalars. One narrow
    * aggregation job, the same shape a per-file-sketch fold would
    * take on a manifest-resident future.
    *
    * Records into the SAME props as [[histogram]] (boundaries, global
    * min, per-family version stamp), so every consumer reads either
    * form transparently; boundary error is bounded by the sketch
    * accuracy (rank error ≤ n/accuracy), which perturbs
    * [[rangeSelectivity]] by at most a bucket fraction — an estimate
    * feeding a COST choice, never a correctness gate. Returns the
    * recorded boundaries. */
  def histogramApprox(spark: SparkSession, table: String, column: String,
                      buckets: Int = 32, accuracy: Int = 10000): Seq[Double] = {
    require(buckets >= 2 && buckets <= 1024,
      s"histogramApprox($table): buckets must be in [2, 1024], got $buckets")
    require(accuracy >= buckets,
      s"histogramApprox($table): accuracy $accuracy must be >= buckets $buckets")
    // ONE merged read serves name resolution and the aggregate — the
    // manifest/schema-union pass must not run twice per refresh on the
    // many-file tables this path exists for (r14 review find)
    val scanned = Snapshots.currentVersion(table)
    val df0 = Mutations.readMerged(spark, table, mergeSchema = true)
    val (name, aggDf) =
      approxBoundsOn(df0, table, column, buckets, accuracy, "histogramApprox")
    val row = aggDf.head()
    if (row.isNullAt(0)) return Seq.empty // all-NULL or empty column
    val gmin = row.getDouble(0)
    val bounds = row.getSeq[Double](1)
    val phys = Snapshots.physicalName(table, name)
    commitStamped(table, scanned, Seq(histVKey(phys)), Map(
      histKey(phys) -> bounds.mkString(","),
      histMinKey(phys) -> gmin.toString,
      histResKey(phys) -> buckets.toString))
    bounds
  }

  /** The one-row aggregate behind [[histogramApprox]] — global min +
    * the k upper boundaries at quantiles i/k. */
  private def approxBoundsOn(df0: DataFrame, table: String, column: String,
                             buckets: Int, accuracy: Int,
                             verb: String): (String, DataFrame) = {
    val (name, e) = histSpaceCol(table, column, df0, verb)
    val ps = (1 to buckets).map(i => lit(i.toDouble / buckets))
    (name, df0.select(e.as("v")).na.drop()
      .agg(min(col("v")).as("mn"),
        percentile_approx(col("v"), array(ps: _*), lit(accuracy)).as("qs")))
  }

  /** Spec doorway: the [[approxBoundsOn]] aggregate, so the NO-SORT
    * plan shape (partial sketch → merge, no SortExec, no range
    * shuffle) is pinnable without re-deriving the aggregation. */
  private[graft] def approxBoundsDf(spark: SparkSession, table: String,
                                    column: String, buckets: Int,
                                    accuracy: Int): DataFrame =
    approxBoundsOn(Mutations.readMerged(spark, table, mergeSchema = true),
      table, column, buckets, accuracy, "histogramApprox")._2

  /** ZERO-SCAN histogram refresh from per-file QUANTILE sidecars
    * ([[Snapshots.withQuantiles]], r16 — the [[analyzeFromSketches]]/
    * [[frequentKeysFromSketches]] discipline applied to the LAST
    * stats family that still cost a scan to refresh): each file's
    * recorded equi-height boundaries merge as WEIGHTED RANK POINTS —
    * boundary j of a file with n non-null rows carries weight n/q —
    * and the k global boundaries are read off the cumulative weight at
    * ranks i·N/k (a collapsing-GK merge; rank error ≤ N/q, i.e. about
    * one global bucket at q = buckets). NO Spark job: the fold is a
    * driver-side pass over manifest-scale sidecar lines. Records into
    * the SAME props as [[histogram]]/[[histogramApprox]] (boundaries,
    * global min, per-family version stamp), so every consumer
    * ([[rangeSelectivity]], [[DynamicFilter.strategyForRange]]) reads
    * any form transparently. Refuses loudly on deletion vectors
    * (pre-delete summaries) and unsketched entries. */
  def histogramFromSketches(table: String, column: String,
                            buckets: Int = 32): Seq[Double] = {
    val scanned = Snapshots.currentVersion(table)
    val (bounds, props, vk) = histFoldFromSketches(table, column, buckets)
    commitStamped(table, scanned, Seq(vk), props)
    bounds
  }

  /** [[histogramFromSketches]]'s fold without the commit — the
    * [[maybeAutoRefresh]] single-commit contract. */
  private def histFoldFromSketches(table: String, column: String,
      buckets: Int): (Seq[Double], Map[String, String], String) = {
    require(buckets >= 2 && buckets <= 1024,
      s"histogramFromSketches($table): buckets in [2, 1024], got $buckets")
    val v = Snapshots.currentVersion(table)
    require(v >= 1, s"histogramFromSketches($table): no committed snapshot")
    val entries = Snapshots.entriesAll(table)
    require(entries.nonEmpty,
      s"histogramFromSketches($table): empty table — nothing to fold")
    entries.find(_.props.contains(Snapshots.DvRefProp)).foreach { e =>
      throw new IllegalStateException(
        s"histogramFromSketches($table): ${e.rel} carries a deletion " +
          "vector — per-file summaries describe pre-delete content, so " +
          "the fold would mis-weigh; compact first or run " +
          "histogramApprox (one scan)")
    }
    val phys = Snapshots.physicalName(table, column)
    val vk = histVKey(phys)
    val sums = Snapshots.quantileSummaries(table, entries, phys).flatten
    if (sums.isEmpty) return (Seq.empty, Map.empty, vk) // all-NULL column
    val gmin = sums.map(_._2).min
    val total = sums.map(_._1).sum.toDouble
    // each file's boundary j closes ~rows/q of that file's mass
    val pts = sums.flatMap { case (n, _, qs) =>
      val w = n.toDouble / qs.size
      qs.map(b => (b, w))
    }.sortBy(_._1)
    val targets = (1 to buckets).map(_.toDouble * total / buckets)
    val bounds = Array.ofDim[Double](buckets)
    var ti = 0
    var cum = 0.0
    pts.foreach { case (value, w) =>
      cum += w
      while (ti < buckets && cum >= targets(ti) - 1e-9) {
        bounds(ti) = value; ti += 1
      }
    }
    while (ti < buckets) { bounds(ti) = pts.last._1; ti += 1 }
    (bounds.toSeq, Map(
      histKey(phys) -> bounds.mkString(","),
      histMinKey(phys) -> gmin.toString,
      histResKey(phys) -> buckets.toString), vk)
  }

  /** Recorded histogram boundaries (None = never computed). */
  def histogramOf(table: String, column: String): Option[Seq[Double]] =
    Snapshots.snapshotProps(table, Snapshots.currentVersion(table))
      .get(histKey(Snapshots.physicalName(table, column)))
      .map(_.split(",").toSeq.filter(_.nonEmpty).map(_.toDouble))

  /** Recorded global minimum of a histogrammed column — the first
    * bucket's true lower edge (None = histogram predates r13 or was
    * never computed). */
  def histogramMinOf(table: String, column: String): Option[Double] =
    Snapshots.snapshotProps(table, Snapshots.currentVersion(table))
      .get(histMinKey(Snapshots.physicalName(table, column)))
      .flatMap(_.toDoubleOption)

  /** Version the recorded histogram of `column` describes (its own
    * staleness signal, independent of [[analyzedVersion]]). */
  def histogramVersionOf(table: String, column: String): Option[Long] =
    Snapshots.snapshotProps(table, Snapshots.currentVersion(table))
      .get(histVKey(Snapshots.physicalName(table, column)))
      .flatMap(_.toLongOption)

  /** Estimated fraction of rows with `column ∈ [lo, hi]` from the
    * recorded equi-height histogram — the range-selectivity input a
    * cost-based choice needs with zero scans. Each of the k buckets
    * holds ~1/k of the rows; buckets fully inside the range count
    * whole, the boundary buckets count by linear interpolation within
    * their value span (the textbook equi-height estimate). None when
    * no histogram is recorded. */
  def rangeSelectivity(table: String, column: String,
                       lo: Double, hi: Double): Option[Double] =
    histogramOf(table, column).filter(_.nonEmpty).map { bs =>
      val k = bs.size
      if (hi < lo) 0.0
      else {
        // bucket i spans (prev, bs(i)] with prev = bs(i-1); the first
        // bucket's lower edge is the recorded global min (r13 — a
        // pre-r13 histogram without one degrades to the old
        // point-bucket approximation, at most 1/k of error)
        val gmin = histogramMinOf(table, column)
        var acc = 0.0
        var prev = gmin.getOrElse(bs.head)
        var first = true
        bs.foreach { b =>
          val span = b - prev
          val overlap =
            if (first && gmin.isEmpty) (if (lo <= b && hi >= b) 1.0 else 0.0)
            else if (span <= 0.0) (if (lo <= b && hi >= b) 1.0 else 0.0)
            else {
              val s = math.max(lo, prev); val t = math.min(hi, b)
              if (t <= s) 0.0 else (t - s) / span
            }
          acc += overlap / k
          prev = b
          first = false
        }
        math.min(1.0, math.max(0.0, acc))
      }
    }

  private def freqKey(phys: String) = s"tbl.stat.freq.$phys"
  private def freqVKey(phys: String) = s"tbl.stat.freq.v.$phys"

  /** TOP-K KEY FREQUENCIES (r14, the skew-stats family): the k most
    * frequent values of `column` with their exact counts, recorded as
    * an inherited prop — the zero-scan input a SKEW decision needs at
    * plan-build time ([[graft.ops.gold.Skew.strategyByStats]]: is the
    * hottest join key so far above the uniform rows/NDV expectation
    * that a plain shuffle would wedge one partition?). One
    * deliberate aggregation job at ANALYZE time (groupBy + count +
    * top-k — map-side combined, k bounded at 256); values are
    * URL-encoded in the prop so arbitrary string keys cannot collide
    * with the `key:count,...` encoding or the log's reserved
    * characters. Stamps its own per-family version
    * ([[histogramVersionOf]] discipline). */
  def frequentKeys(spark: SparkSession, table: String, column: String,
                   k: Int = 16): Seq[(String, Long)] = {
    require(k >= 1 && k <= 256,
      s"frequentKeys($table): k must be in [1, 256], got $k")
    val scanned = Snapshots.currentVersion(table)
    val df0 = Mutations.readMerged(spark, table, mergeSchema = true)
    val f = df0.schema.fields.find(_.name.equalsIgnoreCase(column)).getOrElse(
      throw new IllegalArgumentException(
        s"frequentKeys($table): unknown column '$column'"))
    val top = df0.select(col(f.name).cast("string").as("k")).na.drop()
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      // deterministic under count ties: the key breaks them
      .orderBy(col("n").desc, col("k").asc)
      .limit(k).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val phys = Snapshots.physicalName(table, f.name)
    val enc = top.map { case (kv, n) =>
      java.net.URLEncoder.encode(kv, "UTF-8") + ":" + n }.mkString(",")
    commitStamped(table, scanned, Seq(freqVKey(phys)), Map(
      freqKey(phys) -> enc,
      freqResKey(phys) -> k.toString))
    top
  }

  /** ZERO-SCAN frequency refresh from per-file TOP-K sidecars
    * ([[Snapshots.withTopK]], r15 — the [[analyzeFromSketches]]
    * discipline applied to the frequency family): per-file exact
    * top-k lists merge by SUMMING counts per key — a Misra-Gries-style
    * fold whose results are LOWER BOUNDS on true global counts (files
    * where a key missed the local top-k contribute nothing). That is
    * the safe direction for every consumer: the salt trigger
    * ([[graft.ops.gold.Skew.strategyByStats]]) fires on a count
    * EXCEEDING a threshold, so a crossing lower bound proves the skew
    * while a missed crossing only forfeits an optional pre-salt — and
    * on the one fixture class that matters (a key hot enough to wedge
    * a partition) the key is locally top-1 in essentially every file,
    * making the bound tight. NO Spark job at all: the fold is a
    * driver-side pass over manifest-scale sidecar lines. Records into
    * the SAME props as [[frequentKeys]] with the same per-family
    * version stamp. Refuses loudly on deletion vectors (pre-delete
    * counts) and unsketched entries, like [[analyzeFromSketches]]. */
  def frequentKeysFromSketches(table: String, column: String,
                               k: Int = 16): Seq[(String, Long)] = {
    val scanned = Snapshots.currentVersion(table)
    val (top, props, vk) = freqFoldFromSketches(table, column, k)
    commitStamped(table, scanned, Seq(vk), props)
    top
  }

  /** [[frequentKeysFromSketches]]'s fold without the commit: (top
    * list, props-minus-stamp, this column's version-stamp key) — so
    * [[maybeAutoRefresh]] can fold every due family into ONE props
    * commit (r15 advisor). */
  private def freqFoldFromSketches(table: String, column: String, k: Int)
      : (Seq[(String, Long)], Map[String, String], String) = {
    require(k >= 1 && k <= 256,
      s"frequentKeysFromSketches($table): k must be in [1, 256], got $k")
    val v = Snapshots.currentVersion(table)
    require(v >= 1, s"frequentKeysFromSketches($table): no committed snapshot")
    val entries = Snapshots.entriesAll(table)
    require(entries.nonEmpty,
      s"frequentKeysFromSketches($table): empty table — nothing to fold")
    entries.find(_.props.contains(Snapshots.DvRefProp)).foreach { e =>
      throw new IllegalStateException(
        s"frequentKeysFromSketches($table): ${e.rel} carries a deletion " +
          "vector — per-file top-k lists describe pre-delete content, so " +
          "the fold would over-count; compact first or run frequentKeys " +
          "(one scan)")
    }
    val phys = Snapshots.physicalName(table, column)
    val merged = scala.collection.mutable.HashMap.empty[String, Long]
    Snapshots.topKCounts(table, entries, phys).foreach(_.foreach {
      case (key, n) => merged.update(key, merged.getOrElse(key, 0L) + n)
    })
    val top = merged.toSeq.sortBy { case (key, n) => (-n, key) }.take(k)
    val enc = top.map { case (kv, n) =>
      java.net.URLEncoder.encode(kv, "UTF-8") + ":" + n }.mkString(",")
    (top, Map(freqKey(phys) -> enc,
      freqResKey(phys) -> k.toString), freqVKey(phys))
  }

  /** Recorded top-k key frequencies, hottest first (None = never
    * computed). */
  def frequentKeysOf(table: String, column: String): Option[Seq[(String, Long)]] =
    Snapshots.snapshotProps(table, Snapshots.currentVersion(table))
      .get(freqKey(Snapshots.physicalName(table, column)))
      .map(_.split(",").toSeq.filter(_.nonEmpty).map { pair =>
        val i = pair.lastIndexOf(':')
        (java.net.URLDecoder.decode(pair.take(i), "UTF-8"),
          pair.drop(i + 1).toLong)
      })

  /** Version the recorded key frequencies describe (their own
    * staleness signal, like [[histogramVersionOf]]). */
  def freqVersionOf(table: String, column: String): Option[Long] =
    Snapshots.snapshotProps(table, Snapshots.currentVersion(table))
      .get(freqVKey(Snapshots.physicalName(table, column)))
      .flatMap(_.toLongOption)

  private def prop(table: String, key: String): Option[Long] =
    Snapshots.snapshotProps(table, Snapshots.currentVersion(table))
      .get(key).flatMap(_.toLongOption)

  /** Recorded NDV of a column (None = never analyzed). LOGICAL name;
    * the prop is keyed physically so renames keep the stat. */
  def ndvOf(table: String, column: String): Option[Long] =
    prop(table, ndvKey(Snapshots.physicalName(table, column)))

  def nullsOf(table: String, column: String): Option[Long] =
    prop(table, nullsKey(Snapshots.physicalName(table, column)))

  def rowsOf(table: String): Option[Long] = prop(table, RowsProp)

  /** Version the recorded stats describe (staleness signal). */
  def analyzedVersion(table: String): Option[Long] = prop(table, VProp)

  // ---- oracle-gated exercise -----------------------------------------

  private def freshTable(prefix: String, dir: String): String =
    Graft.freshDir(prefix + dir.replaceAll("[^A-Za-z0-9.]", "_"))

  /** s55: ANALYZE under the oracle gate — a lake table commits two
    * waves (the stats must describe the MERGED live state, not one
    * file), ANALYZE records exact NDV/null counts, and the answer is
    * the stats table itself, restated by DuckDB as plain
    * count(DISTINCT)/null-count aggregates. */
  def analyzeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val table = freshTable("s55-tbl-", dir)
    val ev = Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "event_type", "value", "event_date")
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      ev.filter(col("event_date") <= "2024-01-15"), table, "event_date", "event_id"))
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      ev.filter(col("event_date").between("2024-01-16", "2024-01-20")),
      table, "event_date", "event_id"))
    Mutations.deleteWhere(spark, table, col("event_type") === "error")
    val (rows, stats) = analyze(spark, table,
      Seq("event_id", "event_type", "value"))
    stats.map { case (c, ndv, nulls) => (c, ndv, nulls, rows) }
      .toDF("col_name", "ndv", "null_count", "n_rows")
      .orderBy("col_name")
  }

  lazy val analyzeStatsOracle: String =
    """WITH t AS (
      |  SELECT event_id, event_type, value
      |  FROM events
      |  WHERE CAST(ts AS DATE) <= DATE '2024-01-20' AND event_type <> 'error')
      |SELECT col_name, ndv, CAST(null_count AS BIGINT) AS null_count,
      |       (SELECT count(*) FROM t) AS n_rows FROM (
      |  SELECT 'event_id' AS col_name, count(DISTINCT event_id) AS ndv,
      |         sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS null_count FROM t
      |  UNION ALL
      |  SELECT 'event_type', count(DISTINCT event_type),
      |         sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) FROM t
      |  UNION ALL
      |  SELECT 'value', count(DISTINCT value),
      |         sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) FROM t
      |) ORDER BY col_name""".stripMargin

  /** s56: the equi-height histogram under the oracle gate — the k
    * boundary values are EXACT value-at-rank order statistics, so
    * DuckDB restates them with a plain row_number rank join (no
    * percentile-interpolation semantics to disagree on). */
  def analyzeHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val table = freshTable("s56-tbl-", dir)
    val ev = Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "value", "event_date")
    Snapshots.commitAll(table, Snapshots.stageWithStats(
      ev.filter(col("event_date") <= "2024-01-20"),
      table, "event_date", "event_id"))
    histogram(spark, table, "value", 16)
      .zipWithIndex.map { case (v, i) => ((i + 1).toLong, v) }
      .toDF("bucket", "upper_bound")
      .orderBy("bucket")
  }

  lazy val analyzeHistogramOracle: String =
    """WITH t AS (
      |  SELECT value FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-20'),
      |r AS (SELECT row_number() OVER (ORDER BY value) AS rn, value FROM t),
      |n AS (SELECT count(*) AS n FROM t),
      |g AS (SELECT unnest(range(1, 17)) AS i)
      |SELECT CAST(g.i AS BIGINT) AS bucket, r.value AS upper_bound
      |FROM g, n JOIN r ON r.rn = greatest(1, (g.i * n.n) // 16)
      |ORDER BY bucket""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("s55_analyze_stats", analyzeStatsOracle)(analyzeStats),
    QueryDef.sql("s56_analyze_histogram", analyzeHistogramOracle)(analyzeHistogram))
}
