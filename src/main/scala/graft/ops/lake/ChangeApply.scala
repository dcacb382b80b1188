package graft.ops.lake

import graft.engine.{Caching, Exact, Graft, QueryDef, Tables}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC APPLY — EXACTLY-ONCE propagation of an upstream snapshot table's
  * change feed into a downstream snapshot table: the medallion
  * bronze→silver "keep this table in sync" operator (the Databricks
  * `APPLY CHANGES INTO` shape), in two flavors:
  *
  *   - [[mirror]] (SCD TYPE 1): the target converges to the source's
  *     live row set — updates overwrite, deletes propagate. The apply
  *     is a keyed MERGE of the range's NET effect, so it rides the
  *     same stats-pruned copy-on-write the mutation ops use: only
  *     target files containing an affected key rewrite.
  *   - [[mirrorScd2]] (SCD TYPE 2): the target accumulates HISTORY —
  *     every source row version becomes a segment row
  *     `[__start_version, __end_version)` with an `__is_current` flag,
  *     closed by the change that superseded it. Version numbers are
  *     the SOURCE's commit versions, so segments are meaningful
  *     time-travel coordinates, not synthetic surrogates.
  *
  * Exactly-once without external state (the [[Mutations.AppliedProp]]
  * discipline): the applied source version rides the SAME commit as
  * the applied rows — prop [[AppliedProp]] on the target's snapshot.
  * Crash anywhere and rerun: a replay either re-reads the old applied
  * version (the same immutable feed range re-derives, the same net
  * effect re-applies — idempotent) or sees the new one (no-op). A
  * batch whose net effect is empty advances the bookkeeping with a
  * props-only commit.
  *
  * The feed is FILE-granular ([[Snapshots.changes]]): a copy-on-write
  * rewrite re-states every surviving row of the touched files as a
  * delete+insert pair at the same commit. [[realChanges]] cancels
  * those carry-over pairs (same key, same commit, identical content)
  * BEFORE any apply — without this, SCD2 would fabricate a history
  * segment every time maintenance rewrote a file, and SCD1 would
  * rewrite target files for rows that never changed.
  *
  * Contract: the SOURCE maintains key uniqueness on `keyCols` per
  * snapshot (the standard CDC assumption for a keyed table). Two
  * DIFFERING rows of one key at one commit are ambiguous and fail
  * loudly; identical full-row duplicates collapse silently. The
  * source's feed range must still be readable — run the catch-up at
  * least as often as the source's vacuum retention, the same contract
  * every Delta CDF consumer carries.
  *
  * Scale: cost per catch-up is O(changed files in the range) on the
  * source side (unchanged files are never opened — the feed's own
  * guarantee) and O(files containing an affected key) on the target
  * side (the merge's stats-pruned discovery). A no-change poll is two
  * metadata reads.
  *
  * Ref analog: none — the reference re-loads whole day prefixes
  * downstream (`ingest_binance_last_3_days.py:141-144`); incremental
  * keyed sync is beyond its append/overwrite surface.
  */
object ChangeApply {

  /** Source version the target has applied, co-atomic with its rows
    * (`cdc.applied` — carried across layout maintenance by
    * [[Snapshots.BookkeepingPropPrefixes]], deliberately NOT inherited
    * by unrelated commits). */
  val AppliedProp = "cdc.applied"

  /** Identity of the source table this target mirrors (`cdc.source`):
    * applying a DIFFERENT source to an existing mirror is a wiring
    * bug, failed loudly instead of silently interleaving two feeds. */
  val SourceProp = "cdc.source"

  /** SCD2 segment columns ([[mirrorScd2]] targets). */
  val StartCol = "__start_version"
  val EndCol = "__end_version"
  val CurrentCol = "__is_current"

  /** SCD2 lineage column: the SOURCE's stable `_row_id` behind each
    * segment (r12 row tracking). An in-place update chain shares one
    * id across its segments (COW rewrites preserve identity); a
    * delete+reinsert mints a new one — the physical-row lineage an
    * audit needs. Stored under a NON-reserved name so the segment
    * table's own row tracking stays intact; NULL for sources that
    * predate row tracking. */
  val SourceRowIdCol = "_source_row_id"

  private val MetaCols =
    Seq("_change_type", "_commit_version", Snapshots.RowIdCol)

  /** Default catch-up chunk (versions per applied range). BOUNDED by
    * default — the feed's union plan is O(versions in range), so the
    * uncapped form is the opt-in, not the default (a mirror that slept
    * through 10⁴ commits should not discover the plan blow-up in
    * production). Chunked ≡ one-shot (spec-pinned). */
  val DefaultMaxVersionsPerBatch: Int = 256

  def appliedVersion(target: String): Long =
    Snapshots.snapshotProps(target, Snapshots.currentVersion(target))
      .get(AppliedProp).map(_.toLong).getOrElse(0L)

  /** The attributed feed for `(fromV, toV]` with CARRY-OVER PAIRS
    * cancelled: rows grouped on (128-bit content fingerprint, commit
    * version) with inserts counted +1 and deletes −1 — a COW rewrite's
    * re-stated row sums to zero and vanishes; a real update keeps both
    * its delete (old content) and insert (new content); a DV delete
    * keeps its delete. One shuffle, multiset-correct, and it collapses
    * identical full-row duplicates as a side effect (harmless for a
    * keyed source — see the object contract).
    *
    * SCALE (r12): the grouping key is `(commit, h1, h2)` — 24 bytes —
    * instead of the full row content, so a catch-up over wide text
    * rows sorts and compares fingerprints, never documents (the
    * content rides as a `first()` payload, which any output
    * necessarily carries). The fingerprints are built null-safely:
    * hashing the raw column list would inherit Spark's hash-expression
    * NULL SKIP — a NULL input leaves the seed untouched, so rows
    * differing only in WHICH nullable column holds a value collide
    * SYSTEMATICALLY (r12 review find). Instead each column first
    * collapses to a per-column seeded hash (`xxhash64(lit(seed),
    * enc(c))` — a NULL column becomes the seed's own constant,
    * distinct per position and per hash family), and h1/h2 combine
    * the two independently-seeded part vectors, which are never null —
    * no skip anywhere, ~2⁻¹²⁸ residual collisions. `enc(c)` is the
    * raw column for atomic types (hashing raw bytes is cheap — the
    * CdcWidthProbe showed whole-row `to_json` costing MORE than the
    * wide grouping keys it replaced) and canonical JSON
    * (`ignoreNullFields=false`) only for struct/array columns, whose
    * INTERNAL null positions the hash expression would otherwise skip
    * (top-level maps pre-sort to entry arrays; nested maps are
    * rejected above). The key is DELIBERATELY content-derived rather
    * than `_row_id`-derived: id-keyed cancellation would make
    * correctness contingent on every present AND future rewrite path
    * preserving ids (one miss ⇒ fabricated history segments — silent
    * corruption). The feed's `_row_id` rides through as lineage (a
    * representative id per surviving change). */
  private[graft] def realChanges(spark: SparkSession, src: String,
                                fromV: Long, toV: Long,
                                keyCols: Seq[String]): DataFrame = {
    val feed = Snapshots.changesAttributed(spark, src, fromV, toV)
    val dataCols = feed.columns.filterNot(MetaCols.contains).toSeq
    val missing = keyCols.filterNot(dataCols.contains)
    require(missing.isEmpty,
      s"applyChanges($src): key column(s) ${missing.mkString(", ")} not in " +
        s"the feed schema (${dataCols.mkString(", ")})")
    // MAP columns hash nondeterministically (iteration order);
    // canonicalize them to key-sorted entry arrays for the fingerprint
    // — equal maps produce equal sorted-entry arrays — and restore the
    // map type after, so the applied rows keep the source schema
    val mapCols = feed.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] => f.name
    }.toSeq
    // maps NESTED inside structs/arrays cannot be canonicalized by the
    // top-level fold, and to_json would serialize their entries in
    // storage order — semantically equal rows could fingerprint apart
    // and a COW carry-over pair would fail to cancel (fabricated
    // history, the silent-corruption class). Refuse loudly, like the
    // pre-fingerprint groupBy did for every map (r12 review find).
    def nestedMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
      import org.apache.spark.sql.types._
      dt match {
        case m: MapType =>
          // a map ANYWHERE inside the top-level map (directly — the
          // map<k, map<…>> case — or under a struct/array): recursing
          // with nestedMap here skipped a directly-nested map, letting
          // it reach array_sort and die with an un-actionable Catalyst
          // "not orderable" error instead of this guard (r12 verdict)
          hasMap(m.keyType) || hasMap(m.valueType)
        case s: StructType => s.fields.exists(f => hasMap(f.dataType))
        case a: ArrayType => hasMap(a.elementType)
        case _ => false
      }
    }
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
      import org.apache.spark.sql.types._
      dt match {
        case _: MapType => true
        case s: StructType => s.fields.exists(f => hasMap(f.dataType))
        case a: ArrayType => hasMap(a.elementType)
        case _ => false
      }
    }
    val nested = feed.schema.fields
      .filter(f => dataCols.contains(f.name) && nestedMap(f.dataType))
    require(nested.isEmpty,
      s"applyChanges($src): column(s) ${nested.map(_.name).mkString(", ")} " +
        "carry MAP types nested inside structs/arrays — entry order is not " +
        "canonical there, so change cancellation cannot fingerprint them " +
        "soundly; restructure the column (top-level maps are fine)")
    val canon = mapCols.foldLeft(feed)((df, c) =>
      df.withColumn(c, array_sort(map_entries(col(s"`$c`")))))
    val dcs = dataCols.map(c => col(s"`$c`"))
    def enc(c: String): Column = {
      import org.apache.spark.sql.types._
      canon.schema(canon.schema.fieldIndex(c)).dataType match {
        case _: StructType | _: ArrayType =>
          to_json(col(s"`$c`"), Map("ignoreNullFields" -> "false"))
        case _ => col(s"`$c`")
      }
    }
    val parts1 = dataCols.zipWithIndex.map { case (c, i) =>
      xxhash64(lit(i), enc(c)) }
    val parts2 = dataCols.zipWithIndex.map { case (c, i) =>
      xxhash64(lit(-1 - i), enc(c)) }
    val grouped = canon
      .withColumn("__h1", xxhash64(parts1: _*))
      .withColumn("__h2", xxhash64(parts2: _*))
      .groupBy(col("_commit_version"), col("__h1"), col("__h2"))
      .agg(
        sum(when(col("_change_type") === "insert", 1).otherwise(-1)).as("__net"),
        first(struct(dcs: _*)).as("__row"),
        max(col(Snapshots.RowIdCol)).as(Snapshots.RowIdCol))
      .filter(col("__net") =!= 0)
      .withColumn("_change_type",
        when(col("__net") > 0, "insert").otherwise("delete"))
      .select((col("__row.*") +: Seq(col(Snapshots.RowIdCol),
        col("_change_type"), col("_commit_version"))): _*)
    mapCols.foldLeft(grouped)((df, c) =>
      df.withColumn(c, map_from_entries(col(s"`$c`"))))
  }

  /** NET effect of a real-change feed per key (SCD1): the latest
    * commit's action wins; within that commit an insert beats the
    * delete of the content it replaced (update semantics). Ties that
    * survive — two differing inserts of one key at one commit — are
    * the caller-checked ambiguity. */
  private[lake] def netState(real: DataFrame, keyCols: Seq[String]): DataFrame = {
    val pri = when(col("_change_type") === "insert", 0).otherwise(1)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_commit_version").desc, pri.asc)
    real.withColumn("__rk", rank().over(w))
      .filter(col("__rk") === 1).drop("__rk")
  }

  private def guards(target: String, src: String, fromV: Long, toV: Long,
                     scd2: Boolean): Unit = {
    val op = if (scd2) "mirrorScd2" else "mirror"
    require(fromV <= toV,
      s"$op($target): applied version $fromV is ahead of source version " +
        s"$toV — the source was recreated under this path; rebuild the " +
        "mirror deliberately")
    require(fromV == appliedVersion(target),
      s"$op($target): fromV=$fromV but the target has applied source " +
        s"version ${appliedVersion(target)} — ranges must apply gap-free " +
        "and exactly once (use the catch-up entry point)")
    // a props-dropping commit to the target (e.g. a direct
    // Snapshots.commit) resets the applied version to 0 while the rows
    // stay; a fromV=0 "bootstrap" onto those rows would double-apply
    // history (the refreshCountSum guard, same failure class)
    require(fromV > 0 || Snapshots.currentVersion(target) == 0,
      s"$op($target): bootstrap (fromV=0) but the target already has " +
        s"committed rows with no $AppliedProp bookkeeping — a " +
        "props-dropping commit broke the exactly-once chain; rebuild the " +
        "mirror into a fresh table")
    val tv = Snapshots.currentVersion(target)
    if (tv >= 1) {
      val recorded = Snapshots.snapshotProps(target, tv).get(SourceProp)
      require(recorded.forall(_ == src),
        s"$op($target): target mirrors '${recorded.get}' but this apply " +
          s"reads '$src' — refusing to interleave two sources")
    }
  }

  /** Bootstrap staging with per-file footer stats, CLUSTERED on the
    * first stats column ([[Snapshots.stageWithStats]]) so the stats are
    * selective from the first commit — a mirror bootstrapped without
    * key stats pays a full-table candidate scan on every later apply. */
  private def bootstrapStage(df: DataFrame, target: String, tagCol: String,
                             statsCols: Seq[String]): Seq[Snapshots.Entry] =
    if (statsCols.isEmpty)
      Snapshots.stage(df, target, tagCol).map { case (r, t) => Snapshots.Entry(r, t) }
    else {
      val es = Snapshots.stageWithStats(df, target, tagCol, statsCols.head)
      if (statsCols.size == 1) es
      else Snapshots.withFooterStats(es.map(e => (e.rel, e.tag)), target,
        statsCols.map(c => Snapshots.physicalName(target, c)))
    }

  private def requireUnambiguous(op: String, target: String, src: String,
                                 dup: DataFrame, keyCols: Seq[String]): Unit =
    require(dup.isEmpty,
      s"$op($target): source $src has differing rows for one key at one " +
        s"commit — key (${keyCols.mkString(", ")}) is not unique per " +
        "snapshot; CDC apply needs a keyed source")

  // ---- SCD TYPE 1: converge the target to the source's live rows ----

  /** Apply the `(fromV, toV]` range once (SCD1). Prefer [[mirror]].
    * `statsCols` shapes the BOOTSTRAP staging (per-file min/max footer
    * stats; later merges preserve whatever surface the table has via
    * [[Snapshots.restageLike]]) — it DEFAULTS to the key columns,
    * because the keys are what every subsequent apply's candidate
    * discovery prunes on: a stats-free mirror pays a full-table
    * candidate scan per catch-up forever. Pass `Some(Seq.empty)` to
    * opt out. */
  def applyOnce(spark: SparkSession, target: String, src: String,
                keyCols: Seq[String], tagCol: String,
                fromV: Long, toV: Long,
                statsCols: Option[Seq[String]] = None): Long = {
    guards(target, src, fromV, toV, scd2 = false)
    if (fromV == toV) return Snapshots.currentVersion(target)
    val props = Map(AppliedProp -> toV.toString, SourceProp -> src)
    val net = Caching.persist(
      netState(realChanges(spark, src, fromV, toV, keyCols), keyCols))
    try {
      val dup = net.filter(col("_change_type") === "insert")
        .groupBy(keyCols.map(col): _*).count().filter(col("count") > 1)
      requireUnambiguous("mirror", target, src, dup, keyCols)
      val ups = net.filter(col("_change_type") === "insert")
        .drop(MetaCols: _*)
      // delete winners: only the keys matter downstream (content is the
      // source's last-seen row) — collapse multi-row keys deterministically
      val dels = net.filter(col("_change_type") === "delete")
        .drop(MetaCols: _*).dropDuplicates(keyCols)
      if (Snapshots.currentVersion(target) == 0) {
        // BOOTSTRAP: no downstream rows exist, so net deletes have
        // nothing to remove; a net-empty source stays at version 0
        // (zero-file snapshots are a format non-goal) and the next
        // catch-up re-folds the same range
        if (ups.isEmpty) return 0L
        return Snapshots.commitAll(target,
          bootstrapStage(ups, target, tagCol, statsCols.getOrElse(keyCols)),
          props = props)
      }
      // a range that deletes EVERYTHING (source fully wiped, nothing
      // re-inserted) would trip the merge's zero-file refusal on every
      // retry — a liveness hole for the mirror. The kernel reads
      // zero-file snapshots as empty on the recorded schema (the r11
      // schema.ddl prop), so represent the wipe directly as a
      // remove-everything commit. Only checked when there are no
      // upserts (the merge stages files otherwise), and the survivor
      // probe is dels-keyed — bounded by the target, run on the rare
      // path only.
      if (ups.isEmpty) {
        val survivors = Mutations.readMerged(spark, target, mergeSchema = true)
          .select(keyCols.map(col): _*)
          .join(dels.select(keyCols.map(col): _*), keyCols, "left_anti")
        if (survivors.isEmpty)
          return Snapshots.commitAll(target, Seq.empty,
            remove = _ => true, props = props)
      }
      val srcNet = ups.withColumn("__cdc_del", lit(false))
        .unionByName(dels.withColumn("__cdc_del", lit(true)))
      val setMap = ups.columns.filterNot(keyCols.contains)
        .map(c => c -> col(s"s.`$c`")).toMap
      val before = Snapshots.currentVersion(target)
      // SOURCE EVOLUTION FOLLOWS THROUGH: feed columns the mirror lacks
      // (the source gained them mid-stream) evolve the target in the
      // same merge — a mirror's contract is to track its source, so
      // refusing here would wedge every catch-up after an upstream
      // ALTER (the marker column is NOT passed: it must never become a
      // table column)
      val tgtFields = Snapshots.readVersion(spark, target, before,
        mergeSchema = true).schema.fieldNames
      val evolve = ups.schema.fields.filterNot(f =>
        tgtFields.exists(_.equalsIgnoreCase(f.name))).toSeq
      val v = Mutations.mergeIntoKeys(spark, target, srcNet, keyCols, tagCol,
        whenMatchedDelete = Some(col("s.__cdc_del")),
        whenMatchedUpdate = Some((!col("s.__cdc_del"), setMap)),
        whenNotMatchedInsert = Some(!col("__cdc_del")),
        props = props,
        evolveColumns = evolve)
      // a range whose net effect touched nothing downstream (props-only
      // source commits; deletes of keys the mirror never saw) still
      // advances the bookkeeping, or the catch-up loop never converges
      if (v == before) Snapshots.commitAll(target, Seq.empty, props = props)
      else v
    } finally net.unpersist()
  }

  /** RESTARTABLE SCD1 catch-up: read the target's own applied version,
    * apply `(applied, current]`, commit rows + bookkeeping atomically.
    * Crash anywhere and rerun — exactly-once with no state outside the
    * two tables. Returns the target's version (unchanged when already
    * caught up).
    *
    * `maxVersionsPerBatch` chunks a WIDE catch-up (a mirror that slept
    * through 10⁴ source commits) into capped ranges applied as separate
    * commits — the feed's per-step union plan is O(versions in range),
    * so an uncapped giant range is a driver plan blow-up, the same
    * admission discipline the streaming CDF source applies. Each chunk
    * is individually exactly-once; a crash resumes at the chunk
    * boundary. */
  def mirror(spark: SparkSession, target: String, src: String,
             keyCols: Seq[String], tagCol: String,
             statsCols: Option[Seq[String]] = None,
             maxVersionsPerBatch: Int = DefaultMaxVersionsPerBatch): Long =
    catchUp(target, src, maxVersionsPerBatch, "mirror",
      (f, t) => applyOnce(spark, target, src, keyCols, tagCol, f, t, statsCols))

  /** Shared chunked catch-up driver for both mirror flavors. An
    * UN-BOOTSTRAPPED target stays at version 0 across a chunk whose
    * net effect records nothing — the apply deliberately did NOT
    * record the applied version (zero-file snapshots are a format
    * non-goal), so the cursor must not advance either: the next chunk
    * WIDENS over the same start instead (or the gap-free guard would
    * wedge every retry on an insert-then-wipe prefix wider than one
    * chunk). Once the whole range has been folded and still nets to
    * nothing, stop — the table legitimately stays at version 0 and the
    * next catch-up re-folds from scratch. */
  private def catchUp(target: String, src: String, cap: Int, op: String,
                      applyRange: (Long, Long) => Long): Long = {
    require(cap >= 1, s"$op: maxVersionsPerBatch must be >= 1")
    val to = Snapshots.currentVersion(src)
    var from = appliedVersion(target)
    var v = Snapshots.currentVersion(target)
    var width = cap.toLong
    while (from < to) {
      val step = math.min(from + width, to)
      v = applyRange(from, step)
      if (appliedVersion(target) >= step) {
        from = step; width = cap.toLong
      } else if (step == to) from = to
      else width += cap.toLong
    }
    if (from > to) // recreated-source detection still fires on a stale cursor
      applyRange(from, to)
    v
  }

  // ---- SCD TYPE 2: accumulate history segments --------------------

  /** Apply the `(fromV, toV]` range once as SCD2 history. Prefer
    * [[mirrorScd2]].
    *
    * Per key and commit, the range's REAL changes reduce to one
    * action — an insert (the new state; an update's delete of the old
    * content is subsumed) or a delete (tombstone). Ordered by commit,
    * each insert action opens a segment `[v, next_v)` closed by the
    * key's next action (open + `__is_current` when none follows);
    * a delete action closes its predecessor and opens nothing. The
    * target rows whose segments were CURRENT before this batch close
    * at the key's first action version — those rows live in target
    * files discovered by key (stats-prunable), rewritten copy-on-write
    * in the same commit that adds the new segments and the
    * bookkeeping. */
  def applyScd2Once(spark: SparkSession, target: String, src: String,
                    keyCols: Seq[String], tagCol: String,
                    fromV: Long, toV: Long): Long = {
    guards(target, src, fromV, toV, scd2 = true)
    if (fromV == toV) return Snapshots.currentVersion(target)
    val props = Map(AppliedProp -> toV.toString, SourceProp -> src)
    val pri = when(col("_change_type") === "insert", 0).otherwise(1)
    val wv = Window.partitionBy((keyCols :+ "_commit_version").map(col): _*)
      .orderBy(pri.asc)
    val acts = Caching.persist(
      realChanges(spark, src, fromV, toV, keyCols)
        // the source row id becomes the segment's LINEAGE column —
        // renamed off the reserved feed name so the segment table's
        // own row tracking stays intact
        .withColumnRenamed(Snapshots.RowIdCol, SourceRowIdCol)
        .withColumn("__rk", rank().over(wv))
        .filter(col("__rk") === 1).drop("__rk"))
    try {
      val dup = acts.filter(col("_change_type") === "insert")
        .groupBy((keyCols :+ "_commit_version").map(col): _*)
        .count().filter(col("count") > 1)
      requireUnambiguous("mirrorScd2", target, src, dup, keyCols)
      if (acts.isEmpty)
        // a net-empty range still advances the bookkeeping — unless the
        // target was never bootstrapped (a zero-file v1 would brick it;
        // stay at 0, the next catch-up re-folds the same range)
        return if (Snapshots.currentVersion(target) == 0) 0L
          else Snapshots.commitAll(target, Seq.empty, props = props)
      val wk = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(col("_commit_version").asc)
      val newRows = acts
        .withColumn("__next_v", lead(col("_commit_version"), 1).over(wk))
        .filter(col("_change_type") === "insert")
        .withColumn(StartCol, col("_commit_version"))
        .withColumn(EndCol, col("__next_v"))
        .withColumn(CurrentCol, col("__next_v").isNull)
        .drop("_change_type", "_commit_version", "__next_v")
      val closes = acts.groupBy(keyCols.map(col): _*)
        .agg(min(col("_commit_version")).as("__close_v"))
      val v0 = Snapshots.currentVersion(target)
      if (v0 == 0) {
        // lineage id rides with footer stats (r13): the bootstrap
        // decorates min./max. on _source_row_id next to the key stats,
        // and restageLike re-derives them on every later rewrite — what
        // makes [[rowHistory]]'s point lookup open O(1) segment files
        val staged = bootstrapStage(newRows, target, tagCol,
          keyCols :+ SourceRowIdCol)
        if (staged.isEmpty) return 0L
        return Snapshots.commitAll(target, staged, props = props)
      }
      // close the affected keys' CURRENT segments: candidate files cut
      // by the affected keys' RANGE against per-file stats first (the
      // mergeIntoKeys discipline — key-free files never open), then the
      // key join over current rows decides the touched set (the
      // metadata-scale collect every mutation op uses); untouched files
      // carry by manifest name
      // typed key-bounds prune (numeric/string/date/timestamp — see
      // [[Mutations.keyBoundsCandidates]]): string doc_id-keyed corpora
      // prune via smin./smax. UTF-8 stats instead of scanning every
      // candidate footer per catch-up
      val candidates = Mutations.keyBoundsCandidatesAll(acts, target, keyCols)
      val touchedIds = Snapshots.readVersion(spark, target, v0,
          fileFilter = candidates, mergeSchema = true, metadataSafe = true)
        // the hidden _metadata column does not survive a join — derive
        // the file id BEFORE the semi-join
        .withColumn("__f", Snapshots.fileIdCol(col("_metadata.file_path")))
        .filter(col(CurrentCol))
        .join(closes.select(keyCols.map(col): _*), keyCols, "left_semi")
        .select("__f")
        .distinct().collect().map(_.getString(0)).toSet
      val touchedRels = Snapshots.entriesAt(target, v0)
        .collect { case e if touchedIds(Snapshots.fileId(e.rel)) => e.rel }.toSet
      val rewritten: Option[DataFrame] =
        if (touchedRels.isEmpty) None
        else {
          // touched slice read WITH row ids and restaged materialized
          // (hidden __rid), mirroring mergeInto: closing a segment
          // UPDATES its row, it doesn't delete-and-recreate it — a
          // plain readMerged re-minted every rewritten file's ids,
          // churning the segment table's own lineage on each catch-up
          // (r12 advisor find). New segments NULL-fill __rid through
          // the unionByName below and mint fresh ids.
          val tgt = Snapshots.readMergedWithIds(spark, target, version = v0,
              fileFilter = e => touchedRels.contains(e.rel))
            .withColumnRenamed(Snapshots.RowIdCol, Snapshots.RidCol)
          val tCols = tgt.columns.toSeq
          val hit = col("__close_v").isNotNull && col(CurrentCol)
          // no broadcast hint: the affected-key set is change-volume
          // sized (a backfill batch can be huge) — AQE picks broadcast
          // when it actually fits
          Some(tgt.join(closes, keyCols, "left_outer")
            .select(tCols.map {
              case EndCol => when(hit, col("__close_v")).otherwise(col(EndCol)).as(EndCol)
              case CurrentCol => when(hit, lit(false)).otherwise(col(CurrentCol)).as(CurrentCol)
              case c => col(s"`$c`")
            }: _*))
        }
      // allowMissingColumns BOTH ways: new segments may carry evolved
      // source columns the touched slice predates (NULL-fill the old
      // rows), and the touched slice may carry columns a pre-evolution
      // feed chunk lacks
      val replaced = (rewritten.toSeq :+ newRows)
        .reduce(_.unionByName(_, allowMissingColumns = true))
      val staged = Snapshots.withInternalRid(
        Snapshots.restageLike(spark, replaced, target, tagCol))
      Snapshots.commitRewrite(target, v0, staged,
        remove = e => touchedRels.contains(e._1), props = props)
    } finally acts.unpersist()
  }

  /** RESTARTABLE SCD2 catch-up — same exactly-once and chunked-range
    * contract as [[mirror]]. */
  def mirrorScd2(spark: SparkSession, target: String, src: String,
                 keyCols: Seq[String], tagCol: String,
                 maxVersionsPerBatch: Int = DefaultMaxVersionsPerBatch): Long =
    catchUp(target, src, maxVersionsPerBatch, "mirrorScd2",
      (f, t) => applyScd2Once(spark, target, src, keyCols, tagCol, f, t))

  /** HISTORY OF ROW X (r13): every SCD2 segment whose `_source_row_id`
    * lineage is `sourceRowId` — the inverse read row tracking pays for
    * ("what did this physical row look like over time", keyed by
    * identity rather than business key; a key-based read cannot
    * distinguish an update chain from a delete-and-reinsert, the id
    * can). Opens ONLY segment files whose min./max. lineage-id footer
    * stats admit the id — decorated at bootstrap and re-derived by
    * every COW rewrite ([[Snapshots.restageLike]]), so the lookup is
    * O(admitted files) however large the history table grows. */
  def rowHistory(spark: SparkSession, target: String,
                 sourceRowId: Long): DataFrame =
    Mutations.readMerged(spark, target,
        fileFilter = Snapshots.rangeOverlap(
          Snapshots.physicalName(target, SourceRowIdCol),
          sourceRowId.toDouble, sourceRowId.toDouble),
        mergeSchema = true)
      .filter(col(SourceRowIdCol) === sourceRowId)

  // ---- oracle-gated exercises --------------------------------------

  private def freshTable(prefix: String, dir: String): String =
    Graft.freshDir(prefix + dir.replaceAll("[^A-Za-z0-9.]", "_"))

  private def eventsSlim(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "event_type", "value", "event_date")

  /** s48: SCD1 CDC MIRROR end to end — the source commits a base day
    * range, the mirror bootstraps, then the source mutates through all
    * three write shapes (COW update, DV delete, keyed MERGE) and ONE
    * catch-up folds the three-version range into the mirror. The final
    * aggregate reads the MIRROR, so every hop — feed derivation,
    * carry-over suppression, net-effect collapse, keyed apply —
    * is inside the oracle gate. */
  def cdcMirror(spark: SparkSession, dir: String): DataFrame = {
    val srcT = freshTable("s48-src-", dir)
    val tgtT = freshTable("s48-tgt-", dir)
    val ev = eventsSlim(spark, dir)
    Snapshots.commitAll(srcT, Snapshots.stageWithStats(
      ev.filter(col("event_date") <= "2024-01-20"),
      srcT, "event_date", "event_id"))                                 // v1
    ChangeApply.mirror(spark, tgtT, srcT, Seq("event_id"), "event_date")
    // (bootstrap stages key-clustered stats by default)
    Mutations.updateWhere(spark, srcT, col("event_type") === "click",
      Map("value" -> (col("value") + 100.0)), "event_date")            // v2 (COW)
    Mutations.deleteWhere(spark, srcT, col("event_type") === "error")  // v3 (DV)
    val mergeSrc = ev
      .filter(col("event_date").between("2024-01-18", "2024-01-25"))
      .withColumn("value", col("value") + 1000.0)
    Mutations.mergeIntoKeys(spark, srcT, mergeSrc, Seq("event_id"), "event_date",
      whenMatchedUpdate = Some((lit(true),
        Map("event_type" -> col("s.event_type"), "value" -> col("s.value"),
          "event_date" -> col("s.event_date")))),
      whenNotMatchedInsert = Some(lit(true)))                          // v4
    ChangeApply.mirror(spark, tgtT, srcT, Seq("event_id"), "event_date")
    Snapshots.read(spark, tgtT)
      .groupBy("event_date")
      .agg(count(lit(1)).as("n"), Exact.decSum(col("value")).as("sum_value"))
      .orderBy("event_date")
  }

  private def decSumSql(e: String): String = graft.engine.Exact.decSumSql(e)

  lazy val cdcMirrorOracle: String =
    s"""WITH base AS (
      |  SELECT event_id, event_type, value, CAST(ts AS DATE) AS event_date
      |  FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-20'),
      |upd AS (
      |  SELECT event_id, event_type,
      |         CASE WHEN event_type = 'click' THEN value + 100.0 ELSE value END AS value,
      |         event_date
      |  FROM base),
      |del AS (SELECT * FROM upd WHERE event_type <> 'error'),
      |src AS (
      |  SELECT event_id, event_type, value + 1000.0 AS value,
      |         CAST(ts AS DATE) AS event_date
      |  FROM events
      |  WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-18' AND DATE '2024-01-25'),
      |final AS (
      |  SELECT * FROM del WHERE event_id NOT IN (SELECT event_id FROM src)
      |  UNION ALL
      |  SELECT * FROM src)
      |SELECT event_date, count(*) AS n, ${decSumSql("value")} AS sum_value
      |FROM final GROUP BY event_date ORDER BY event_date""".stripMargin

  /** s49: SCD2 CDC history — base commit (v1), COW update of the click
    * rows (v2), DV delete of the error rows (v3), one catch-up. The
    * segment table must show: clicks as a closed `[1,2)` plus a current
    * `[2,∞)` at the new value, errors as a closed `[1,3)`, everything
    * else as a current `[1,∞)` — and NOTHING ELSE, which is precisely
    * the carry-over suppression claim (v2's COW rewrite re-stated every
    * non-click row of the touched files; an unsuppressed apply would
    * fabricate `[1,2)/[2,∞)` pairs for them and the hash would
    * diverge). */
  def cdcScd2(spark: SparkSession, dir: String): DataFrame = {
    val srcT = freshTable("s49-src-", dir)
    val tgtT = freshTable("s49-tgt-", dir)
    val ev = eventsSlim(spark, dir)
    Snapshots.commitAll(srcT, Snapshots.stageWithStats(
      ev.filter(col("event_date") <= "2024-01-20"),
      srcT, "event_date", "event_id"))                                 // v1
    Mutations.updateWhere(spark, srcT, col("event_type") === "click",
      Map("value" -> (col("value") + 100.0)), "event_date")            // v2 (COW)
    Mutations.deleteWhere(spark, srcT, col("event_type") === "error")  // v3 (DV)
    ChangeApply.mirrorScd2(spark, tgtT, srcT, Seq("event_id"), "event_date")
    Snapshots.read(spark, tgtT)
      .groupBy(col("event_date"), col(StartCol), col(EndCol), col(CurrentCol))
      .agg(count(lit(1)).as("n"), Exact.decSum(col("value")).as("sum_value"))
      .orderBy(col("event_date"), col(StartCol), col(EndCol))
  }

  lazy val cdcScd2Oracle: String =
    s"""WITH base AS (
      |  SELECT event_id, event_type, value, CAST(ts AS DATE) AS event_date
      |  FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-20'),
      |seg AS (
      |  SELECT event_date, value, 1 AS sv,
      |         CASE WHEN event_type = 'click' THEN 2
      |              WHEN event_type = 'error' THEN 3 END AS ev
      |  FROM base
      |  UNION ALL
      |  SELECT event_date, value + 100.0, 2, NULL FROM base
      |  WHERE event_type = 'click')
      |SELECT event_date, CAST(sv AS BIGINT) AS __start_version,
      |       CAST(ev AS BIGINT) AS __end_version,
      |       ev IS NULL AS __is_current,
      |       count(*) AS n, ${decSumSql("value")} AS sum_value
      |FROM seg GROUP BY 1, 2, 3, 4
      |ORDER BY event_date, __start_version, __end_version""".stripMargin

  /** s57: ROW-HISTORY point lookup under the oracle gate — the source
    * commits a base day range, ONE key (the deterministic min event id)
    * is updated twice in place, and the SCD2 mirror accumulates its
    * three segments. The query then resolves that key's lineage id
    * from its CURRENT segment and re-reads the history BY ID through
    * [[rowHistory]] — so the oracle checks both that COW updates
    * preserved one lineage id across the chain (three segments come
    * back from one id) and that the id-pruned read returns exactly the
    * business-level history DuckDB restates. */
  def rowHistoryLookup(spark: SparkSession, dir: String): DataFrame = {
    val srcT = freshTable("s57-src-", dir)
    val tgtT = freshTable("s57-tgt-", dir)
    val ev = eventsSlim(spark, dir)
    val base = ev.filter(col("event_date") <= "2024-01-20")
    Snapshots.commitAll(srcT, Snapshots.stageWithStats(
      base, srcT, "event_date", "event_id"))                            // v1
    val key = base.agg(min(col("event_id"))).head().getLong(0)
    Mutations.updateWhere(spark, srcT, col("event_id") === key,
      Map("value" -> (col("value") + 100.0)), "event_date")             // v2
    Mutations.updateWhere(spark, srcT, col("event_id") === key,
      Map("value" -> (col("value") + 100.0)), "event_date")             // v3
    ChangeApply.mirrorScd2(spark, tgtT, srcT, Seq("event_id"), "event_date")
    val rid = Snapshots.read(spark, tgtT)
      .filter(col("event_id") === key && col(CurrentCol))
      .select(col(SourceRowIdCol)).head().getLong(0)
    rowHistory(spark, tgtT, rid)
      .select(col("event_id"), col("value"),
        col(StartCol), col(EndCol), col(CurrentCol))
      .orderBy(col(StartCol))
  }

  lazy val rowHistoryOracle: String =
    """WITH base AS (
      |  SELECT event_id, value FROM events
      |  WHERE CAST(ts AS DATE) <= DATE '2024-01-20'),
      |v0 AS (
      |  SELECT event_id, value FROM base
      |  WHERE event_id = (SELECT min(event_id) FROM base))
      |SELECT event_id, value,
      |       CAST(sv AS BIGINT) AS __start_version,
      |       CAST(ev AS BIGINT) AS __end_version,
      |       ev IS NULL AS __is_current
      |FROM (
      |  SELECT event_id, value, 1 AS sv, 2 AS ev FROM v0
      |  UNION ALL
      |  SELECT event_id, value + 100.0, 2, 3 FROM v0
      |  UNION ALL
      |  SELECT event_id, value + 100.0 + 100.0, 3, NULL FROM v0)
      |ORDER BY __start_version""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("s48_cdc_mirror", cdcMirrorOracle)(cdcMirror),
    QueryDef.sql("s49_cdc_scd2", cdcScd2Oracle)(cdcScd2),
    QueryDef.sql("s57_row_history", rowHistoryOracle)(rowHistoryLookup))
}
