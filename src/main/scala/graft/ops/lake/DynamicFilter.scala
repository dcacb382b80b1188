package graft.ops.lake

import graft.engine.{Caching, Exact, Graft, QueryDef, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThanOrEqual, In, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.functions._

/** DYNAMIC FILE PRUNING for selective dim→fact joins (the Databricks
  * DFP shape): when the build side of a star-schema join is small —
  * a dimension already cut down by its own filters — the fact side
  * should never open files that cannot contain a matching key. Static
  * pruning can't see this (the key set exists only at run time), so
  * the operator materializes it:
  *
  *   1. collect the dim side's DISTINCT join keys, capped at `maxKeys`
  *      (one job over the already-filtered dim — the same driver-side
  *      collect a broadcast join pays anyway);
  *   2. within the cap, compile the key set as an `IN` predicate
  *      against the fact's MANIFEST stats ([[Pruning.compile]] — the
  *      identical translation the SQL scan path uses): per-file
  *      min/max range overlap, bloom-sketch membership, and tag
  *      equality when the key IS the partition column. Files that
  *      prove no key fall away BEFORE any footer is read; the
  *      surviving scan also gets the `isin` row filter, so parquet
  *      row-group stats prune inside the opened files too;
  *   3. over the cap, fall back to the key RANGE (min/max of the dim
  *      keys, two scalars) — coarser, still sound, never collects an
  *      unbounded set onto the driver.
  *
  * Restricted to `inner` and `left_semi` joins — the shapes where
  * dropping provably-unmatched FACT rows is semantics-preserving
  * (an outer join must surface them). The 100 TB case this exists
  * for: a 10⁶-file fact joined to a dim filtered to one region/day —
  * static plans scan everything; this opens the handful of files the
  * keys actually land in.
  *
  * Ref analog: none — the reference's joins materialize full tables
  * into pandas before filtering (`build_fact_fee_tax.py`). */
object DynamicFilter {

  /** COST GATE default (r14): below this many manifest entries the
    * prune is skipped outright. The prune's price is fixed-ish — one
    * dim-side distinct+collect job plus a per-entry predicate pass —
    * while its payoff scales with the files it can avoid opening;
    * Dd15Probe measured the fixture-scale crossover (135 files: pruned
    * probe 0.61 s vs plain join 0.39 s), so a small fact pays more for
    * the key collect than the whole scan costs. The manifest entry
    * count is free (driver-resident log), making the gate a zero-job
    * decision. 256 places the flip just above the measured crossover;
    * callers proving the prune on small fixtures pass `minFiles = 0`.
    *
    * CONFIRMED at sf1 (r15, [[graft.tools.GateProbe]] — a 6M-row
    * lineitem corpus cut into 4k-row files, 1%-selective clustered
    * dim): plain wins at 32 files (0.77 vs 1.01 s) and 128 files
    * (0.35 vs 1.00 s), the prune wins at 512 files (0.51 vs 0.79 s) —
    * the crossover sits inside (128, 512), bracketing 256 from both
    * sides at a decade above the original fixture. */
  val DefaultMinFiles = 256

  /** True when [[prunedJoin]]'s cost gate would skip pruning for
    * `factTable` at `minFiles` — split out so specs pin the decision
    * without inferring it from job counts. */
  private[graft] def costGateSkips(factTable: String, minFiles: Int): Boolean =
    Snapshots.entriesAll(factTable).size < minFiles

  /** Entry predicate for `factKey ∈ keys(dim)` against `factTable`'s
    * manifest stats — split out so specs and probes can count
    * surviving entries without running the join. Returns the predicate
    * and the collected keys (None = over the cap, range fallback). */
  private[graft] def keyPrune(spark: SparkSession, factTable: String,
                             factKey: String, dim: DataFrame, dimKey: String,
                             maxKeys: Int,
                             factTagCol: Option[String]): (Snapshots.Entry => Boolean, Option[Seq[Any]]) = {
    val phys = Snapshots.physicalName(factTable, factKey)
    // the tag-equality bonus fires only when the caller SAYS the join
    // key is the fact's partition column — guessing it from the key
    // name would tag-compare unrelated values and prune matching files
    val tagCol = factTagCol
      .filter(_.equalsIgnoreCase(factKey)).map(_ => phys).getOrElse("")
    val dt = dim.schema(dimKey).dataType
    // the key RANGE prune: two scalars from a dim-side agg — no
    // unbounded driver collect. Reached over the cap, or DIRECTLY when
    // the caller already knows the collect is hopeless (maxKeys <= 0 —
    // [[statsAwareJoin]]'s "range" verdict; the pre-r13 shape still
    // ran a wasted full-dim distinct job just to discover size > 0,
    // r13 review find)
    def rangeFallback(): (Snapshots.Entry => Boolean, Option[Seq[Any]]) = {
      val mm = dim.agg(min(col(dimKey)), max(col(dimKey))).head()
      val range: Seq[Expression] =
        if (mm.isNullAt(0)) Seq.empty
        else {
          val a = AttributeReference(phys, dt)()
          Seq(GreaterThanOrEqual(a, Literal.create(mm.get(0), dt)),
            LessThanOrEqual(a, Literal.create(mm.get(1), dt)))
        }
      (Pruning.compile(range, tagCol = tagCol, table = factTable), None)
    }
    if (maxKeys <= 0) return rangeFallback()
    val keys = dim.select(col(dimKey)).na.drop().distinct()
      .limit(maxKeys + 1).collect().map(_.get(0)).toSeq
    if (keys.isEmpty) ((_: Snapshots.Entry) => false, Some(Seq.empty))
    else if (keys.size <= maxKeys) {
      val in: Expression = In(AttributeReference(phys, dt)(),
        keys.map(v => Literal.create(v, dt)))
      (Pruning.compile(Seq(in), tagCol = tagCol, table = factTable), Some(keys))
    } else rangeFallback()
  }

  /** Per-PARTITION key prune (r13): when the fact is TAG-partitioned on
    * one column and stats-clustered on another — dd15's LSH index, tag
    * = band, stats = band_hash — an untagged key prune leaks across
    * partitions: a key drawn from partition 3's value space still
    * overlaps file ranges in every other partition (measured: a 24-hash
    * point probe kept 82/135 files untagged). Collecting (tag, key)
    * PAIRS and compiling `OR over tags of (tag = t AND key IN keys_t)`
    * scopes each key list to its own partition's files;
    * [[Pruning.compile]]'s Or/And translation does the rest. Over the
    * cap, falls back to the untagged range prune (sound, coarser). */
  private[graft] def taggedKeyPrune(spark: SparkSession, factTable: String,
      factKey: String, dim: DataFrame, dimKey: String, dimTagCol: String,
      factTagCol: String, maxKeys: Int): (Snapshots.Entry => Boolean, Option[Seq[Any]]) = {
    val physKey = Snapshots.physicalName(factTable, factKey)
    val physTag = Snapshots.physicalName(factTable, factTagCol)
    val dt = dim.schema(dimKey).dataType
    val pairs = dim
      .select(col(dimTagCol).cast("string").as("__t"), col(dimKey).as("__k"))
      .na.drop().distinct().limit(maxKeys + 1).collect()
    val tagAttr = AttributeReference(physTag, org.apache.spark.sql.types.StringType)()
    val keyAttr = AttributeReference(physKey, dt)()
    // BALANCED Or tree, not reduceLeft: Pruning.translate recurses once
    // per Or node and the compiled anyOf closures nest to the same
    // depth — a left-deep chain of ~10k branches would overflow the
    // driver stack at compile time (r13 review find); balanced depth
    // is log2(n) ≈ 14 at the cap
    def orTree(es: Seq[Expression]): Expression =
      if (es.size == 1) es.head
      else Or(orTree(es.take(es.size / 2)), orTree(es.drop(es.size / 2)))
    if (pairs.isEmpty) ((_: Snapshots.Entry) => false, Some(Seq.empty))
    else if (pairs.length <= maxKeys) {
      val expr = orTree(pairs.groupBy(_.getString(0)).toSeq.map { case (t, rs) =>
        And(EqualTo(tagAttr, Literal.create(t, org.apache.spark.sql.types.StringType)),
          In(keyAttr, rs.map(r => Literal.create(r.get(1), dt)))): Expression
      })
      (Pruning.compile(Seq(expr), tagCol = physTag, table = factTable),
        Some(pairs.map(_.get(1)).distinct.toSeq))
    } else {
      // over the pair cap: ONE grouped agg derives per-tag key ranges —
      // still partition-scoped (each tag's band prunes only its own
      // files) and no dim re-scan: the pre-r13 fallback threw the
      // collected pairs away and re-ran keyPrune's distinct+collect,
      // up to three dim jobs where one suffices (r13 review find).
      // NULL tags / NULL keys drop BEFORE the limit (a post-limit
      // filter would let null groups crowd real tags out of the
      // collected window and silently prune their files — unsound,
      // r13 review find); null-keyed rows match nothing in the
      // equi-join, so excluding them is exact.
      val byTag = dim
        .select(col(dimTagCol).cast("string").as("__t"), col(dimKey).as("__k"))
        .na.drop()
        .groupBy(col("__t"))
        .agg(min(col("__k")).as("__lo"), max(col("__k")).as("__hi"))
        .limit(maxKeys + 1).collect()
      if (byTag.isEmpty) ((_: Snapshots.Entry) => false, Some(Seq.empty))
      else if (byTag.length > maxKeys) // more tags than the cap: global range
        keyPrune(spark, factTable, factKey, dim, dimKey, maxKeys, None)
      else {
        val expr = orTree(byTag.toSeq.map { r =>
          And(EqualTo(tagAttr,
              Literal.create(r.getString(0), org.apache.spark.sql.types.StringType)),
            And(GreaterThanOrEqual(keyAttr, Literal.create(r.get(1), dt)),
              LessThanOrEqual(keyAttr, Literal.create(r.get(2), dt)))): Expression
        })
        (Pruning.compile(Seq(expr), tagCol = physTag, table = factTable), None)
      }
    }
  }

  /** Join `factTable` (a snapshot table) to `dim` on
    * `factKey = dimKey`, file-pruning the fact side by the dim's
    * runtime key set. `joinType` must be `inner` or `left_semi`.
    *
    * `extraJoinCols` (r13) appends SAME-NAMED equi-conditions — columns
    * present on BOTH sides — to the join. They participate in matching
    * only, never in pruning: the file filter stays keyed on `factKey`
    * alone (a sound superset — extra conjuncts can only shrink the
    * match set). This is the multi-column-bucket shape dd15's LSH index
    * probe needs: prune on the stats-clustered `band_hash`, match on
    * `(band_id, band_hash)`.
    *
    * `dimTagCol` (r13, with `factTagCol` naming a column ≠ `factKey`):
    * the dim column whose STRING rendering equals the fact's partition
    * tag — switches to the per-partition [[taggedKeyPrune]], scoping
    * each collected key to its partition's files. Two caller contracts
    * make that scoping sound, and the first is ENFORCED here (r13
    * advisor find — an unenforced contract here is silent row loss,
    * not a loud failure):
    *
    *   - `extraJoinCols` must contain `dimTagCol`: the join itself has
    *     to equate the tag-bearing column on both sides, or a fact row
    *     in partition A could legitimately match a dim row whose tag
    *     says B — files the tag-scoped prune just dropped. Required
    *     below; necessary, not merely advisory.
    *   - `factTagCol` must name the table's ACTUAL staged partition-tag
    *     column, and the fact must satisfy
    *     `factTagCol = cast(dimTagCol as string)` row-for-row (dd15:
    *     `band = cast(band_id as string)`, staged exactly so). This
    *     half is a data invariant the engine cannot check from the
    *     manifest alone — it is the documented price of the
    *     per-partition prune; when in doubt pass no `dimTagCol` and
    *     keep the untagged (coarser, unconditionally sound) prune.
    *
    * `bloomKeys` (r14, > 0 enables): when the collect lands OVER the
    * cap — today's range-only fallback, where the surviving fact scan
    * carries NO row filter — build a bloom sketch of the dim's keys
    * (one extra agg over the already-persisted dim; no distinct, no
    * exchange — bloom insertion is idempotent) and plant
    * `might_contain(sketch, xxhash64(key))` as the fact's ROW filter.
    * That is the piece of Spark's own runtime-filter machinery the
    * over-cap path was missing: at 100 TB a 10⁶-distinct-key dim
    * blows any IN-list cap, the key RANGE keeps most files, and
    * without a row filter every surviving fact row ships into the
    * join exchange; the sketch (≤ [[BloomMaxBits]]/8 bytes, driver →
    * plan literal, the same arrival as a broadcast hash table) cuts
    * non-matching rows BEFORE the shuffle. False positives only —
    * the join itself stays the exact verdict — so soundness is never
    * at stake. `xxhash64` hashes by PHYSICAL type (INT and LONG of
    * equal value hash differently), so the dim-side hash input is
    * cast to the fact key's type, and the bloom applies only to
    * hash-compatible key pairs — identical types, or
    * integral↔integral where that cast is provably lossless for every
    * joinable value; other cross-type joins (numeric↔string, lossy
    * double promotions) silently skip the bloom rather than risk a
    * false NEGATIVE. `bloomKeys` itself is the expected distinct-key
    * count and sizes the sketch (~16 bits per key, the ~0.05% FPP
    * point, clamped to [[BloomMaxBits]]). */
  def prunedJoin(spark: SparkSession, factTable: String, dim: DataFrame,
                 factKey: String, dimKey: String,
                 joinType: String = "inner",
                 maxKeys: Int = 10000,
                 factTagCol: Option[String] = None,
                 extraJoinCols: Seq[String] = Seq.empty,
                 dimTagCol: Option[String] = None,
                 minFiles: Int = DefaultMinFiles,
                 bloomKeys: Long = 0L): DataFrame = {
    val jt = joinType.toLowerCase(java.util.Locale.ROOT).replace("_", "")
    require(jt == "inner" || jt == "leftsemi" || jt == "semi",
      s"prunedJoin: file-pruning the fact side is only sound for " +
        s"inner/left_semi joins, got '$joinType'")
    def joinAgainst(fact: DataFrame, dimSide: DataFrame): DataFrame = {
      val cond = extraJoinCols.foldLeft(fact(factKey) === dimSide(dimKey)) {
        (c, k) => c && (fact(k) === dimSide(k))
      }
      fact.join(dimSide, cond, if (jt == "inner") "inner" else "left_semi")
    }
    // persisted: the (already-filtered, selective) dim is evaluated for
    // the key collect AND as the probe/build side of the join — an
    // expensive dim subquery must not run twice
    // the tagged prune's join-condition half of its contract, checked
    // eagerly: without dimTagCol in the equi-join, tag-scoped pruning
    // drops fact files holding genuine cross-partition matches (r13
    // advisor find — see the dimTagCol scaladoc above)
    dimTagCol.filter(_ => factTagCol.exists(!_.equalsIgnoreCase(factKey)))
      .foreach { dtc =>
        require(extraJoinCols.exists(_.equalsIgnoreCase(dtc)),
          s"prunedJoin($factTable): per-partition pruning on dimTagCol " +
            s"'$dtc' requires the join to equate it on both sides — add " +
            s"'$dtc' to extraJoinCols (otherwise a fact row may match a " +
            "dim row from another partition whose files were pruned)")
      }
    // COST GATE (r14, from the free manifest entry count — zero jobs):
    // on a small fact the key collect + per-entry predicate cost more
    // than the unpruned scan they would save ([[DefaultMinFiles]]);
    // skip straight to the plain join — same rows, cheaper arrival.
    // The dim is evaluated ONCE here, so no persist either.
    if (costGateSkips(factTable, minFiles))
      return joinAgainst(
        Mutations.readMerged(spark, factTable, mergeSchema = true), dim)
    val dimP = Caching.persist(dim)
    val (pred, keysOpt) = (factTagCol, dimTagCol) match {
      case (Some(ft), Some(dtc)) if !ft.equalsIgnoreCase(factKey) =>
        taggedKeyPrune(spark, factTable, factKey, dimP, dimKey, dtc, ft, maxKeys)
      case _ =>
        keyPrune(spark, factTable, factKey, dimP, dimKey, maxKeys, factTagCol)
    }
    val fact = Mutations.readMerged(spark, factTable,
      fileFilter = pred, mergeSchema = true)
    val filtered = keysOpt match {
      case Some(ks) if ks.isEmpty => fact.filter(lit(false))
      // the collected keys double as a pushed row filter: parquet
      // row-group stats prune INSIDE the surviving files
      case Some(ks) => fact.filter(col(factKey).isin(ks: _*))
      // over the cap: optionally a bloom ROW filter where the IN list
      // could not fit (see the bloomKeys scaladoc); file pruning
      // already degraded to the key range above
      case None if bloomKeys > 0L =>
        // column-name resolution is case-insensitive everywhere else in
        // this path (col(...)); the schema lookup must match it
        val factType = fact.schema
          .find(_.name.equalsIgnoreCase(factKey)).map(_.dataType)
        factType.flatMap(t =>
          bloomRowFilter(spark, dimP, dimKey, t, bloomKeys)) match {
          case Some(probe) => fact.filter(probe(col(factKey)))
          case None => fact
        }
      case None => fact
    }
    joinAgainst(filtered, dimP)
  }

  /** Sketch-size ceiling for [[prunedJoin]]'s over-cap bloom row
    * filter — the engine-wide policy lives on
    * [[graft.functions.BloomSketch.MaxBits]] (one definition, shared
    * with the SQL DFP twin). */
  val BloomMaxBits: Long = graft.functions.BloomSketch.MaxBits

  /** Build the over-cap bloom probe: ONE agg over the (persisted) dim
    * — no distinct, no exchange — returning a closure that filters any
    * fact-side key column. `None` when the dim turned out empty (the
    * sketch is null; nothing to probe) or when the key types are not
    * hash-compatible: `xxhash64` hashes by PHYSICAL type, so the probe
    * is sound only when the dim-side insert provably hashes every
    * joinable value the fact side will probe with. Identical types
    * always qualify (hashed as-is on both sides); mixed
    * integral↔integral hashes BOTH sides WIDENED to LONG — widening
    * casts are exact for every integral value, so equal join keys
    * always hash equal. (The first cut narrowed the DIM key to the
    * fact's type instead, reasoning a wrap-around only adds false
    * positives — but under Spark 4's default ANSI mode an
    * out-of-range dim key makes the narrowing cast THROW
    * CAST_OVERFLOW, failing a query that works with bloomKeys=0 —
    * r14 advisor find.) Anything else — numeric↔string renderings,
    * lossy double promotions — is skipped: a missed insert there is a
    * false NEGATIVE, i.e. silent row loss, the one failure class this
    * operator must never trade for speed. */
  private def bloomRowFilter(spark: SparkSession, dimP: DataFrame,
      dimKey: String, factKeyType: org.apache.spark.sql.types.DataType,
      bloomKeys: Long): Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.types._
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    val dimType = dimP.schema
      .find(_.name.equalsIgnoreCase(dimKey)).map(_.dataType)
    val identical = dimType.contains(factKeyType)
    val mixedIntegral = !identical &&
      dimType.exists(integral) && integral(factKeyType)
    if (!identical && !mixedIntegral) return None
    val hashIn = if (identical) col(dimKey) else col(dimKey).cast(LongType)
    val sketch = dimP
      .agg(graft.functions.BloomSketch
        .sizedSketchAgg(spark, xxhash64(hashIn), bloomKeys).as("bf"))
      .head.getAs[Array[Byte]](0)
    Option(sketch).map { s => (key: org.apache.spark.sql.Column) =>
      val probe = if (identical) key else key.cast(LongType)
      call_function("graft_bloom_might_contain", lit(s), xxhash64(probe))
    }
  }

  /** NDV-DRIVEN strategy pre-choice (r12, the ANALYZE consumer): when
    * the dim side is itself a lake table with recorded column stats,
    * the recorded NDV of its join key decides — WITHOUT running any
    * job — whether the IN-list prune can possibly fit its cap:
    *
    *   - `Some("inlist")` — recorded NDV ≤ maxKeys: the key collect is
    *     bounded and worth running;
    *   - `Some("range")` — recorded NDV > maxKeys: the collect job
    *     would only discover the cap and fall back; skip straight to
    *     the two-scalar range prune (saves a full dim job at 100×);
    *   - `None` — never analyzed: no basis, run the collect and let
    *     the cap decide at run time (the pre-r12 behavior).
    *
    * Table-level NDV is an UPPER bound for any filtered dim subset, so
    * "inlist" is always safe; "range" is a heuristic (a selective dim
    * filter could have fit the cap) that trades one possibly-wasted
    * collect for never paying it — callers with known-selective
    * filters can call [[prunedJoin]] directly. */
  /** `maxStaleVersions` (r13): stats recorded more than this many
    * versions behind the live snapshot answer None (fall back to the
    * runtime collect). Default unbounded — staleness here affects only
    * OPTIMALITY, never soundness: an "inlist" answer is re-capped by
    * [[prunedJoin]] at run time regardless of what the stats claimed. */
  def strategyByStats(dimTable: String, dimKey: String,
                      maxKeys: Int = 10000,
                      maxStaleVersions: Long = Long.MaxValue): Option[String] =
    Analyze.analyzedVersion(dimTable)
      .filter(Snapshots.currentVersion(dimTable) - _ <= maxStaleVersions)
      .flatMap(_ => Analyze.ndvOf(dimTable, dimKey))
      .map(ndv => if (ndv <= maxKeys) "inlist" else "range")

  /** HISTOGRAM-DRIVEN strategy pre-choice (r13, the selectivity
    * consumer the r12 verdict asked for): the dim side arrives cut by a
    * range predicate `filterCol ∈ [lo, hi]`, and the recorded
    * equi-height histogram estimates the surviving fraction with ZERO
    * scan jobs — both inputs are snapshot props. The recorded NDV of
    * the join key scales by that selectivity (uniform key-per-filter
    * assumption, the textbook estimate):
    *
    *   - `Some("inlist")` — estimated post-filter NDV ≤ maxKeys: the
    *     bounded key collect is worth running even though the
    *     TABLE-level NDV alone would have said "range";
    *   - `Some("range")`  — estimate over the cap: skip the collect;
    *   - `None` — NDV or histogram absent, or either stats family is
    *     more than `maxStaleVersions` behind the live snapshot (the
    *     estimate would describe a different table; fall back to the
    *     runtime cap, the pre-stats behavior).
    *
    * Soundness is never at stake — a low estimate only sends the
    * caller into [[prunedJoin]], whose runtime cap still bounds the
    * collect; a high estimate only forfeits an IN-list prune.
    *
    * UNITS: `lo`/`hi` are in the histogram's RECORDED value space —
    * the column's own doubles for numerics, but EPOCH DAYS for DATE
    * and EPOCH MICROS for TIMESTAMP columns ([[Analyze.histogram]]'s
    * `unix_date`/`unix_micros` conversions). Passing epoch millis for
    * a timestamp column silently estimates ~0 or ~1 and steers every
    * decision wrong (never unsound, always wasteful — r13 review
    * find). Convert with `unix_micros(lit(ts))` / `unix_date` first. */
  def strategyForRange(dimTable: String, dimKey: String,
                       filterCol: String, lo: Double, hi: Double,
                       maxKeys: Int = 10000,
                       maxStaleVersions: Long = 64): Option[String] = {
    val cur = Snapshots.currentVersion(dimTable)
    for {
      av <- Analyze.analyzedVersion(dimTable)
      if cur - av <= maxStaleVersions
      hv <- Analyze.histogramVersionOf(dimTable, filterCol)
      if cur - hv <= maxStaleVersions
      ndv <- Analyze.ndvOf(dimTable, dimKey)
      sel <- Analyze.rangeSelectivity(dimTable, filterCol, lo, hi)
    } yield if (ndv * sel <= maxKeys) "inlist" else "range"
  }

  /** [[prunedJoin]] with the strategy CHOSEN FROM RECORDED STATS (r13 —
    * the production consumer of [[strategyForRange]]): the dim side is
    * a lake table cut by a numeric `filterCol ∈ [lo, hi]`; recorded NDV
    * × histogram selectivity decide, with zero scan jobs, whether the
    * IN-list key collect is worth running ("inlist"), hopeless
    * ("range" — the big collect is skipped outright and the prune
    * degrades to the two-scalar key range immediately), or undecidable
    * (no/stale stats — run the collect and let the runtime cap decide,
    * the pre-stats behavior). The join RESULT is identical in every
    * branch; only the price of getting there changes — which is the
    * whole point of a cost-based choice.
    *
    * `lo`/`hi` accept the filter column's OWN literal space (r14 —
    * closes the r13 verdict's units trap): numbers for numeric
    * columns; `java.sql.Date`/`LocalDate`/`"yyyy-MM-dd"` strings for
    * DATE columns; `java.sql.Timestamp`/`Instant`/timestamp strings
    * (resolved in the Spark session timezone, never the JVM default)
    * for TIMESTAMP columns. The histogram value-space conversion —
    * epoch days for dates, epoch micros for timestamps, exactly what
    * [[Analyze.histogram]] records — is derived HERE from the column's
    * type, on the driver with zero jobs, so callers can no longer pass
    * epoch millis and silently steer every estimate to ~0 or ~1.
    * Hand-converted numerics (epoch days/micros) are still accepted
    * for temporal columns, preserving pre-r14 call sites. */
  def statsAwareJoin(spark: SparkSession, factTable: String,
                     dimTable: String, factKey: String, dimKey: String,
                     filterCol: String, lo: Any, hi: Any,
                     maxKeys: Int = 10000,
                     factTagCol: Option[String] = None,
                     minFiles: Int = DefaultMinFiles,
                     bloomKeys: Long = 0L): DataFrame = {
    val dim0 = Mutations.readMerged(spark, dimTable, mergeSchema = true)
    val (dim, (fName, loH, hiH)) =
      resolveRangeFilter(spark, dim0, filterCol, lo, hi,
        s"statsAwareJoin($dimTable)")
    val capped = strategyForRange(dimTable, dimKey, fName, loH, hiH, maxKeys) match {
      case Some("range") => 0 // hopeless: skip straight to the range prune
      case _ => maxKeys       // inlist, or no basis: runtime cap decides
    }
    // bloomKeys forwards so a stats-decided "range" verdict (or a
    // runtime cap overflow) still gets the over-cap bloom ROW filter —
    // the verdict skips the key COLLECT job, and the one-pass sketch
    // agg over the filtered dim is exactly what it buys instead
    prunedJoin(spark, factTable, dim, factKey, dimKey,
      maxKeys = capped, factTagCol = factTagCol, minFiles = minFiles,
      bloomKeys = bloomKeys)
  }

  /** THE range-filter derivation shared by [[statsAwareJoin]] and
    * [[graft.ops.gold.JoinOrder]]'s filtered legs (one definition — a
    * prior copy had to re-receive the case-insensitivity fix by hand,
    * r14 review find): resolve `filterCol` case-insensitively to the
    * schema's canonical spelling (every sibling path — `col()`,
    * `Analyze.resolveCols`, the skew key checks — resolves
    * insensitively, and the canonical name is what the stats props
    * are keyed by), normalize both endpoints via [[rangeEndpoint]],
    * and return the filtered frame plus the histogram-space bounds.
    * `verb` names the CALLING operator in every error. */
  private[graft] def resolveRangeFilter(spark: SparkSession, df: DataFrame,
      filterCol: String, lo: Any, hi: Any,
      verb: String): (DataFrame, (String, Double, Double)) = {
    val field = df.schema
      .find(_.name.equalsIgnoreCase(filterCol))
      .getOrElse(throw new IllegalArgumentException(
        s"$verb: no column '$filterCol' " +
          s"(frame has ${df.columns.mkString(", ")})"))
    val (loLit, loH) = rangeEndpoint(spark, field.dataType, lo, field.name, verb)
    val (hiLit, hiH) = rangeEndpoint(spark, field.dataType, hi, field.name, verb)
    (df.filter(col(field.name) >= lit(loLit) && col(field.name) <= lit(hiLit)),
      (field.name, loH, hiH))
  }

  /** One range endpoint, normalized for a `dt`-typed filter column →
    * (column-space literal for the dim filter, histogram-space double
    * for [[strategyForRange]]). Pure driver work — no Spark job, so
    * the zero-scan-job contract of the stats pre-choice holds through
    * the conversion. Timestamp STRINGS resolve in
    * `spark.sql.session.timeZone` (the [[graft.streaming.ChangesSource]]
    * convention — the JVM default zone must never decide an instant);
    * raw numbers on temporal columns are taken as already-converted
    * histogram-space values (epoch days / epoch micros). */
  private[graft] def rangeEndpoint(spark: SparkSession,
                                   dt: org.apache.spark.sql.types.DataType,
                                   v: Any, filterCol: String,
                                   verb: String = "statsAwareJoin"): (Any, Double) = {
    import org.apache.spark.sql.types.{DateType, NumericType, TimestampType}
    def bad(): Nothing = throw new IllegalArgumentException(
      s"$verb: cannot interpret ${v.getClass.getSimpleName} " +
        s"'$v' as a bound for ${dt.sql} column '$filterCol'")
    dt match {
      case DateType =>
        val ld = v match {
          case d: java.sql.Date => d.toLocalDate
          case d: java.time.LocalDate => d
          case s: String =>
            try java.time.LocalDate.parse(s.trim)
            catch { case _: java.time.format.DateTimeParseException => bad() }
          case n: java.lang.Number => // hand-converted epoch days
            java.time.LocalDate.ofEpochDay(n.longValue())
          case _ => bad()
        }
        (ld, ld.toEpochDay.toDouble)
      case TimestampType =>
        val zone = java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)
        def inst(i: java.time.Instant): (Any, Double) =
          (i, i.getEpochSecond * 1e6 + i.getNano / 1000L)
        v match {
          case t: java.sql.Timestamp => inst(t.toInstant)
          case i: java.time.Instant => inst(i)
          case s: String =>
            val t = s.trim
            val parsed =
              try java.time.Instant.parse(t) // explicit offset/Z wins
              catch { case _: java.time.format.DateTimeParseException =>
                val ldt =
                  try java.time.LocalDateTime.parse(t.replace(' ', 'T'))
                  catch { case _: java.time.format.DateTimeParseException =>
                    try java.time.LocalDate.parse(t).atStartOfDay()
                    catch { case _: java.time.format.DateTimeParseException => bad() }
                  }
                ldt.atZone(zone).toInstant
              }
            inst(parsed)
          case n: java.lang.Number => // hand-converted epoch micros
            val us = n.longValue()
            inst(java.time.Instant.ofEpochSecond(us / 1000000L,
              (us % 1000000L) * 1000L))
          case _ => bad()
        }
      case _: NumericType => v match {
        case n: java.lang.Number => (n, n.doubleValue())
        case _ => bad()
      }
      case _ => bad() // histograms cover numeric/date/timestamp only
    }
  }

  // ---- oracle-gated exercise ---------------------------------------

  private def freshTable(prefix: String, dir: String): String =
    Graft.freshDir(prefix + dir.replaceAll("[^A-Za-z0-9.]", "_"))

  /** s50: DFP join under the oracle gate — the fact (events, key-
    * clustered lake table) joins a dim that its own filter cut to
    * ~0.1% of the key space; the manifest prune + isin pushdown must
    * not lose a single matching row vs DuckDB's full join. The
    * file-count claim lives in the spec (this query pins
    * correctness). */
  def dfpJoin(spark: SparkSession, dir: String): DataFrame = {
    val factT = freshTable("s50-fact-", dir)
    val ev = Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "event_type", "value", "event_date")
    Snapshots.commitAll(factT, Snapshots.stageWithStats(
      ev, factT, "event_date", "event_id"))
    val dim = ev.filter(col("event_id") % 1000 === 0)
      .select(col("event_id").as("dim_id"),
        concat(lit("seg-"), (col("event_id") % 7).cast("string")).as("segment"))
      .distinct()
    // minFiles = 0: the fixture sits under the cost gate, but the whole
    // point of this oracle is row-soundness of the PRUNE path — force it
    // (production callers keep the gate)
    DynamicFilter.prunedJoin(spark, factT, dim, "event_id", "dim_id",
        minFiles = 0)
      .groupBy("segment")
      .agg(count(lit(1)).as("n"), Exact.decSum(col("value")).as("sum_value"))
      .orderBy("segment")
  }

  lazy val dfpJoinOracle: String =
    """WITH dim AS (
      |  SELECT DISTINCT event_id AS dim_id,
      |         'seg-' || CAST(event_id % 7 AS VARCHAR) AS segment
      |  FROM events WHERE event_id % 1000 = 0)
      |SELECT segment, count(*) AS n,
      |       CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_value
      |FROM events e JOIN dim d ON e.event_id = d.dim_id
      |GROUP BY segment ORDER BY segment""".stripMargin

  /** s58: the stats-aware DFP join under the oracle gate — the dim is
    * a committed lake table with ANALYZE + histogram recorded, cut by a
    * score range; [[statsAwareJoin]] consults the recorded stats to
    * pick the prune strategy (here: selectivity ~5% × NDV → "inlist")
    * and the joined aggregate must equal DuckDB's plain filtered join.
    * This is the end-to-end consumer proving the ANALYZE/histogram
    * props drive a real join, not just a spec (r12 verdict item 2). */
  def statsDfpJoin(spark: SparkSession, dir: String): DataFrame = {
    val factT = freshTable("s58-fact-", dir)
    val dimT = freshTable("s58-dim-", dir)
    val ev = Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "event_type", "value", "event_date")
    Snapshots.commitAll(factT, Snapshots.stageWithStats(
      ev, factT, "event_date", "event_id"))
    val dim = ev.select(col("event_id").as("dim_id"),
      col("value").as("score"),
      concat(lit("seg-"), (col("event_id") % 5).cast("string")).as("segment"))
    Snapshots.commitAll(dimT, Snapshots.stageWithStats(
      dim, dimT, "segment", "dim_id"))
    Analyze.analyze(spark, dimT, Seq("dim_id", "score"))
    Analyze.histogram(spark, dimT, "score", 16)
    // minFiles = 0: same fixture-scale forcing as s50 — the oracle must
    // cover the stats-chosen prune path, not the gate's plain join
    statsAwareJoin(spark, factT, dimT, "event_id", "dim_id",
        "score", 0.0, 25.0, minFiles = 0)
      .groupBy("segment")
      .agg(count(lit(1)).as("n"), Exact.decSum(col("value")).as("sum_value"))
      .orderBy("segment")
  }

  lazy val statsDfpJoinOracle: String =
    """WITH dim AS (
      |  SELECT event_id AS dim_id, value AS score,
      |         'seg-' || CAST(event_id % 5 AS VARCHAR) AS segment
      |  FROM events)
      |SELECT segment, count(*) AS n,
      |       CAST(CAST(SUM(CAST(e.value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_value
      |FROM events e JOIN dim d ON e.event_id = d.dim_id
      |WHERE d.score >= 0.0 AND d.score <= 25.0
      |GROUP BY segment ORDER BY segment""".stripMargin

  /** s61: [[statsAwareJoin]] with a DATE filter column passed as plain
    * `yyyy-MM-dd` strings (r14, r13 verdict item 3) — the engine
    * derives the epoch-day histogram conversion from the column type,
    * the recorded stats pick the strategy (5 of 30 days ≈ 17%
    * selectivity × 10k NDV → "inlist"), and the joined aggregate must
    * equal DuckDB's plain date-filtered join. A companion spec pins
    * that the typed bounds hit the SAME strategy as hand-converted
    * epoch days. */
  def statsDfpDateJoin(spark: SparkSession, dir: String): DataFrame = {
    val factT = freshTable("s61-fact-", dir)
    val dimT = freshTable("s61-dim-", dir)
    val ev = Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "event_type", "value", "event_date")
    Snapshots.commitAll(factT, Snapshots.stageWithStats(
      ev, factT, "event_date", "event_id"))
    val dim = ev.select(col("event_id").as("dim_id"),
      col("event_date"),
      concat(lit("seg-"), (col("event_id") % 5).cast("string")).as("segment"))
    Snapshots.commitAll(dimT, Snapshots.stageWithStats(
      dim, dimT, "segment", "dim_id"))
    Analyze.analyze(spark, dimT, Seq("dim_id", "event_date"))
    Analyze.histogram(spark, dimT, "event_date", 16)
    // minFiles = 0: same fixture-scale forcing as s50/s58
    statsAwareJoin(spark, factT, dimT, "event_id", "dim_id",
        "event_date", "2024-01-03", "2024-01-07", minFiles = 0)
      .groupBy("segment")
      .agg(count(lit(1)).as("n"), Exact.decSum(col("value")).as("sum_value"))
      .orderBy("segment")
  }

  lazy val statsDfpDateJoinOracle: String =
    """WITH dim AS (
      |  SELECT event_id AS dim_id, CAST(ts AS DATE) AS event_date,
      |         'seg-' || CAST(event_id % 5 AS VARCHAR) AS segment
      |  FROM events)
      |SELECT segment, count(*) AS n,
      |       CAST(CAST(SUM(CAST(e.value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_value
      |FROM events e JOIN dim d ON e.event_id = d.dim_id
      |WHERE d.event_date >= DATE '2024-01-03' AND d.event_date <= DATE '2024-01-07'
      |GROUP BY segment ORDER BY segment""".stripMargin

  /** s78: the s58 stats-aware join with EVERY recorded stat folded
    * from WRITE-TIME sidecars (r16 — the s76 pattern completed for the
    * histogram family, the last one that still cost a scan to
    * refresh): NDV/rows via [[Snapshots.withHll]] +
    * [[Analyze.analyzeFromSketches]] (manifest-scale job), the score
    * histogram via [[Snapshots.withQuantiles]] +
    * [[Analyze.histogramFromSketches]] (a pure DRIVER fold — zero
    * Spark jobs, zero data reads; the spec fences it). The folded
    * selectivity must still drive the strategy choice, and the joined
    * aggregate must equal DuckDB's plain filtered join — s58's oracle
    * verbatim. */
  def statsDfpHistSketchJoin(spark: SparkSession, dir: String): DataFrame = {
    val factT = freshTable("s78-fact-", dir)
    val dimT = freshTable("s78-dim-", dir)
    val ev = Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "event_type", "value", "event_date")
    Snapshots.commitAll(factT, Snapshots.stageWithStats(
      ev, factT, "event_date", "event_id"))
    val dim = ev.select(col("event_id").as("dim_id"),
      col("value").as("score"),
      concat(lit("seg-"), (col("event_id") % 5).cast("string")).as("segment"))
    Snapshots.commitAll(dimT, Snapshots.withQuantiles(
      Snapshots.withHll(
        Snapshots.stageWithStats(dim, dimT, "segment", "dim_id"),
        dimT, "dim_id", spark),
      dimT, "score", spark))
    Analyze.analyzeFromSketches(spark, dimT, Seq("dim_id"))
    Analyze.histogramFromSketches(dimT, "score", 16)
    statsAwareJoin(spark, factT, dimT, "event_id", "dim_id",
        "score", 0.0, 25.0, minFiles = 0)
      .groupBy("segment")
      .agg(count(lit(1)).as("n"), Exact.decSum(col("value")).as("sum_value"))
      .orderBy("segment")
  }

  /** s66: the OVER-CAP DFP join with the bloom row filter (r14) — the
    * dim's distinct keys (every 7th event id, far over the forced
    * 50-key cap) blow the IN list, file pruning degrades to the key
    * range (which keeps nearly every file of a dense-key fact), and
    * the bloom sketch is the only row-level cut before the join
    * exchange. The aggregate must equal DuckDB's plain join: bloom
    * errors are one-sided, the join stays the exact verdict. The
    * row-reduction receipt lives in the spec (this query pins
    * correctness). */
  def bloomDfpJoin(spark: SparkSession, dir: String): DataFrame = {
    val factT = freshTable("s66-fact-", dir)
    val ev = Tables(spark, dir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "event_type", "value", "event_date")
    Snapshots.commitAll(factT, Snapshots.stageWithStats(
      ev, factT, "event_date", "event_id"))
    val dim = ev.filter(col("event_id") % 7 === 0)
      .select(col("event_id").as("dim_id"),
        concat(lit("seg-"), (col("event_id") % 3).cast("string")).as("segment"))
      .distinct()
    // maxKeys = 50 forces the over-cap path on any SF; minFiles = 0
    // forces past the cost gate (s50's fixture-scale discipline)
    DynamicFilter.prunedJoin(spark, factT, dim, "event_id", "dim_id",
        maxKeys = 50, minFiles = 0, bloomKeys = 20000L)
      .groupBy("segment")
      .agg(count(lit(1)).as("n"), Exact.decSum(col("value")).as("sum_value"))
      .orderBy("segment")
  }

  lazy val bloomDfpJoinOracle: String =
    s"""WITH dim AS (
      |  SELECT DISTINCT event_id AS dim_id,
      |         'seg-' || CAST(event_id % 3 AS VARCHAR) AS segment
      |  FROM events WHERE event_id % 7 = 0)
      |SELECT segment, count(*) AS n,
      |       ${Exact.decSumSql("value")} AS sum_value
      |FROM events e JOIN dim d ON e.event_id = d.dim_id
      |GROUP BY segment ORDER BY segment""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("s50_dfp_join", dfpJoinOracle)(dfpJoin),
    QueryDef.sql("s58_stats_dfp_join", statsDfpJoinOracle)(statsDfpJoin),
    QueryDef.sql("s61_stats_dfp_date_join", statsDfpDateJoinOracle)(statsDfpDateJoin),
    QueryDef.sql("s78_stats_dfp_hist_sketches", statsDfpJoinOracle)(statsDfpHistSketchJoin),
    QueryDef.sql("s66_bloom_dfp_join", bloomDfpJoinOracle)(bloomDfpJoin))
}
