package graft.ops.gold

import graft.engine.{Exact, Graft, QueryDef, Tables}
import graft.ops.lake.{Analyze, Mutations, Snapshots}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STATS-DRIVEN MULTI-WAY JOIN ORDERING — the classic System-R
  * cost-based-optimizer decision applied to the engine's star joins:
  * given a lake fact inner-joined to several lake dims, recorded stats
  * alone (row counts + per-column NDV from [[Analyze.analyze]] — all
  * snapshot props, ZERO scan jobs) choose
  *
  *   1. the JOIN ORDER — most-reducing dim first, so every later join
  *      (and its shuffle, when one is needed) runs over the smallest
  *      possible intermediate. At 100 TB the difference between
  *      filtering a fact to 2% on the first join vs the last is the
  *      difference between shuffling 2 TB and shuffling 100 TB twice;
  *   2. per-dim BROADCAST — a dim whose recorded rows fit the budget
  *      replicates instead of shuffling the (possibly already-reduced)
  *      fact side.
  *
  * The retained-fraction estimate is the standard containment
  * assumption (Selinger et al. 1979; Spark's own CBO JoinReorderDP uses
  * the same form): an inner equi-join `fact.fk = dim.dk` keeps
  * `ndv_dim(dk) / ndv_fact(fk)` of the fact's rows, clamped to 1 —
  * every dim key matches its uniform share of the fact when dim keys
  * are a subset of the fact's key domain. It is an ESTIMATE: soundness
  * is never at stake because inner equi-joins commute — every order
  * returns identical rows (JoinOrderSpec pins it) — the stats choose
  * only the execution shape. Spark's built-in CBO cannot make this
  * choice here: it reads catalog statistics, and lake tables live
  * outside the session catalog; the recorded snapshot props are this
  * engine's equivalent, consumed the same way `statsAwareJoin` and
  * `Skew.strategyByStats` consume them.
  *
  * Staleness discipline matches the other consumers: stats more than
  * `maxStaleVersions` behind the live snapshot are no basis, and the
  * whole decision degrades to `None` (caller keeps the declared order,
  * plain joins + AQE — the pre-stats behavior). REORDERING is
  * restricted to INNER legs; LEFT legs (r15 — the reference's
  * flagship J1 is a left join) stay PINNED at their declared position
  * but still receive the stats-elected per-leg SHAPE
  * (broadcast/salt/plain), which changes the shuffle and never a row.
  */
object JoinOrder {

  /** An optional per-leg dim cut, `col ∈ [lo, hi]`, in the COLUMN's
    * own literal space (plain numbers; Date/LocalDate/ISO strings for
    * DATE; Timestamp/Instant/session-TZ strings for TIMESTAMP — the
    * same forms [[graft.ops.lake.DynamicFilter.statsAwareJoin]]
    * accepts). The filter cuts the dim BEFORE its join, and — when the
    * filter column carries a fresh recorded histogram — its estimated
    * selectivity feeds the leg ORDER: a huge dim cut to 2% by its
    * filter is often the most-reducing leg, which unfiltered NDV math
    * cannot see. */
  final case class LegFilter(col: String, lo: Any, hi: Any)

  /** One dim leg of a star join: `dimTable` joined on
    * `fact.factKey = dim.dimKey`, optionally cut by `filter` first.
    * `joinType` is `"inner"` (default — participates in the stats
    * ordering election) or `"left"`/`"left_outer"` (r15 — the
    * reference's flagship J1 shape: fact rows survive unmatched with
    * a NULL payload). LEFT legs never REORDER — they stay PINNED at
    * their declared position (a left leg commutes with inner legs
    * only under assumptions the stats cannot verify, so the engine
    * does not move it) — but they get the same stats-elected per-leg
    * SHAPE (broadcast/salt/plain) as inner legs: shape changes the
    * shuffle, never a row ([[Skew.saltedJoin]] is row-identical for
    * left joins by construction, SkewSpec pins it). */
  final case class Leg(dimTable: String, factKey: String, dimKey: String,
                       filter: Option[LegFilter] = None,
                       joinType: String = "inner") {
    private[gold] def isInner: Boolean = normalizedType == "inner"
    private[gold] def normalizedType: String =
      joinType.toLowerCase.replaceAll("_", "") match {
        case "inner" => "inner"
        case "left" | "leftouter" => "left"
        case other => throw new IllegalArgumentException(
          s"Leg($dimTable): joinType must be inner or left/left_outer, " +
            s"got '$other' — right/full legs would surface unmatched DIM " +
            "rows once per prior leg's fanout, a shape no star declares")
      }
    /** Spark's name for the leg's join type. */
    private[gold] def sparkType: String =
      if (isInner) "inner" else "left_outer"
  }

  /** The stats-planned execution of one leg. `selectivity` is the
    * estimated fraction of fact rows RETAINED by the leg's inner join
    * (containment assumption — see the object doc — times the leg
    * filter's histogram selectivity when one is declared); `dimRows`
    * is the estimated POST-FILTER dim row count, which is what the
    * broadcast budget verdict is about. `strategy` is the per-leg
    * shuffle shape, the [[Skew.strategyByStats]] trichotomy applied
    * inside the star:
    *
    *   - `"broadcast"` — post-filter dim rows fit the budget;
    *   - `"salt"` — the dim doesn't fit AND the fact key's recorded
    *     top-1 frequency ([[Analyze.frequentKeys]]) exceeds
    *     `skewFactor` × the uniform expectation: one key would wedge
    *     a shuffle partition even after AQE's split, so the leg
    *     pre-salts ([[Skew.saltedJoin]] — row-identical by
    *     construction);
    *   - `"plain"` — neither trigger; also the answer when frequency
    *     stats are absent or stale (salting is an OPPORTUNISTIC
    *     upgrade per leg, never a basis requirement — the ordering
    *     itself needs only NDV/rows). */
  final case class LegPlan(leg: Leg, selectivity: Double,
                           dimRows: Long, strategy: String) {
    def broadcast: Boolean = strategy == "broadcast"
  }

  /** Order `legs` by recorded stats: ascending estimated retained
    * fraction (most-reducing first), ties broken by smaller recorded
    * dim rows then table name so the plan is deterministic. Every
    * input is a snapshot prop — the decision runs ZERO scan jobs
    * (JoinOrderSpec fences it). `None` when any required stat is
    * absent or stale: no basis, the caller keeps its declared order.
    *
    * `histBounds` carries each FILTERED leg's bounds in HISTOGRAM
    * value space — (canonical column, lo, hi) as doubles, epoch
    * days/micros for temporal columns (the [[graft.ops.lake
    * .DynamicFilter.strategyForRange]] contract). [[statsOrderedJoin]]
    * derives it from the leg filters and the dim schemas; direct
    * callers with filtered legs must supply it (hand-converted), and
    * a filtered leg WITHOUT an entry fails loudly rather than
    * silently ordering as if unfiltered. A filtered leg additionally
    * requires a FRESH histogram on its filter column
    * ([[Analyze.histogramVersionOf]], same per-family staleness) —
    * absent/stale answers `None` like every other missing stat. */
  def orderByStats(factTable: String, legs: Seq[Leg],
                   broadcastMaxRows: Long = 1000000L,
                   maxStaleVersions: Long = 64,
                   histBounds: Map[Leg, (String, Double, Double)] = Map.empty,
                   skewFactor: Double = 4.0)
      : Option[Seq[LegPlan]] = {
    def fresh(table: String, v: Option[Long]): Boolean =
      v.exists(Snapshots.currentVersion(table) - _ <= maxStaleVersions)
    // fact-side props hoisted ONCE: every Analyze getter re-reads the
    // snapshot log (no driver cache), and an N-leg star was paying ~5N
    // redundant log reads through the per-leg salt verdict (r14 review
    // find); the verdict itself memoizes per distinct fact key
    lazy val factRows: Option[Long] = Analyze.rowsOf(factTable)
    val saltMemo = scala.collection.mutable.HashMap.empty[String, Boolean]
    // the opportunistic per-leg salt verdict (see LegPlan.strategy):
    // recorded key frequencies only, zero jobs, absent/stale → false
    def saltWorthwhile(factKey: String, factNdv: Long): Boolean =
      saltMemo.getOrElseUpdate(factKey, (for {
        _ <- Some(()).filter(_ => fresh(factTable,
          Analyze.freqVersionOf(factTable, factKey)))
        freq <- Analyze.frequentKeysOf(factTable, factKey)
        top <- freq.headOption.map(_._2)
        rows <- factRows
      } yield top.toDouble > skewFactor * (rows.toDouble / factNdv))
        .getOrElse(false))
    legs.foreach(_.normalizedType) // reject unsupported join types HERE
    legs.filter(_.filter.isDefined).foreach { leg =>
      require(histBounds.contains(leg),
        s"orderByStats(${leg.dimTable}): leg declares a filter on " +
          s"'${leg.filter.get.col}' but no histogram-space bounds were " +
          "supplied — call through statsOrderedJoin (which derives them " +
          "from the dim schema) or pass histBounds")
    }
    if (legs.isEmpty ||
        !fresh(factTable, Analyze.analyzedVersion(factTable))) return None
    val plans = legs.map { leg =>
      for {
        _ <- Some(()).filter(_ =>
          fresh(leg.dimTable, Analyze.analyzedVersion(leg.dimTable)))
        factNdv <- Analyze.ndvOf(factTable, leg.factKey)
        if factNdv > 0
        dimNdv <- Analyze.ndvOf(leg.dimTable, leg.dimKey)
        dimRows <- Analyze.rowsOf(leg.dimTable)
        filterSel <- histBounds.get(leg) match {
          case None => Some(1.0)
          case Some((fcol, lo, hi)) => for {
            _ <- Some(()).filter(_ => fresh(leg.dimTable,
              Analyze.histogramVersionOf(leg.dimTable, fcol)))
            s <- Analyze.rangeSelectivity(leg.dimTable, fcol, lo, hi)
          } yield s
        }
      } yield {
        val effRows = math.ceil(dimRows * filterSel).toLong
        val strategy =
          if (effRows <= broadcastMaxRows) "broadcast"
          else if (saltWorthwhile(leg.factKey, factNdv)) "salt"
          else "plain"
        // a LEFT leg retains every fact row by definition: its
        // containment estimate describes match coverage, not reduction
        val sel = if (leg.isInner)
          math.min(1.0, dimNdv.toDouble * filterSel / factNdv.toDouble)
        else 1.0
        LegPlan(leg, sel, effRows, strategy)
      }
    }
    // all legs or nothing: a partial order would silently interleave
    // planned and unplanned legs in a shape nobody declared
    if (plans.exists(_.isEmpty)) None
    else {
      val all = plans.flatten
      // election is INNER-only; LEFT legs stay PINNED at their declared
      // index and the elected inner legs fill the remaining slots in
      // stats order (see the Leg scaladoc for why left legs never move)
      val electedInner = all.filter(_.leg.isInner).sortBy(p =>
        (p.selectivity, p.dimRows, p.leg.dimTable)).iterator
      Some(all.map(p => if (p.leg.isInner) electedInner.next() else p))
    }
  }

  /** Inner-join `factTable` to every dim leg, in the order (and with
    * the per-dim broadcast hints) [[orderByStats]] chose; absent/stale
    * stats fall back to the DECLARED order with plain joins (+ AQE).
    * Join keys are matched by name — each leg's `dimKey` renames onto
    * its `factKey` ([[Skew.statsSkewJoin]]'s contract).
    *
    * Two contracts the stats must never be able to break (both review
    * finds):
    *
    *   - the OUTPUT SCHEMA is fixed by the DECLARATION — fact columns,
    *     then each leg's payload in declared-leg order — regardless of
    *     the fold order the stats chose. Without the closing
    *     projection, an ANALYZE (or stats going stale) would silently
    *     reorder the same query's columns under every positional
    *     consumer;
    *   - every OUTPUT column name must be unambiguous
    *     (case-insensitive). A dim payload column whose name the FACT
    *     already owns is DROPPED from that dim before the join (the
    *     fact's copy wins — the common case is the lake tag column,
    *     e.g. `day`, present on every snapshot table; rename upstream
    *     if both copies are needed). A payload name shared by TWO DIMS
    *     fails HERE with both owners named — never two operators later
    *     as AMBIGUOUS_REFERENCE; this also rejects duplicate legs.
    *     Missing keys and key-rename collisions fail with the same
    *     at-the-door discipline. */
  def statsOrderedJoin(spark: SparkSession, factTable: String,
                       legs: Seq[Leg],
                       broadcastMaxRows: Long = 1000000L,
                       maxStaleVersions: Long = 64,
                       salts: Int = 8,
                       skewFactor: Double = 4.0): DataFrame = {
    require(legs.nonEmpty, "statsOrderedJoin: at least one dim leg")
    legs.foreach(_.normalizedType) // unsupported join types fail HERE
    // duplicate legs rejected by TUPLE, not by payload-name collision:
    // two identical legs whose dim has no surviving payload column
    // (key-only, or all columns fact-owned) used to pass the owner
    // check and join twice — multiplying rows when the dim key is
    // non-unique (r14 advisor find)
    legs.groupBy(l =>
        (l.dimTable, l.factKey.toLowerCase, l.dimKey.toLowerCase))
      .foreach { case ((d, fk, dk), ls) =>
        require(ls.size == 1,
          s"statsOrderedJoin: leg ($d, $fk, $dk) is declared ${ls.size} " +
            "times — a dim joins a star once per key pair; drop the " +
            "duplicate (role-playing dims use distinct key pairs)")
      }
    val fact = Mutations.readMerged(spark, factTable, mergeSchema = true)
    legs.foreach { leg =>
      require(fact.columns.exists(_.equalsIgnoreCase(leg.factKey)),
        s"statsOrderedJoin($factTable): no column '${leg.factKey}' " +
          s"(fact has ${fact.columns.mkString(", ")})")
    }
    // every dim read + validated ONCE, up front, in declared order;
    // leg filters apply here (and their histogram-space bounds are
    // derived from the dim schema for the ordering — zero jobs, the
    // statsAwareJoin conversion)
    val bounds = scala.collection.mutable.HashMap
      .empty[Leg, (String, Double, Double)]
    val dims: Seq[(Leg, DataFrame, Seq[String])] = legs.map { leg =>
      val dimRaw = Mutations.readMerged(spark, leg.dimTable, mergeSchema = true)
      require(dimRaw.columns.exists(_.equalsIgnoreCase(leg.dimKey)),
        s"statsOrderedJoin(${leg.dimTable}): no column '${leg.dimKey}' " +
          s"(dim has ${dimRaw.columns.mkString(", ")})")
      require(leg.dimKey.equalsIgnoreCase(leg.factKey) ||
        !dimRaw.columns.exists(_.equalsIgnoreCase(leg.factKey)),
        s"statsOrderedJoin(${leg.dimTable}): dim already has a column " +
          s"named '${leg.factKey}' — renaming its key '${leg.dimKey}' " +
          "onto it would be ambiguous; rename one side first")
      val dim0 = leg.filter match {
        case None => dimRaw
        case Some(LegFilter(fc, lo, hi)) =>
          val (filtered, bs) = graft.ops.lake.DynamicFilter
            .resolveRangeFilter(spark, dimRaw, fc, lo, hi,
              s"statsOrderedJoin(${leg.dimTable})")
          bounds.update(leg, bs)
          filtered
      }
      val renamed = if (leg.dimKey == leg.factKey) dim0
        else dim0.withColumnRenamed(leg.dimKey, leg.factKey)
      val factOwned = fact.columns.map(_.toLowerCase).toSet
      val payload = renamed.columns.toSeq
        .filterNot(_.equalsIgnoreCase(leg.factKey))
        .filterNot(c => factOwned(c.toLowerCase))
      // project to key + surviving payload: fact-owned duplicates drop
      // HERE (narrower shuffle too), so the closing by-name select is
      // never ambiguous
      val dim = renamed.select((leg.factKey +: payload).map(renamed.col): _*)
      (leg, dim, payload)
    }
    val owner = scala.collection.mutable.HashMap.empty[String, String]
    dims.foreach { case (leg, _, payload) =>
      payload.foreach { c =>
        owner.put(c.toLowerCase, leg.dimTable).foreach { prev =>
          throw new IllegalArgumentException(
            s"statsOrderedJoin: column '$c' appears in both $prev and " +
              s"${leg.dimTable} — the star's output is selected by name, " +
              "so every payload column must be unambiguous; rename one side")
        }
      }
    }
    // `_salt` is reserved star-wide, unconditionally: whether a leg
    // actually salts depends on STATS, and a name that works with
    // stale stats but is clobbered (dim side) or shadowed (fact side)
    // once frequencies go fresh would break the "stats choose the
    // fold, never the schema" contract (r14 review find)
    (fact.columns.toSeq ++ dims.flatMap(_._3)).find(_.equalsIgnoreCase("_salt"))
      .foreach { c =>
        throw new IllegalArgumentException(
          s"statsOrderedJoin: column '$c' is reserved by the salted-leg " +
            "rewrite; rename it upstream")
      }
    val planned = orderByStats(factTable, legs, broadcastMaxRows,
      maxStaleVersions, bounds.toMap, skewFactor)
    val ordered: Seq[(Leg, String)] = planned match {
      case Some(ps) => ps.map(p => (p.leg, p.strategy))
      case None => legs.map(l => (l, "plain"))
    }
    val byLeg = dims.map { case (leg, dim, _) => leg -> dim }.toMap
    val joined = ordered.foldLeft(fact) { case (acc, (leg, strategy)) =>
      val dim = byLeg(leg)
      strategy match {
        case "broadcast" =>
          acc.join(broadcast(dim), Seq(leg.factKey), leg.sparkType)
        // per-row entropy for the salt (the Skew discipline: equal
        // KEYS must spread, so the key itself can never seed it);
        // '_salt' collisions were rejected star-wide above
        case "salt" => Skew.saltedJoin(acc, dim, leg.factKey,
          monotonically_increasing_id(), salts, leg.sparkType)
        case _ => acc.join(dim, Seq(leg.factKey), leg.sparkType)
      }
    }
    // the declaration-ordered projection: stats choose the fold, never
    // the schema
    joined.select((fact.columns.toSeq ++
      dims.flatMap(_._3)).map(joined.col): _*)
  }

  // ---- oracle-gated exercise ---------------------------------------

  private def freshTable(prefix: String, dir: String): String =
    Graft.freshDir(prefix + dir.replaceAll("[^A-Za-z0-9.]", "_"))

  /** Shared s64/s65 fixture: a fact with two join keys — `fk1` over
    * ~1000 values, `fk2` over 50 — a SELECTIVE dim covering only fk1 ∈
    * [0, 20) (recorded evidence: retained fraction ≈ 0.02) and a
    * NON-selective dim covering every fk2 (fraction 1.0). The recorded
    * stats must order the selective dim first; both dims fit the
    * broadcast budget, so the ordering itself is the decision under
    * test (the spec also exercises the shuffle shapes). */
  private def starFixture(spark: SparkSession, dir: String,
                          prefix: String,
                          dimARows: Long = 20): (String, String, String) = {
    val factT = freshTable(s"$prefix-fact-", dir)
    val dimAT = freshTable(s"$prefix-dima-", dir)
    val dimBT = freshTable(s"$prefix-dimb-", dir)
    val ev = Tables(spark, dir).events
      .withColumn("fk1", col("event_id") % 1000)
      .withColumn("fk2", col("event_id") % 50)
      .select("event_id", "fk1", "fk2", "value")
    Snapshots.commitAll(factT, Snapshots.stageWithStats(
      ev.withColumn("day", lit("d")), factT, "day", "fk1"))
    val dimA = spark.range(0, dimARows)
      .select(col("id").as("dk1"),
        concat(lit("band-"), (col("id") % 4).cast("string")).as("band"))
    Snapshots.commitAll(dimAT, Snapshots.stageWithStats(
      dimA.withColumn("day", lit("d")), dimAT, "day", "dk1"))
    val dimB = spark.range(0, 50)
      .select(col("id").as("dk2"),
        concat(lit("seg-"), (col("id") % 5).cast("string")).as("seg"))
    Snapshots.commitAll(dimBT, Snapshots.stageWithStats(
      dimB.withColumn("day", lit("d")), dimBT, "day", "dk2"))
    Analyze.analyze(spark, factT, Seq("fk1", "fk2"))
    Analyze.analyze(spark, dimAT, Seq("dk1"))
    Analyze.analyze(spark, dimBT, Seq("dk2"))
    (factT, dimAT, dimBT)
  }

  /** The ONE oracle template behind s64/s65/s68 — the fixtures differ
    * only in dimA's key range and dimB's cut. */
  private def starOracleSql(dimARange: Int, dbWhere: String): String =
    s"""WITH f AS (
      |  SELECT event_id % 1000 AS fk1, event_id % 50 AS fk2, value
      |  FROM events),
      |da AS (
      |  SELECT i AS dk1, 'band-' || CAST(i % 4 AS VARCHAR) AS band
      |  FROM (SELECT unnest(range(0, $dimARange)) AS i)),
      |db AS (
      |  SELECT i AS dk2, 'seg-' || CAST(i % 5 AS VARCHAR) AS seg
      |  FROM (SELECT unnest(range(0, 50)) AS i)$dbWhere)
      |SELECT band, seg, count(*) AS n,
      |       ${Exact.decSumSql("f.value")} AS sum_value
      |FROM f JOIN da ON f.fk1 = da.dk1 JOIN db ON f.fk2 = db.dk2
      |GROUP BY band, seg ORDER BY band, seg""".stripMargin

  /** s64: the stats-ordered star join under the oracle gate — recorded
    * NDVs put the 2%-selective dim first (the spec fences the decision
    * at zero scan jobs and pins the order); the result must equal
    * DuckDB's plain two-dim join in any order: ordering changes the
    * shuffle shape, never a row. */
  def statsOrderedJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val (factT, dimAT, dimBT) = starFixture(spark, dir, "s64")
    statsOrderedJoin(spark, factT,
        Seq(Leg(dimBT, "fk2", "dk2"), Leg(dimAT, "fk1", "dk1")))
      .groupBy("band", "seg")
      .agg(count(lit(1)).as("n"), Exact.decSum(col("value")).as("sum_value"))
      .orderBy("band", "seg")
  }

  lazy val statsOrderedJoinOracle: String = starOracleSql(20, "")

  /** s65: the same stats-ordered star join through PLAIN SQL — the
    * `stats_star_join` table function ([[graft.sql.LakeSql
    * .statsStarJoinPlan]]) gives `spark.sql` users the identical
    * recorded-stats order/broadcast chain (the "two front doors"
    * discipline — every API-only capability earns its SQL twin).
    * Same fixture, same oracle restatement. */
  def statsOrderedJoinSql(spark: SparkSession, dir: String): DataFrame = {
    val (factT, dimAT, dimBT) = starFixture(spark, dir, "s65")
    graft.sql.LakeSql.register(spark, "s65f", factT, "day")
    graft.sql.LakeSql.register(spark, "s65da", dimAT, "day")
    graft.sql.LakeSql.register(spark, "s65db", dimBT, "day")
    spark.sql(
      s"""SELECT band, seg, count(*) AS n,
         |  ${Exact.decSumSql("value")} AS sum_value
         |FROM stats_star_join('s65f', 's65db', 'fk2', 'dk2',
         |                     's65da', 'fk1', 'dk1')
         |GROUP BY band, seg ORDER BY band, seg""".stripMargin)
  }

  /** s68: FILTERED-leg ordering under the oracle gate — dimA covers
    * 20% of fk1 (retained fraction 0.2 unfiltered), dimB covers every
    * fk2 value (1.0 unfiltered — the last pick by bare NDV math) but
    * arrives cut to dk2 ∈ [0, 4]; the recorded histogram prices that
    * cut at ~10%, so the FILTERED leg orders first (the spec pins the
    * flip and fences the decision at zero jobs). The joined aggregate
    * must equal DuckDB's order-free filtered join. */
  def statsFilteredStarQuery(spark: SparkSession, dir: String): DataFrame = {
    val (factT, dimAT, dimBT) = starFixture(spark, dir, "s68", dimARows = 200)
    Analyze.histogram(spark, dimBT, "dk2", 10)
    statsOrderedJoin(spark, factT,
        Seq(Leg(dimAT, "fk1", "dk1"),
          Leg(dimBT, "fk2", "dk2", Some(LegFilter("dk2", 0, 4)))))
      .groupBy("band", "seg")
      .agg(count(lit(1)).as("n"), Exact.decSum(col("value")).as("sum_value"))
      .orderBy("band", "seg")
  }

  lazy val statsFilteredStarOracle: String =
    starOracleSql(200, " WHERE i BETWEEN 0 AND 4")

  /** s69: the CBO pieces COMPOSED — a star whose legs get three
    * different shuffle shapes from recorded stats alone: the small dim
    * broadcasts, and the big dim rides a pre-salted exchange because
    * the fact key's recorded top-1 frequency says one key would wedge
    * a shuffle partition (the s62 evidence, now per-leg inside the
    * ordered fold). Every strategy is row-identical by construction;
    * the joined aggregate must equal DuckDB's plain two-dim join. */
  def statsSkewStarQuery(spark: SparkSession, dir: String): DataFrame = {
    val factT = freshTable("s69-fact-", dir)
    val dimUT = freshTable("s69-dimu-", dir)
    val dimST = freshTable("s69-dims-", dir)
    val ev = Tables(spark, dir).events
      .withColumn("k1", col("event_id") % 100)
      .withColumn("sk",
        when(col("event_id") % 100 < 90, col("event_id") % 10)
          .otherwise(col("event_id") % 5000))
      .select("event_id", "k1", "sk", "value")
    Snapshots.commitAll(factT, Snapshots.stageWithStats(
      ev.withColumn("day", lit("d")), factT, "day", "sk"))
    val dimU = spark.range(0, 100)
      .select(col("id").as("dk1"),
        concat(lit("g"), (col("id") % 4).cast("string")).as("grp"))
    Snapshots.commitAll(dimUT, Snapshots.stageWithStats(
      dimU.withColumn("day", lit("d")), dimUT, "day", "dk1"))
    val dimS = spark.range(0, 5000)
      .select(col("id").as("dk2"),
        concat(lit("seg-"), (col("id") % 7).cast("string")).as("segment"))
    Snapshots.commitAll(dimST, Snapshots.stageWithStats(
      dimS.withColumn("day", lit("d")), dimST, "day", "dk2"))
    Analyze.analyze(spark, factT, Seq("k1", "sk"))
    Analyze.frequentKeys(spark, factT, "sk", k = 16)
    Analyze.analyze(spark, dimUT, Seq("dk1"))
    Analyze.analyze(spark, dimST, Seq("dk2"))
    statsOrderedJoin(spark, factT,
        Seq(Leg(dimUT, "k1", "dk1"), Leg(dimST, "sk", "dk2")),
        broadcastMaxRows = 1000)
      .groupBy("grp", "segment")
      .agg(count(lit(1)).as("n"), Exact.decSum(col("value")).as("sum_value"))
      .orderBy("grp", "segment")
  }

  lazy val statsSkewStarOracle: String =
    s"""WITH f AS (
      |  SELECT event_id % 100 AS k1,
      |         CASE WHEN event_id % 100 < 90 THEN event_id % 10
      |              ELSE event_id % 5000 END AS sk, value
      |  FROM events),
      |du AS (
      |  SELECT i AS dk1, 'g' || CAST(i % 4 AS VARCHAR) AS grp
      |  FROM (SELECT unnest(range(0, 100)) AS i)),
      |ds AS (
      |  SELECT i AS dk2, 'seg-' || CAST(i % 7 AS VARCHAR) AS segment
      |  FROM (SELECT unnest(range(0, 5000)) AS i))
      |SELECT grp, segment, count(*) AS n,
      |       ${Exact.decSumSql("f.value")} AS sum_value
      |FROM f JOIN du ON f.k1 = du.dk1 JOIN ds ON f.sk = ds.dk2
      |GROUP BY grp, segment ORDER BY grp, segment""".stripMargin

  /** s72: a LEFT leg inside the stats-ordered star (r15) — the
    * reference's flagship J1 shape (fact ⟕ dim) finally under the CBO
    * machinery: the star declares an inner dimB leg and a LEFT dimA
    * leg covering only 2% of fk1's domain, with a broadcast budget
    * (30) sized so the stats elect BROADCAST for the left leg and
    * plain for the inner one. The left leg stays pinned at its
    * declared position (the spec fences both the pin and the
    * zero-job decision); unmatched fact rows surface with a NULL
    * `band`, which the DuckDB LEFT JOIN restates. */
  def statsLeftStarQuery(spark: SparkSession, dir: String): DataFrame = {
    val (factT, dimAT, dimBT) = starFixture(spark, dir, "s72")
    statsOrderedJoin(spark, factT,
        Seq(Leg(dimBT, "fk2", "dk2"),
          Leg(dimAT, "fk1", "dk1", joinType = "left")),
        broadcastMaxRows = 30)
      .groupBy("band", "seg")
      .agg(count(lit(1)).as("n"), Exact.decSum(col("value")).as("sum_value"))
      .orderBy("band", "seg")
  }

  lazy val statsLeftStarOracle: String =
    s"""WITH f AS (
      |  SELECT event_id % 1000 AS fk1, event_id % 50 AS fk2, value
      |  FROM events),
      |da AS (
      |  SELECT i AS dk1, 'band-' || CAST(i % 4 AS VARCHAR) AS band
      |  FROM (SELECT unnest(range(0, 20)) AS i)),
      |db AS (
      |  SELECT i AS dk2, 'seg-' || CAST(i % 5 AS VARCHAR) AS seg
      |  FROM (SELECT unnest(range(0, 50)) AS i))
      |SELECT band, seg, count(*) AS n,
      |       ${Exact.decSumSql("f.value")} AS sum_value
      |FROM f JOIN db ON f.fk2 = db.dk2 LEFT JOIN da ON f.fk1 = da.dk1
      |GROUP BY band, seg ORDER BY band, seg""".stripMargin

  /** s72b: the LEFT leg through PLAIN SQL (r15) — the `left:` dim-name
    * marker on the `stats_star_join` TVF; same fixture and oracle as
    * [[statsLeftStarQuery]] (the two-front-doors discipline). */
  def statsLeftStarSql(spark: SparkSession, dir: String): DataFrame = {
    val (factT, dimAT, dimBT) = starFixture(spark, dir, "s72b")
    graft.sql.LakeSql.register(spark, "s72bf", factT, "day")
    graft.sql.LakeSql.register(spark, "s72bda", dimAT, "day")
    graft.sql.LakeSql.register(spark, "s72bdb", dimBT, "day")
    spark.sql(
      s"""SELECT band, seg, count(*) AS n,
         |  ${Exact.decSumSql("value")} AS sum_value
         |FROM stats_star_join('s72bf', 's72bdb', 'fk2', 'dk2',
         |                     'left:s72bda', 'fk1', 'dk1', 30)
         |GROUP BY band, seg ORDER BY band, seg""".stripMargin)
  }

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("s64_stats_ordered_join", statsOrderedJoinOracle)(statsOrderedJoinQuery),
    QueryDef.sql("s72_stats_left_star", statsLeftStarOracle)(statsLeftStarQuery),
    QueryDef.sql("s72b_stats_left_star_sql", statsLeftStarOracle)(statsLeftStarSql),
    QueryDef.sql("s65_stats_ordered_join_sql", statsOrderedJoinOracle)(statsOrderedJoinSql),
    QueryDef.sql("s68_stats_filtered_star", statsFilteredStarOracle)(statsFilteredStarQuery),
    QueryDef.sql("s69_stats_skew_star", statsSkewStarOracle)(statsSkewStarQuery))
}
