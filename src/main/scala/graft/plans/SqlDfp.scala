package graft.plans

import org.apache.spark.sql.{GraftFileIndex, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, max, min}

/** DYNAMIC FILE PRUNING on the SQL surface (r14) — the planner-rule twin
  * of [[graft.ops.lake.DynamicFilter.prunedJoin]], closing the gap
  * between the engine's two front doors: a `spark.sql` inner/left-semi
  * equi-join of a registered lake FACT to a selective dim used to scan
  * every fact file that static literal pruning kept, because the dim's
  * key set exists only at run time and no API call was there to collect
  * it. This rule detects the shape during optimization, collects the
  * dim side's distinct join keys (capped), and plants the key predicate
  * as an ordinary `Filter` on the fact side — from where Spark's OWN
  * machinery finishes the job:
  *
  *   - scan planning pushes the filter to [[GraftFileIndex.listFiles]],
  *     whose [[graft.ops.lake.Pruning.compile]] translation (the same
  *     one static SQL filters ride) turns the IN list into manifest
  *     min/max + bloom + tag pruning — files that provably hold no dim
  *     key never open;
  *   - the surviving scan gets the same predicate as a parquet
  *     row-group filter, pruning inside opened files;
  *   - over the key cap, the predicate degrades to the two-scalar
  *     key RANGE (min/max of the dim keys) — coarser, still sound,
  *     never an unbounded driver collect.
  *
  * Soundness: the planted filter drops only fact rows whose key is
  * provably absent from the dim side — rows an inner/left-semi
  * equi-join was about to drop anyway (NULL keys match nothing, so
  * `na.drop` on the collected keys is exact). Cardinalities of
  * surviving rows are untouched. Outer joins never match (they must
  * surface unmatched fact rows).
  *
  * Cost model (the same discipline as the API path's gate): the fact
  * must be a lake relation with ≥ `spark.graft.dfp.sql.minFiles`
  * manifest entries (the free driver-resident count), and the dim side
  * must show selectivity evidence (a Filter/Aggregate/limit/local
  * relation somewhere) — an unfiltered table scan on the dim side
  * collects nothing. The dim subtree is executed ONCE here to collect
  * keys (it runs again as the join's build side — the price every
  * runtime-filter scheme pays once per query; Spark's own
  * InjectRuntimeFilter makes the same trade). The collect happens at
  * OPTIMIZATION time, so `.explain()` on a qualifying plan also runs
  * it — documented, and switchable off per session
  * (`spark.graft.dfp.sql.enabled = false`).
  *
  * CONSISTENCY CONTRACT (r14 review find, second pass): the planted
  * keys are a snapshot of the dim AT OPTIMIZATION time. The lake FACT
  * side is immutable-snapshot-backed, but a MUTABLE dim source (JDBC,
  * a rewritten parquet dir) that changes between optimization and a
  * LATER re-execution of the same retained Dataset can hold keys the
  * planted filter no longer admits — under-matching, the same
  * consistency model Spark applies to any twice-scanned mutable
  * source (a plain self-join of a JDBC table has no snapshot
  * guarantee either, and execution-time re-collection could not reach
  * `listFiles`, which runs at planning). Re-create the frame after
  * mutating a dim source, or join through the API path
  * ([[graft.ops.lake.DynamicFilter.prunedJoin]]), whose persisted dim
  * pins one evaluation for both the collect and the build side.
  *
  * Guards, each load-bearing:
  *   - equi-key attributes must be DIRECT outputs of the fact's lake
  *     relation (no alias indirection) — otherwise the filter cannot
  *     reach `listFiles` and the collect would buy nothing;
  *   - both join sides batch (not streaming), dim side fully
  *     deterministic — a nondeterministic dim evaluated twice could
  *     yield a key set that disagrees with the join's build side,
  *     turning the prune unsound;
  *   - the rewritten Join is tagged so a re-entrant optimization pass
  *     (a cached Dataset reused inside a larger query) never collects
  *     twice.
  *
  * Registered via `injectPreCBORule`: the batch runs ONCE per
  * optimization, after operator optimization (static filters are
  * already pushed, so the dim's own scan is already manifest-pruned
  * when the key collect runs) and before join reordering.
  *
  * Ref analog: none — the reference joins materialized pandas frames
  * (`build_fact_fee_tax.py`); runtime file pruning has no counterpart
  * there. Shape follows the public Databricks DFP description and
  * Spark's own DPP/runtime-filter split, re-expressed over the graft
  * manifest. */
object SqlDfp {

  /** Marks a Join this rule already REWROTE, making the rewrite
    * idempotent if the SAME tree ever re-enters the batch. Scope
    * honesty (r14 review find, second pass): the optimizer works on a
    * CLONE of the Dataset's analyzed plan, so this tag never reaches
    * the original analyzed nodes — a NEW enclosing query that embeds
    * the Dataset's analyzed join re-enters the rule and pays one fresh
    * key collect per compile — unless the dim is LAKE-backed, where
    * the engine-static memo (r15, see [[SqlDfp.memo]]) serves
    * the learned keys back with zero jobs: canonical plan equality
    * pins the dim's snapshot VERSION through the cached file-index
    * instance, so the memo never extends the keys-at-optimization
    * staleness window (a dim commit misses it and re-collects);
    * non-lake dims have no version to key on and keep the
    * per-compile collect. Joins the
    * rule merely SKIPPED are deliberately left untagged: their guards
    * are zero-job driver checks, and a sticky tag would freeze a skip
    * decision past a later conf change (r14 review find — a user
    * lowering the cost gate would find pruning permanently disabled
    * on reused Datasets). */
  private[graft] val Applied = TreeNodeTag[Boolean]("graft.sql.dfp.applied")

  /** Counts dim-side distinct key COLLECT jobs this rule has run —
    * the spec-pinnable receipt that the recorded-stats "range" verdict
    * actually skips the collect (the footerReads-counter discipline). */
  private[graft] val keyCollects = new java.util.concurrent.atomic.AtomicInteger(0)

  /** What a dim-side key collect LEARNED — decoupled from the fact
    * attribute it will filter, so the result can be MEMOIZED across
    * compiles (r15) and re-bound to each compile's own fact attr. */
  private[plans] sealed trait Learned
  private[plans] case class LearnedKeys(vals: Seq[Any]) extends Learned
  private[plans] case class LearnedRange(lo: Any, hi: Any,
      sketch: Option[Array[Byte]]) extends Learned
  private[plans] case object LearnedEmpty extends Learned

  /** Memoized key collects for LAKE-BACKED dims (r15, the r14 verdict
    * item): a NEW compile of the identical query text used to pay a
    * fresh collect per compile — the documented cost model, but pure
    * waste when the dim is an immutable lake SNAPSHOT. Entries key on
    * a CONTENT digest, never on retained objects (r15 review find — a
    * stored `LogicalPlan` pins its SparkSession and file index long
    * past session close): SHA-256 over (a) the dim's manifest entry
    * paths — the SNAPSHOT pin; a dim commit changes the file set, so
    * the digest misses and the collect re-runs, the staleness window
    * the r14 doc worried about never opens — and (b) the canonicalized
    * dim subtree's untruncated treeString — exprIds normalized, so two
    * compiles of identical text digest identically, while any filter/
    * projection/schema difference (or a subquery, whose plan ids don't
    * normalize) changes the string and safely misses. The
    * session-varying knobs (cap, bloomKeys) and the key's output
    * position complete the key. Non-lake dims (temp views, JDBC) have
    * no manifest to pin and keep the per-compile collect.
    *
    * ENGINE-STATIC, not rule-instance state: Spark assembles the
    * pre-CBO batch per optimization, so a `SqlDfpRule` field would die
    * with every compile (measured r15 — the second compile saw an
    * empty memo). JVM-wide sharing across sessions is sound for the
    * same reason Spark's own CacheManager substitutes plan-equal
    * frames JVM-wide: the digest pins the CONTENT. Bounded FIFO; an
    * evicted entry just re-collects — correctness-neutral. */
  private[plans] case class MemoEntry(digest: String, keyPos: Int,
      cap: Int, bloomKeys: Long, learned: Learned)
  private[plans] val memo = new scala.collection.mutable.ArrayDeque[MemoEntry]
  private[plans] val MemoMax = 32

  /** The content digest above; `None` (→ no memo, plain collect) if
    * anything in the digest path throws. */
  private[graft] def memoDigest(dimPlan: LogicalPlan,
                                g: GraftFileIndex): Option[String] =
    scala.util.Try {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      md.update(g.tablePath.getBytes(utf8)); md.update(0.toByte)
      g.manifestEntries.foreach { e =>
        md.update(e.rel.getBytes(utf8)); md.update(0.toByte)
        // entry PROPS are part of the content identity (r15 advisor):
        // a deleteWhere keeps every rel and only adds a DV ref prop, so
        // a rel-only digest would serve the pre-delete key set to a
        // post-delete read (or vice versa after RESTORE) if any future
        // read path ever applied DVs inside the scan instead of as a
        // plan-level anti-join. Hashing the props makes the safety
        // explicit instead of resting on that plan-shape invariant.
        e.props.toSeq.sortBy(_._1).foreach { case (k, pv) =>
          md.update(k.getBytes(utf8)); md.update(0.toByte)
          md.update(pv.getBytes(utf8)); md.update(0.toByte)
        }
      }
      md.update(dimPlan.canonicalized.treeString(verbose = true,
        addSuffix = false, maxFields = Int.MaxValue,
        printOperatorId = false).getBytes(utf8))
      java.util.Base64.getEncoder.encodeToString(md.digest())
    }.toOption

  val EnabledKey = "spark.graft.dfp.sql.enabled"
  val MinFilesKey = "spark.graft.dfp.sql.minFiles"
  val MaxKeysKey = "spark.graft.dfp.sql.maxKeys"

  /** > 0 enables the over-cap BLOOM conjunct (r14, the prunedJoin
    * `bloomKeys` twin): where the IN list could not fit, the planted
    * range predicate additionally carries
    * `might_contain(sketch, xxhash64(key))` — the sketch is folded
    * into the SAME single agg as the min/max (no extra dim pass), and
    * the fact scan then drops non-matching ROWS before the join
    * exchange, not just non-matching files. Sound here without a type
    * gate: the rule only rewrites equi pairs whose attribute types are
    * identical, so both sides hash the same physical type. The value
    * is the expected distinct-key count and sizes the sketch. */
  val BloomKeysKey = "spark.graft.dfp.sql.bloomKeys"

  /** The lake scan a join side bottoms out at, reachable through
    * Project/Filter (and any leftover alias) nodes only — shapes where
    * a Filter planted ABOVE the side still pushes to the scan. */
  private[plans] def lakeScan(side: LogicalPlan): Option[(LogicalRelation, GraftFileIndex)] =
    side match {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location match {
          case g: GraftFileIndex => Some((lr, g))
          case _ => None
        }
        case _ => None
      }
      case Project(_, child) => lakeScan(child)
      case Filter(_, child) => lakeScan(child)
      case SubqueryAlias(_, child) => lakeScan(child)
      case _ => None
    }

  /** Selectivity evidence: some node that plausibly cuts the dim below
    * its base cardinality. An unfiltered scan collects nothing — and a
    * Filter made ONLY of IsNotNull conjuncts doesn't count: Spark's
    * constraint inference plants `isnotnull(key)` on BOTH sides of
    * every inner equi-join, so trusting it would make a bare fact-fact
    * self-join look selective and collect the entire key space (caught
    * by the spec's self-join fence). */
  private[plans] def selective(p: LogicalPlan): Boolean = p.collectFirst {
    case Filter(cond, _) if splitCond(cond).exists {
      case IsNotNull(_) => false
      case _ => true
    } => ()
    case _: Aggregate => ()
    case _: Distinct => ()
    case _: Deduplicate => ()
    case _: GlobalLimit => ()
    case _: LocalRelation => ()
    case _: OneRowRelation => ()
    // a SMALL cached frame: materialized and bounded — collecting its
    // keys reads the cache, the cheapest dim there is. Reached more
    // often than it looks: Spark's CacheManager substitutes by
    // CANONICAL plan equality JVM-wide, so a dim that is plan-equal to
    // anything persisted elsewhere (even by another session) arrives
    // here as InMemoryRelation, not the LocalRelation/Filter shape the
    // query text suggests (r14 flake find — the rule silently declined
    // whenever an equal plan happened to be cached). SIZE-GATED at the
    // broadcast threshold: caching alone says nothing about
    // selectivity, and an unfiltered 10⁸-row cached dim must not
    // trigger a full-dim collect at every compile (r14 review find) —
    // under the broadcast budget the collect costs what a broadcast
    // build would anyway.
    case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation
      // SIZE is the gate, alone: the collect's cost scales with bytes
      // scanned, and a row-count disjunct let a 900k-row × 5 KB cached
      // dim (~4.5 GB) count as "selective" and pay a multi-GB distinct
      // at every compile (r14 review find, second pass)
      if imr.computeStats().sizeInBytes <=
        org.apache.spark.sql.internal.SQLConf.get
          .autoBroadcastJoinThreshold.max(10L * 1024 * 1024) => ()
  }.isDefined

  private def splitCond(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitCond(l) ++ splitCond(r)
    case other => Seq(other)
  }

  private[plans] def deterministicTree(p: LogicalPlan): Boolean =
    !p.exists(n => n.expressions.exists(e => e.exists(!_.deterministic)))
}

case class SqlDfpRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {
  import SqlDfp._

  // malformed conf values fail LOUDLY (the engine's discipline — a
  // swallowed typo would silently restore the default and the user's
  // setting would appear to do nothing, r14 review find)
  private def confBool(k: String, d: Boolean): Boolean = {
    val v = spark.conf.get(k, d.toString)
    v.toBooleanOption.getOrElse(throw new IllegalArgumentException(
      s"$k must be true/false, got '$v'"))
  }
  private def confInt(k: String, d: Int): Int = {
    val v = spark.conf.get(k, d.toString)
    v.toIntOption.getOrElse(throw new IllegalArgumentException(
      s"$k must be an integer, got '$v'"))
  }
  private def confLong(k: String, d: Long): Long = {
    val v = spark.conf.get(k, d.toString)
    v.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"$k must be an integer, got '$v'"))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!confBool(EnabledKey, d = true)) return plan
    val minFiles = confInt(MinFilesKey,
      graft.ops.lake.DynamicFilter.DefaultMinFiles)
    val maxKeys = confInt(MaxKeysKey, 10000)
    val bloomKeys = confLong(BloomKeysKey, 0L)
    plan.transformUp {
      case j @ Join(_, _, jt, Some(_), _)
          if (jt == Inner || jt == LeftSemi) &&
            !j.getTagValue(Applied).contains(true) &&
            !j.left.isStreaming && !j.right.isStreaming =>
        rewrite(j, minFiles, maxKeys, bloomKeys) match {
          case Some(out) =>
            // the collect ran: mark BOTH the original analyzed node
            // (shared by reference with any enclosing query's plan)
            // and the rewritten copy, so neither path re-collects
            j.setTagValue(Applied, true)
            out.setTagValue(Applied, true)
            out
          case None => j // skipped: guards are zero-job, stay re-checkable
        }
    }
  }

  private def rewrite(j: Join, minFiles: Int, maxKeys: Int,
                      bloomKeys: Long): Option[Join] = {
    val pairs = splitConjunctivePredicates(j.condition.get).collect {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if j.left.outputSet.contains(a) && j.right.outputSet.contains(b) =>
        (a, b)
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if j.left.outputSet.contains(a) && j.right.outputSet.contains(b) =>
        (a, b)
    }.filter { case (a, b) => a.dataType == b.dataType }
    // each equi pair nominates two (fact, dim) orientations; keep the
    // ones whose fact side is a big-enough lake scan exposing the key
    // directly, with a selective deterministic dim opposite
    val candidates = pairs.flatMap { case (la, ra) =>
      Seq((la, j.left, ra, j.right, true), (ra, j.right, la, j.left, false))
    }.flatMap { case (fa, fside, da, dside, factIsLeft) =>
      lakeScan(fside).collect {
        case (lr, g) if g.manifestEntries.size >= minFiles &&
            lr.outputSet.contains(fa) && selective(dside) &&
            deterministicTree(dside) =>
          (fa, da, dside, factIsLeft, g.manifestEntries.size)
      }
    }
    // largest fact wins (the side with the most files to save); ties
    // keep the first equi pair's orientation
    candidates.sortBy(-_._5).headOption.map {
      case (fa, da, dside, factIsLeft, _) =>
        // recorded-stats pre-choice (r14, the statsAwareJoin chain on
        // the SQL surface): when the dim is itself an ANALYZEd lake
        // table cut by a range on a histogrammed column, NDV ×
        // histogram selectivity can prove the key collect hopeless
        // BEFORE running it — cap 0 sends keyPredicate straight to the
        // two-scalar range agg (one job instead of distinct + collect +
        // agg). Only the histogram-backed estimate may skip: bare
        // table-level NDV cannot see the dim filter's selectivity, and
        // forfeiting a fitting IN-list costs more than a wasted collect
        val cap = if (statsSayHopeless(dside, da, maxKeys)) 0 else maxKeys
        val pruneExpr = keyPredicate(dside, da, fa, cap, bloomKeys)
        if (factIsLeft) j.copy(left = Filter(pruneExpr, j.left))
        else j.copy(right = Filter(pruneExpr, j.right))
    }
  }

  /** True when recorded stats PROVE the dim side's post-filter distinct
    * key count exceeds `maxKeys` — via
    * [[graft.ops.lake.DynamicFilter.strategyForRange]] over the dim
    * lake table's recorded NDV and histogram, fed by both-sided range
    * (or equality) conjuncts on DIRECT dim columns found in the side's
    * Filters. Catalyst literal internals for DATE (epoch days) and
    * TIMESTAMP (epoch micros) are ALREADY the histogram value space, so
    * no conversion ambiguity exists here. Zero jobs; any doubt
    * (no stats, stale stats, unbounded predicate) answers false and the
    * collect runs — the pre-stats behavior. */
  private def statsSayHopeless(dside: LogicalPlan,
                               dimKey: AttributeReference,
                               maxKeys: Int): Boolean =
    scala.util.Try {
      lakeScan(dside) match {
        case Some((dlr, dg)) =>
          import org.apache.spark.sql.types._
          def histVal(l: Literal): Option[Double] = (l.dataType, l.value) match {
            case (_, null) => None
            case (DateType, v: java.lang.Integer) => Some(v.toDouble)
            case (TimestampType, v: java.lang.Long) => Some(v.toDouble)
            case (_: NumericType, d: org.apache.spark.sql.types.Decimal) =>
              Some(d.toDouble)
            case (_: NumericType, n: java.lang.Number) => Some(n.doubleValue())
            case _ => None
          }
          // strict bounds (>, <) are folded as their inclusive twins:
          // the histogram cannot resolve below bucket grain anyway, so
          // the estimate inflates by at most one boundary-bucket
          // fraction per side — always sound (a too-big estimate only
          // degrades a fitting IN list to the coarser range prune)
          val lo = scala.collection.mutable.HashMap.empty[String, Double]
          val hi = scala.collection.mutable.HashMap.empty[String, Double]
          def addLo(a: AttributeReference, v: Double): Unit =
            if (dlr.outputSet.contains(a))
              lo.update(a.name, math.max(lo.getOrElse(a.name, v), v))
          def addHi(a: AttributeReference, v: Double): Unit =
            if (dlr.outputSet.contains(a))
              hi.update(a.name, math.min(hi.getOrElse(a.name, v), v))
          dside.collect { case Filter(c, _) =>
            splitConjunctivePredicates(c) }.flatten.foreach {
            case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
              histVal(l).foreach(addLo(a, _))
            case GreaterThan(a: AttributeReference, l: Literal) =>
              histVal(l).foreach(addLo(a, _))
            case LessThanOrEqual(a: AttributeReference, l: Literal) =>
              histVal(l).foreach(addHi(a, _))
            case LessThan(a: AttributeReference, l: Literal) =>
              histVal(l).foreach(addHi(a, _))
            case EqualTo(a: AttributeReference, l: Literal) =>
              histVal(l).foreach { v => addLo(a, v); addHi(a, v) }
            case LessThanOrEqual(l: Literal, a: AttributeReference) =>
              histVal(l).foreach(addLo(a, _))
            case LessThan(l: Literal, a: AttributeReference) =>
              histVal(l).foreach(addLo(a, _))
            case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
              histVal(l).foreach(addHi(a, _))
            case GreaterThan(l: Literal, a: AttributeReference) =>
              histVal(l).foreach(addHi(a, _))
            case EqualTo(l: Literal, a: AttributeReference) =>
              histVal(l).foreach { v => addLo(a, v); addHi(a, v) }
            case _ =>
          }
          lo.keySet.intersect(hi.keySet).exists { c =>
            graft.ops.lake.DynamicFilter.strategyForRange(
              dg.tablePath, dimKey.name, c, lo(c), hi(c), maxKeys)
              .contains("range")
          }
        case None => false
      }
    }.getOrElse(false)

  private def learnedFor(dimPlan: LogicalPlan, dimKey: AttributeReference,
                         maxKeys: Int, bloomKeys: Long): Learned = {
    val keyPos = dimPlan.output.indexWhere(_.exprId == dimKey.exprId)
    val digest = lakeScan(dimPlan).filter(_ => keyPos >= 0)
      .flatMap { case (_, g) => memoDigest(dimPlan, g) }
    digest match {
      case None => collectLearned(dimPlan, dimKey, maxKeys, bloomKeys)
      case Some(d) =>
        memo.synchronized {
          memo.find(e => e.digest == d && e.keyPos == keyPos &&
            e.cap == maxKeys && e.bloomKeys == bloomKeys)
        } match {
          case Some(hit) => hit.learned
          case None =>
            val learned = collectLearned(dimPlan, dimKey, maxKeys, bloomKeys)
            memo.synchronized {
              memo.append(MemoEntry(d, keyPos, maxKeys, bloomKeys, learned))
              while (memo.size > MemoMax) { memo.removeHead(); () }
            }
            learned
        }
    }
  }

  /** Collect the dim side's distinct keys (cap + 1): the full list
    * within the cap, the two-scalar min/max range (+ optional bloom
    * sketch, folded into the SAME agg) beyond it, `LearnedEmpty` for
    * an empty dim. `maxKeys <= 0` (the recorded-stats "hopeless"
    * verdict) skips the distinct collect outright and pays only the
    * range agg. */
  private def collectLearned(dimPlan: LogicalPlan, dimKey: AttributeReference,
                             maxKeys: Int, bloomKeys: Long): Learned = {
    val keyDf = GraftSqlBridge.ofRows(spark,
        Project(Seq(Alias(dimKey, "__graft_dfp_key")()), dimPlan))
      .na.drop()
    def range(df: org.apache.spark.sql.DataFrame): Learned = {
      val bloomAgg = if (bloomKeys > 0L)
        Some(graft.functions.BloomSketch.sizedSketchAgg(spark,
          org.apache.spark.sql.functions.xxhash64(col("__graft_dfp_key")),
          bloomKeys))
      else None
      val aggs = Seq(min(col("__graft_dfp_key")),
        max(col("__graft_dfp_key"))) ++ bloomAgg
      val mm = df.agg(aggs.head, aggs.drop(1): _*).head()
      if (mm.isNullAt(0)) LearnedEmpty
      else LearnedRange(mm.get(0), mm.get(1),
        if (bloomAgg.isDefined && !mm.isNullAt(2))
          Option(mm.getAs[Array[Byte]](2)) else None)
    }
    if (maxKeys <= 0) return range(keyDf)
    // persisted for the over-cap case: the capped distinct+collect and
    // the min/max agg must not evaluate an expensive dim subtree twice
    // (the Caching.persist discipline prunedJoin applies — r14 review
    // find; the join's own build side at execution is a separate plan
    // either way, the price every runtime-filter scheme pays once)
    val keyDfP = keyDf.persist()
    try {
      keyCollects.incrementAndGet()
      val rows = keyDfP.distinct().limit(maxKeys + 1).collect()
      if (rows.isEmpty) LearnedEmpty
      else if (rows.length <= maxKeys) LearnedKeys(rows.map(_.get(0)).toSeq)
      else range(keyDfP)
    } finally { keyDfP.unpersist(); () }
  }

  /** Bind what the collect learned to THIS compile's fact attribute.
    * Literals are created in the fact key's type — identical to the
    * dim key's by the equi-pair gate. */
  private def keyPredicate(dimPlan: LogicalPlan, dimKey: AttributeReference,
                           factKey: AttributeReference, maxKeys: Int,
                           bloomKeys: Long): Expression = {
    val dt = factKey.dataType
    learnedFor(dimPlan, dimKey, maxKeys, bloomKeys) match {
      case LearnedEmpty => Literal.FalseLiteral
      case LearnedKeys(vals) =>
        // small lists stay `In` (readable plans, plain codegen); larger
        // ones go straight to InSet — OptimizeIn already ran (pre-CBO is
        // after operator optimization), so a 10⁴-literal In would reach
        // codegen verbatim and blow the generated method size
        if (vals.size <= 10) In(factKey, vals.map(v => Literal.create(v, dt)))
        else {
          val conv = CatalystTypeConverters.createToCatalystConverter(dt)
          InSet(factKey, vals.map(conv).toSet)
        }
      case LearnedRange(lo, hi, sketch) =>
        val base: Expression =
          And(GreaterThanOrEqual(factKey, Literal.create(lo, dt)),
            LessThanOrEqual(factKey, Literal.create(hi, dt)))
        sketch.fold(base)(s => And(base, BloomFilterMightContain(
          Literal.create(s, org.apache.spark.sql.types.BinaryType),
          new XxHash64(Seq(factKey)))))
    }
  }
}
