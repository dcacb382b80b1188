package graft.ops.lake

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Compile PUSHED-DOWN catalyst data filters into a manifest-entry
  * predicate — the piece that turns Spark's own scan-planning filter
  * pushdown into MANIFEST-LEVEL file skipping for lake reads (the
  * Delta/Iceberg "data skipping from the transaction log" shape).
  *
  * Soundness rule: a file is skipped only when a conjunct PROVES no
  * row can match; any shape this compiler does not understand keeps
  * the file (returns no predicate). Three proof sources, composed per
  * conjunct:
  *
  *   - TAG pruning: every staged file carries exactly one tag — the
  *     stage-time string rendering (`cast(tagCol as string)`) of its
  *     partition value — so equality/IN on the tag column prunes by
  *     string comparison. Literals render through Catalyst's own Cast
  *     under the session timezone, i.e. EXACTLY the rendering staging
  *     used, which is what makes the comparison sound for dates and
  *     timestamps too.
  *   - RANGE stats: `min.<col>`/`max.<col>` entry props via
  *     [[Snapshots.rangeOverlap]] (files without stats always kept).
  *     Strict bounds reuse the inclusive overlap — keeping a boundary
  *     file the strict predicate cannot match is sound, just one file
  *     less pruned.
  *   - BLOOM: equality on integral columns probes the per-file sketch
  *     via [[Snapshots.mightContainLong]] (one-sided error: only
  *     definite absence skips).
  */
object Pruning {

  // precompiled: the date tag-range guard runs once per manifest entry
  // per conjunct on the listFiles hot path — String.matches would
  // Pattern.compile ~10⁶ times per query on the manifests this targets
  private val PlainDate = java.util.regex.Pattern.compile("\\d{4}-\\d{2}-\\d{2}")

  /** Largest IN list worth per-file bloom probing (see equalityPred). */
  private val BloomProbeMaxKeys = 256

  /** Entry predicate for a conjunction of pushed filters. `tagCol` is
    * the PHYSICAL tag column name; callers must only use this against
    * identity-mapped schemas (logical == physical), which the SQL
    * relation builder guarantees before electing the pruned path.
    * `table` is the table root — bloom probes resolve their sidecar
    * sketch files against it. */
  def compile(filters: Seq[Expression], tagCol: String,
              table: String): Snapshots.Entry => Boolean = {
    val preds = filters.flatMap(conjuncts).flatMap(translate(_, tagCol, table))
    if (preds.isEmpty) (_: Snapshots.Entry) => true
    else Snapshots.allOf(preds: _*)
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def translate(e: Expression, tagCol: String,
                        table: String): Option[Snapshots.Entry => Boolean] = e match {
    case EqualTo(a: AttributeReference, l: Literal) => equalityPred(a, Seq(l), tagCol, table)
    case EqualTo(l: Literal, a: AttributeReference) => equalityPred(a, Seq(l), tagCol, table)
    // null-safe equality against a non-null literal is plain equality
    // for pruning (a <=> NULL can never match a data row a file holds
    // stats for — but absence-of-stats keeps the file, so stay out)
    case EqualNullSafe(a: AttributeReference, l: Literal) if l.value != null =>
      equalityPred(a, Seq(l), tagCol, table)
    case EqualNullSafe(l: Literal, a: AttributeReference) if l.value != null =>
      equalityPred(a, Seq(l), tagCol, table)
    case In(a: AttributeReference, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      equalityPred(a, vs.map(_.asInstanceOf[Literal]), tagCol, table)
    // the optimizer rewrites IN lists past the conversion threshold
    // (default 10) into InSet carrying RAW catalyst values — re-wrap
    // them as literals so a 500-day IN list still tag/stats-prunes
    case s: InSet => s.child match {
      case a: AttributeReference if s.hset.nonEmpty =>
        equalityPred(a, s.hset.toSeq.map(v => Literal(v, a.dataType)), tagCol, table)
      case _ => None
    }
    case GreaterThan(a: AttributeReference, l: Literal) => rangePred(a, l, lower = true, tagCol)
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) => rangePred(a, l, lower = true, tagCol)
    case LessThan(a: AttributeReference, l: Literal) => rangePred(a, l, lower = false, tagCol)
    case LessThanOrEqual(a: AttributeReference, l: Literal) => rangePred(a, l, lower = false, tagCol)
    case GreaterThan(l: Literal, a: AttributeReference) => rangePred(a, l, lower = false, tagCol)
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) => rangePred(a, l, lower = false, tagCol)
    case LessThan(l: Literal, a: AttributeReference) => rangePred(a, l, lower = true, tagCol)
    case LessThanOrEqual(l: Literal, a: AttributeReference) => rangePred(a, l, lower = true, tagCol)
    // disjunctions: a file is skippable only when EVERY branch proves
    // no row can match. Each branch compiles its own conjunction —
    // untranslatable conjuncts inside a branch just weaken that branch
    // toward keep (sound); a branch with NOTHING translatable keeps
    // every file, so the whole Or yields no predicate. Nested Ors
    // recurse through this same case.
    case Or(l, r) =>
      val lp = conjuncts(l).flatMap(translate(_, tagCol, table))
      val rp = conjuncts(r).flatMap(translate(_, tagCol, table))
      if (lp.isEmpty || rp.isEmpty) None
      else Some(Snapshots.anyOf(
        Snapshots.allOf(lp: _*), Snapshots.allOf(rp: _*)))
    // null-count pruning (the Delta nullCount-stats shape): IS NOT
    // NULL skips provably-all-null files — and since Spark adds an
    // IsNotNull conjunct for every column an equality/range filter
    // touches, this fires on nearly every filtered scan for free.
    // IS NULL skips provably-null-free files.
    case IsNotNull(a: AttributeReference) => Some(Snapshots.notAllNull(a.name))
    case IsNull(a: AttributeReference) => Some(Snapshots.someNull(a.name))
    // `col <> v`: a file is skippable only when EVERY row provably
    // equals v — a constant file (min == max == v / smin == smax == v)
    // or, for the tag column, a non-synthetic tag equal to v's
    // rendering (each staged file holds exactly one tag value)
    case Not(EqualTo(a: AttributeReference, l: Literal)) => notEqualPred(a, l, tagCol)
    case Not(EqualTo(l: Literal, a: AttributeReference)) => notEqualPred(a, l, tagCol)
    // `col LIKE 'p%'` (catalyst rewrites the LIKE to StartsWith):
    // string-stats prefix overlap, plus tag pruning when the column IS
    // the tag — a string tag is the value itself, so the file's single
    // tag either carries the prefix or no row can match
    case StartsWith(a: AttributeReference, l: Literal)
        if a.dataType == StringType && l.dataType == StringType &&
           l.value != null =>
      val p = l.value.toString
      val parts = Seq.newBuilder[Snapshots.Entry => Boolean]
      if (a.name.equalsIgnoreCase(tagCol))
        parts += (e =>
          e.props.contains(Snapshots.TagSyntheticProp) || e.tag.startsWith(p))
      parts += Snapshots.prefixOverlapString(a.name, p)
      Some(Snapshots.allOf(parts.result(): _*))
    case _ => None // unsupported shape: keep every file
  }

  /** Equality/IN: tag prune when the column IS the tag column, plus
    * range + bloom prune when stats/sketch props exist. */
  private def equalityPred(a: AttributeReference, ls: Seq[Literal],
                           tagCol: String,
                           table: String): Option[Snapshots.Entry => Boolean] = {
    val nonNull = ls.filter(_.value != null) // `= NULL` matches nothing; keep
    if (nonNull.size != ls.size || nonNull.isEmpty) return None
    val parts = Seq.newBuilder[Snapshots.Entry => Boolean]
    if (a.name.equalsIgnoreCase(tagCol)) {
      val tags = nonNull.map(render).toSet
      // a SYNTHETIC tag (CONVERTed file: tag = file id, not a partition
      // value) proves nothing about the column — comparing it to the
      // rendered literal would prune every converted file and silently
      // return empty (r10 advisor find); keep such files
      parts += (e =>
        e.props.contains(Snapshots.TagSyntheticProp) || tags.contains(e.tag))
    }
    // range checks run as ONE binary search over the sorted value list
    // per entry (r13) — the old anyOf-per-literal form was O(keys) per
    // entry, 10¹⁰ evals for a 10⁶-file manifest × 10⁴-key IN list
    val doubles = nonNull.flatMap(asDouble)
    if (doubles.size == nonNull.size)
      parts += Snapshots.rangeOverlapAnySorted(a.name,
        doubles.sorted.toIndexedSeq)
    // STRING columns (r10): a pushed string-literal comparison implies
    // the COLUMN is string-typed (Spark inserts casts otherwise, which
    // block pushdown), so the column's min/max props — recorded by the
    // string footer path in unsigned-UTF-8 order — compare soundly
    if (a.dataType == StringType && nonNull.forall(_.dataType == StringType))
      parts += Snapshots.rangeOverlapStringAnySorted(a.name,
        nonNull.map(_.value.toString)
          .sorted(Snapshots.utf8Ordering).toIndexedSeq)
    // bloom probes stay O(keys) per SURVIVING file (allOf evaluates the
    // cheap range checks first), so cap the list size they're worth:
    // probing 10⁴ sketches per file costs more than the footer open it
    // might save, and the range check has already narrowed the set
    val longs = nonNull.flatMap(asLong)
    if (longs.size == nonNull.size && longs.size <= BloomProbeMaxKeys)
      parts += Snapshots.anyOf(longs.map(v =>
        Snapshots.mightContainLong(table, a.name, v)): _*)
    val ps = parts.result()
    if (ps.isEmpty) None else Some(Snapshots.allOf(ps: _*))
  }

  /** `col <> v`: skip only provably-constant-v files. Null rows cannot
    * satisfy the predicate either (`v <> NULL` is NULL), so stats over
    * non-null values alone decide. Numeric equality is trusted only
    * inside double's exact-integer range — the recorded bounds are
    * double-rendered, and a giant long's nearest-double rounding could
    * fake `min == max == v` across distinct values. String bounds are
    * exact even under parquet truncation (lo == hi == v pins every
    * value). The tag case skips a whole-file tag match — each staged
    * file holds exactly one non-null tag value. */
  private def notEqualPred(a: AttributeReference, l: Literal,
                           tagCol: String): Option[Snapshots.Entry => Boolean] = {
    if (l.value == null) return None // col <> NULL matches no row; keep
    val parts = Seq.newBuilder[Snapshots.Entry => Boolean]
    if (a.name.equalsIgnoreCase(tagCol)) {
      val t = render(l)
      parts += (e => e.props.contains(Snapshots.TagSyntheticProp) || e.tag != t)
    }
    asDouble(l).filter(d => math.abs(d) < 9007199254740992.0).foreach { d =>
      parts += Snapshots.notConstNumeric(a.name, d)
    }
    if (a.dataType == StringType && l.dataType == StringType)
      parts += Snapshots.notConstString(a.name, l.value.toString)
    val ps = parts.result()
    if (ps.isEmpty) None else Some(Snapshots.allOf(ps: _*))
  }

  private def rangePred(a: AttributeReference, l: Literal, lower: Boolean,
                        tagCol: String): Option[Snapshots.Entry => Boolean] = {
    val parts = Seq.newBuilder[Snapshots.Entry => Boolean]
    // TAG-ORDER pruning — `WHERE day BETWEEN d1 AND d2` on the
    // partition column, the most common analytics slice: sound only
    // when the tag STRING order agrees with the column's value order,
    // which holds for String (tag == value) and Date (ISO yyyy-mm-dd
    // is lexicographic) but NOT numeric renderings ("9" > "10").
    // Strict bounds reuse the inclusive compare — keeping the
    // boundary tag's files is sound, one tag less pruned. Synthetic
    // (CONVERTed) tags prove nothing and are kept.
    if (a.name.equalsIgnoreCase(tagCol) && l.value != null) {
      // one order-compare kernel for both cases; guard(e.tag) adds the
      // per-entry soundness precondition (always true for strings)
      def tagOrder(v: String, guard: String => Boolean): Snapshots.Entry => Boolean =
        e => e.props.contains(Snapshots.TagSyntheticProp) || !guard(e.tag) ||
          (if (lower) Snapshots.utf8Lte(v, e.tag)
           else Snapshots.utf8Lte(e.tag, v))
      if (a.dataType == StringType && l.dataType == StringType)
        parts += tagOrder(l.value.toString, _ => true) // tag == value
      else if (a.dataType == org.apache.spark.sql.types.DateType &&
               l.dataType == org.apache.spark.sql.types.DateType) {
        // ISO order == date order only for plain zero-padded years —
        // extreme renderings ("+10000-…", "-0044-…") sort out of
        // order, so BOTH sides must match the plain pattern or the
        // file is kept
        val v = render(l)
        if (PlainDate.matcher(v).matches())
          parts += tagOrder(v, t => PlainDate.matcher(t).matches())
      }
    }
    asDouble(l).foreach { v =>
      parts += (if (lower) Snapshots.rangeOverlap(a.name, v, Double.PositiveInfinity)
                else Snapshots.rangeOverlap(a.name, Double.NegativeInfinity, v))
    }
    // string ranges prune lexicographically (unsigned UTF-8 — the
    // footer stats' order); the unbounded side stays open
    if (a.dataType == StringType && l.dataType == StringType && l.value != null) {
      val v = l.value.toString
      parts += (if (lower) Snapshots.rangeOverlapString(a.name, Some(v), None)
                else Snapshots.rangeOverlapString(a.name, None, Some(v)))
    }
    val ps = parts.result()
    if (ps.isEmpty) None else Some(Snapshots.allOf(ps: _*))
  }

  /** Literal rendered exactly as staging rendered the tag value. */
  private def render(l: Literal): String =
    Cast(l, StringType, Some(SQLConf.get.sessionLocalTimeZone))
      .eval(null).toString

  private def asDouble(l: Literal): Option[Double] = l.dataType match {
    // stats props exist only for numeric primitives; a non-numeric
    // literal can't range-prune (and ANSI Cast would THROW on it)
    case _: org.apache.spark.sql.types.NumericType =>
      Option(Cast(l, DoubleType, Some(SQLConf.get.sessionLocalTimeZone)).eval(null))
        .map(_.asInstanceOf[Double])
    // DATE/TIMESTAMP stats ride the footer as their physical integers
    // (INT32 epoch days / INT64 micros — exactly the catalyst internal
    // values), so the literal's raw value compares against min/max
    // props directly; micros stay well inside double's 2^53 exactness
    case org.apache.spark.sql.types.DateType =>
      Option(l.value).map(_.asInstanceOf[Int].toDouble)
    case org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType =>
      Option(l.value).map(_.asInstanceOf[Long].toDouble)
    case _ => None
  }

  private def asLong(l: Literal): Option[Long] = {
    import org.apache.spark.sql.types._
    // matched by DATA TYPE, not boxed runtime class: a DateType
    // literal's value is also a boxed Integer, and probing it against
    // an INT-width sketch silently pruned matching files (review find)
    // — DATE probes use the epoch-day count, matching withBloom's
    // unix_date normalization; any other type never probes
    l.dataType match {
      case ByteType | ShortType | IntegerType | LongType | DateType =>
        Option(l.value).map {
          case i: java.lang.Integer => i.longValue
          case j: java.lang.Long => j
          case sh: java.lang.Short => sh.longValue
          case b: java.lang.Byte => b.longValue
        }
      case _ => None
    }
  }
}
