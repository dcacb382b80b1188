package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: date-equality predicates over the engine's normalized
  * event timestamp become pushable ranges on the raw wire column.
  *
  * The events table stores epoch **nanos** as int64 (Spark can't read
  * parquet TIMESTAMP(NANOS) natively), and `Tables.events` normalizes it
  * with `cast(timestamp_micros(ts div 1000) as timestamp_ntz)`. A user's
  * natural predicate `to_date(ts) = D` therefore sits on a derived
  * expression and never reaches the parquet scan — a full 100 TB scan to
  * read one day. This rule recognizes the engine's own canonical
  * normalization chain and rewrites the equality into the equivalent
  * half-open range on the raw long column, which Spark's existing
  * datasource pushdown then ships to the parquet row-group filters.
  *
  * Equivalence: floor-truncation nanos→micros→date is monotone, so
  * to_date(norm(ts)) = D  ⟺  D·86400e9 ≤ ts < (D+1)·86400e9 (UTC
  * session), including null semantics (both false for null ts).
  */
object NanosDateRangeRule extends Rule[LogicalPlan] {

  /** Matches `timestamp_micros(rawTs div 1000)` over a long attribute —
    * the residual form Spark's own cast-unwrapping leaves after it
    * rewrites `to_date(normalized) = D` into timestamp comparisons (the
    * date arithmetic is already handled by UnwrapCastInBinaryComparison;
    * the micros conversion is what stays unpushable). */
  private object TimestampOfRawNanos {
    def unapply(e: Expression): Option[Attribute] = e match {
      case MicrosToTimestamp(IntegralDivide(attr: Attribute, Literal(1000L, LongType), _))
          if attr.dataType == LongType => Some(attr)
      case _ => None
    }
  }

  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(us: Long, TimestampType) => Some(us)
      case Literal(us: Long, TimestampNTZType) => Some(us)
      case _ => None
    }
  }

  // floor-div algebra (k = 1000 > 0):
  //   floor(ts/k) >= T  ⟺  ts >= T·k         floor(ts/k) >  T  ⟺  ts >= (T+1)·k
  //   floor(ts/k) <  T  ⟺  ts <  T·k         floor(ts/k) <= T  ⟺  ts <  (T+1)·k
  private def ge(a: Attribute, us: Long) = GreaterThanOrEqual(a, Literal(us * 1000L, LongType))
  private def lt(a: Attribute, us: Long) = LessThan(a, Literal(us * 1000L, LongType))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreaterThanOrEqual(TimestampOfRawNanos(a), TsLit(us)) => ge(a, us)
    case GreaterThan(TimestampOfRawNanos(a), TsLit(us)) => ge(a, us + 1)
    case LessThan(TimestampOfRawNanos(a), TsLit(us)) => lt(a, us)
    case LessThanOrEqual(TimestampOfRawNanos(a), TsLit(us)) => lt(a, us + 1)
    case EqualTo(TimestampOfRawNanos(a), TsLit(us)) => And(ge(a, us), lt(a, us + 1))
    // flipped operand order
    case GreaterThanOrEqual(TsLit(us), TimestampOfRawNanos(a)) => lt(a, us + 1)
    case GreaterThan(TsLit(us), TimestampOfRawNanos(a)) => lt(a, us)
    case LessThan(TsLit(us), TimestampOfRawNanos(a)) => ge(a, us + 1)
    case LessThanOrEqual(TsLit(us), TimestampOfRawNanos(a)) => ge(a, us)
    case EqualTo(TsLit(us), TimestampOfRawNanos(a)) => And(ge(a, us), lt(a, us + 1))
  }
}

/** Session extensions entry point (spark.sql.extensions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => NanosDateRangeRule)
    // count(*) over a DV-free lake scan folds from manifest row counts
    e.injectOptimizerRule(_ => MetadataCountRule)
    // SQL-surface dynamic file pruning: lake-fact × selective-dim joins
    // grow a runtime key filter that manifest-prunes the fact scan
    e.injectPreCBORule(s => SqlDfpRule(s))
    e.injectPlannerStrategy(_ => GroupedTopKStrategy)
    // lake SQL surface: MERGE/DELETE/UPDATE/VACUUM/OPTIMIZE/RESTORE/
    // DESCRIBE HISTORY statements + registered-name resolution with
    // VERSION AS OF time travel (graft.sql.LakeSql)
    e.injectParser((s, delegate) => new graft.sql.LakeSqlParser(s, delegate))
    e.injectResolutionRule(s => graft.sql.LakeRelationRule(s))
    e.injectPlannerStrategy(_ => graft.sql.LakeCommandStrategy)
    // change feed as a SQL table function (the Delta table_changes shape)
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("table_changes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.sql.LakeSql", "table_changes"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.sql.LakeSql.tableChangesPlan(args)))
    // stats-driven skew join as a SQL table function (r14 — the
    // Skew.statsSkewJoin chain reachable from plain spark.sql)
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("stats_skew_join"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.sql.LakeSql", "stats_skew_join"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.sql.LakeSql.statsSkewJoinPlan(args)))
    // stats-ordered star join as a SQL table function (r14 — the
    // JoinOrder.statsOrderedJoin CBO chain reachable from plain sql)
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("stats_star_join"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.sql.LakeSql", "stats_star_join"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.sql.LakeSql.statsStarJoinPlan(args)))
    // generic as-of join as a SQL table function (r14 — Joins.asOf
    // reachable from plain sql)
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("asof_join"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.sql.LakeSql", "asof_join"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.sql.LakeSql.asofJoinPlan(args)))
    // stats-elected as-of join as a SQL table function (r16 —
    // Joins.statsAsOf reachable from plain sql)
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("stats_asof_join"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.sql.LakeSql", "stats_asof_join"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.sql.LakeSql.statsAsofJoinPlan(args)))
    // hourly gap fill + forward-filled close as a SQL table function
    // (r15 — EventTime.gapFill reachable from plain sql)
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("gap_fill"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.sql.LakeSql", "gap_fill"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.sql.LakeSql.gapFillPlan(args)))
  }
}
