package graft.plans

import graft.ops.lake.Snapshots

import org.apache.spark.sql.GraftFileIndex
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** METADATA-ONLY COUNT — the Delta `OptimizeMetadataOnlyDeltaQuery`
  * shape: `SELECT count(*) FROM lake_table` (no WHERE, no GROUP BY)
  * folds to a constant from the manifest's per-entry `rows` props
  * instead of scanning row-group metadata file by file. At 10⁶ files
  * that is a driver fold over the already-resident entry list versus a
  * distributed job touching a million footers — the table-stats
  * question a 100 TB warehouse asks constantly. `count(col)` folds
  * too when every entry carries a `nulls.<col>` null-count stat for
  * the column (recorded by the footer-stats path): non-null rows per
  * file = `rows - nulls`, summed driver-side.
  *
  * Soundness gates (all must hold, else the plan is left alone):
  *   - the aggregate has NO grouping and every output is a bare
  *     `count(1)`/`count(*)` or `count(col)` of a plain column — no
  *     DISTINCT, no FILTER clause, no other aggregate mixed in;
  *   - the child is (projections over) exactly ONE manifest-pruned
  *     lake scan ([[GraftFileIndex]]) — a `Filter` anywhere bails (the
  *     count would change), as does the union-of-schema-groups shape
  *     and the deletion-vector anti-join (those plans are not a bare
  *     scan, so they never match);
  *   - every entry carries [[Snapshots.RowsProp]] (exact commit-time
  *     footer counts) and NONE carries a deletion vector — a vectored
  *     entry's live count is `rows - dv.rows`, but such entries only
  *     appear under the anti-join plan, which already fails the shape
  *     gate; the prop check is defense in depth;
  *   - for `count(col)`, the column resolves through the projection
  *     stack (alias-chasing — the rename mapping reads under Projects)
  *     to a PHYSICAL scan column whose `nulls.<phys>` stat exists on
  *     every entry with `nulls <= rows`; a single entry without the
  *     stat bails the fold.
  *
  * Projections are row-preserving (1:1), so any stack of them between
  * the aggregate and the scan — including the logical rename/drop
  * projection evolved tables read under — keeps the fold exact. */
object MetadataCountRule extends Rule[LogicalPlan] {

  /** `Left(())` = count(*); `Right(a)` = count(a); None = not foldable. */
  private def foldKind(ne: NamedExpression)
      : Option[scala.Either[Unit, AttributeReference]] = ne match {
    case Alias(AggregateExpression(Count(Seq(Literal(1, _))), Complete, false, None, _), _) =>
      Some(scala.Left(()))
    case Alias(AggregateExpression(Count(Seq(a: AttributeReference)), Complete, false, None, _), _) =>
      Some(scala.Right(a))
    case _ => None
  }

  /** The single pruned lake scan under row-preserving projections. */
  private def scanEntries(p: LogicalPlan): Option[Seq[Snapshots.Entry]] = p match {
    case Project(_, child) => scanEntries(child)
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation => h.location match {
        case g: GraftFileIndex => Some(g.manifestEntries)
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  /** Chase `a` down the projection stack to the scan's PHYSICAL column
    * name — only plain attribute/alias-of-attribute hops qualify (a
    * computed projection changes null-ness and bails). */
  private def physicalOf(p: LogicalPlan, a: Attribute): Option[String] = p match {
    case Project(list, child) =>
      list.find(_.exprId == a.exprId).flatMap {
        case al: Alias => al.child match {
          case b: AttributeReference => physicalOf(child, b)
          case _ => None
        }
        case b: AttributeReference => physicalOf(child, b)
        case _ => None
      }
    case l: LogicalRelation => l.output.find(_.exprId == a.exprId).map(_.name)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groups, aggExprs, child, _)
        if groups.isEmpty && aggExprs.nonEmpty &&
           aggExprs.forall(ne => foldKind(ne).isDefined) =>
      scanEntries(child) match {
        case Some(es) if es.nonEmpty &&
            es.forall(e => e.props.contains(Snapshots.RowsProp) &&
              !e.props.contains(Snapshots.DvRefProp)) =>
          val rows = es.map(_.props(Snapshots.RowsProp).toLong)
          val total = rows.sum
          def nonNull(a: AttributeReference): Option[Long] =
            physicalOf(child, a).flatMap { phys =>
              val per = es.zip(rows).map { case (e, r) =>
                e.props.get(s"nulls.$phys").flatMap(_.toLongOption)
                  .collect { case n if n >= 0 && n <= r => r - n }
              }
              if (per.forall(_.isDefined)) Some(per.flatten.sum) else None
            }
          val vals = aggExprs.map(ne => foldKind(ne).get match {
            case scala.Left(())  => Some(total)
            case scala.Right(a)  => nonNull(a)
          })
          if (vals.forall(_.isDefined))
            LocalRelation(agg.output,
              Seq(InternalRow.fromSeq(vals.map(_.get))))
          else agg
        case _ => agg
      }
  }
}
