package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `sorted_count_lte(arr, key)` — the number of elements of an ASCENDING
  * `array<bigint>` that are `<= key`, by binary search: O(log n) per row
  * inside whole-stage codegen.
  *
  * This is the [[graft.ops.gold.Joins.asOfBroadcast]] probe kernel (r16
  * verdict #5): the broadcast as-of rewrite keeps each key's right-side
  * candidates as one sorted array, and the per-left-row probe was a
  * linear `filter` over it — fine at the dim-small rows-per-key the
  * stats election admits, but O(n) per fact row where a binary search is
  * O(log n). One count-≤ primitive answers every as-of direction:
  *   - backward: the candidate is index `cnt(lts) - 1` (the greatest
  *     (t, tie) ≤ lts — the array sorts by the full struct, so the last
  *     element of the run IS the tie-broken winner);
  *   - forward: first index ≥ lts is `cnt(lts - 1)`; the greatest tie
  *     within that timestamp run is `cnt(t0) - 1`;
  *   - nearest: both, compared by age.
  *
  * Null semantics: null array or null key → null (BinaryExpression
  * default). Elements are non-null by construction (the as-of arrays are
  * built from a non-null sort key); a containsNull=true input is still
  * accepted — the search reads `getLong`, which treats a null slot as 0,
  * so callers must not pass arrays with null HOLES (the as-of rewrite
  * never does). The array MUST be ascending; an unsorted input returns
  * an unspecified count, never throws — same contract as every
  * binary-search primitive. */
case class SortedCountLte(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "sorted_count_lte"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint>, bigint), got ($l, $r)")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, k: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val key = k.asInstanceOf[Long]
    var lo = 0
    var hi = arr.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getLong(mid) <= key) lo = mid + 1 else hi = mid
    }
    Integer.valueOf(lo)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, k) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $a.numElements();
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($a.getLong($mid) <= $k) $lo = $mid + 1; else $hi = $mid;
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SortedBound {
  /** Column-layer door (composes with computed Columns — the as-of
    * probe's key is `unix_micros(cast(...))`, not a named column). */
  def countLte(arr: Column, key: Column): Column =
    GraftSqlBridge.column(SortedCountLte(
      GraftSqlBridge.expression(arr), GraftSqlBridge.expression(key)))

  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "sorted_count_lte")(
      exprs => SortedCountLte(exprs(0), exprs(1)))
}
