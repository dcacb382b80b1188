package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the fixed-point vector arithmetic the
  * k-means / PQ / random-projection family runs on (see
  * [[graft.ops.ext.Similarity.KmQ]]: all distances are exact BIGINT ops
  * over `floor(x·2²⁴)` quantized vectors, so results are
  * accumulation-order-independent and bit-identical to the DuckDB
  * oracle).
  *
  * Previously these were `aggregate(zip_with(a, b, …), 0L, …)` HOF
  * chains. Spark evaluates nested higher-order-function lambdas
  * INTERPRETED, per element — a boxed function call for every dimension
  * of every (row × centroid) pair, squarely in the hot loop of Lloyd
  * assignment (rows × k × d) and ADC table building. Same motivation as
  * [[CosineSimilarity]] and [[MinHashSignature]]: a native expression
  * keeps the loop inside whole-stage codegen, reading both arrays out of
  * Tungsten UnsafeArrayData with no per-element allocation. At 100 TB
  * the assignment pass is CPU-bound on exactly this loop.
  *
  * Null semantics mirror the HOF forms they replace: null input → null;
  * a length mismatch → null (zip_with pads with null, poisoning the
  * HOF's sum — lengths are statically equal here, but the contract is
  * preserved). Arithmetic is raw two's-complement `long` — the operands
  * are bounded by construction (64 dims × (2²⁸)² diffs < 2⁶³), matching
  * the non-ANSI HOF lambda behavior.
  */
abstract class LongVecBinary extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  /** Per-element combine in generated Java; `$x`/`$y` are long. */
  protected def combineJava(x: String, y: String): String
  protected def combine(x: Long, y: Long): Long

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) null
    else {
      var acc = 0L
      var i = 0
      while (i < n) { acc += combine(x.getLong(i), y.getLong(i)); i += 1 }
      java.lang.Long.valueOf(acc)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $xi = $a.getLong($i);
         |    long $yi = $b.getLong($i);
         |    $acc += ${combineJava(xi, yi)};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** `quantized_l2(a, b)` = Σ (aᵢ − bᵢ)² over two BIGINT vectors — the
  * Lloyd-assignment / PQ / ADC distance kernel. */
case class QuantizedL2(left: Expression, right: Expression) extends LongVecBinary {
  override def prettyName: String = "quantized_l2"
  override protected def combineJava(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def combine(x: Long, y: Long): Long = (x - y) * (x - y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `long_dot(a, b)` = Σ aᵢ·bᵢ over two BIGINT vectors — the exact-integer
  * projection kernel (emb2's JL transform). */
case class LongDot(left: Expression, right: Expression) extends LongVecBinary {
  override def prettyName: String = "long_dot"
  override protected def combineJava(x: String, y: String): String = s"$x * $y"
  override protected def combine(x: Long, y: Long): Long = x * y
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object LongVecOps {
  def register(spark: SparkSession): Unit = {
    Registry.registerOnce(spark, "quantized_l2")(
      exprs => QuantizedL2(exprs(0), exprs(1)))
    Registry.registerOnce(spark, "long_dot")(
      exprs => LongDot(exprs(0), exprs(1)))
  }
}
