package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All [[HyperplaneBuckets.Tables]] random-hyperplane LSH bucket ids of a
  * 64-dim float embedding in one pass, returned as array<long> (index =
  * table id, to `posexplode`).
  *
  * Replaces a generated SQL projection of 8 tables × 6 bits × 64
  * literal-weighted terms (~3k operators): that expression exceeded
  * janino's 64 KB method limit, so whole-stage codegen FELL BACK to
  * interpreted eval for the entire bucket-assignment stage — the hot
  * narrow pass of ann2/ann3/dd5c. Here the weights live in a plain
  * double[][][] and the dot products run in a tight JIT'd loop;
  * CodegenFallback costs one virtual call per row, irrelevant next to
  * 3,072 multiply-adds.
  *
  * Arithmetic is kept bit-identical to the SQL form (float→double cast
  * per element, left-associative accumulation in dimension order), so
  * the DuckDB oracle that restates the same sums
  * (`Similarity.lshTopKOracle`) still hash-matches.
  */
case class HyperplaneBuckets(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import HyperplaneBuckets._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_buckets expects array<float>, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Long](Tables)
    var t = 0
    while (t < Tables) {
      var bucket = 0L
      var p = 0
      while (p < BitsPerTable) {
        val w = planes(t)(p)
        var s = 0.0
        var d = 0
        while (d < Dim) {
          s += arr.getFloat(d).toDouble * w(d)
          d += 1
        }
        if (s > 0) bucket |= 1L << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HyperplaneBuckets {
  val Dim = 64
  // 8 tables × 6 bits: see Similarity's recall/cost analysis.
  val Tables = 8
  val BitsPerTable = 6

  /** Deterministic pseudo-random hyperplanes (fixed seed — reproducible
    * across runs, executors, and the generated DuckDB oracle SQL). */
  lazy val planes: Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(Tables, BitsPerTable, Dim)(rnd.nextGaussian())
  }

  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "hyperplane_buckets")(
      exprs => HyperplaneBuckets(exprs(0)))
}
