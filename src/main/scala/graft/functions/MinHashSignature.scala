package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature: k minimum xxhash64 values (seeds 0..k-1)
  * over an array<string> of shingles, returned as array<long>.
  *
  * Replaces `transform(sequence(0,k-1), j -> array_min(transform(sh, s ->
  * xxhash64(s, j))))`: nested higher-order lambdas evaluate interpreted
  * per element and allocate k intermediate arrays per row — at k=32 that
  * was ~9M interpreted expression evals per 5k documents. This expression
  * hashes each shingle's bytes k times in a tight loop (Spark's own XXH64
  * on the UTF8String's memory, no copies, no allocations beyond the k-long
  * result). CodegenFallback costs one virtual call per ROW — irrelevant
  * next to the per-element work it replaces.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sigs expects array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val base = s.getBaseObject
        val off = s.getBaseOffset
        val len = s.numBytes()
        var j = 0
        while (j < k) {
          val h = XXH64.hashUnsafeBytes(base, off, len, j.toLong)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSignature {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs",
      exprs => MinHashSignature(exprs(0),
        exprs(1).eval(InternalRow.empty).asInstanceOf[Int]),
      "built-in")
}
