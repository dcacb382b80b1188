package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** One-pass MinHash signature: k minimum values of the multiplicative
  * hash family `(a_j * h(s) + b_j) mod P` (P = 2^31-1 prime, fixed seeded
  * coefficients) over an array<string> of shingles, returned as
  * array<long>. The base hash `h(s)` is the top 60 bits of md5(s) reduced
  * mod P — chosen over xxhash64 because every engine speaks md5, so a SQL
  * oracle (DuckDB: `('0x' || substring(md5(s),1,15))::BIGINT % P`, Spark
  * SQL: `conv(substring(md5(cast(s AS binary)),1,15),16,10)`) reproduces
  * the signatures bit-for-bit. That turns dd3's LSH banding from a
  * rows-only check into a hash-compared oracle query.
  *
  * Replaces `transform(sequence(0,k-1), j -> array_min(transform(sh, s ->
  * hash(s, j))))`: nested higher-order lambdas evaluate interpreted per
  * element and allocate k intermediate arrays per row — at k=32 that was
  * ~9M interpreted expression evals per 5k documents. This expression
  * digests each shingle once and applies the k affine maps in a tight
  * loop (two multiplies + mod each, no allocations beyond the k-long
  * result). CodegenFallback costs one virtual call per ROW — irrelevant
  * next to the per-element work it replaces.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  import MinHashSignature.{Prime, coeffA, coeffB}

  require(k <= coeffA.length, s"k=$k exceeds ${coeffA.length} fixed coefficient pairs")

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
    val md = MinHashSignature.digest.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val d = md.digest(arr.getUTF8String(i).getBytes)
        // top 60 bits of the digest == first 15 hex chars of md5 text form
        var v = 0L
        var bi = 0
        while (bi < 7) { v = (v << 8) | (d(bi) & 0xffL); bi += 1 }
        v = (v << 4) | ((d(7) & 0xf0L) >>> 4)
        val h = v % Prime
        var j = 0
        while (j < k) {
          val m = (coeffA(j) * h + coeffB(j)) % Prime
          if (m < mins(j)) mins(j) = m
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
  /** 2^31 - 1, prime: keeps `a*h + b` under 2^62 (no 64-bit overflow in
    * either engine's ANSI arithmetic). */
  val Prime = 2147483647L

  /** Fixed seeded affine coefficients, shared verbatim by the Spark
    * expression and the generated DuckDB oracle SQL. */
  lazy val (coeffA, coeffB): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(1234)
    val a = Array.fill(64)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val b = Array.fill(64)(rnd.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "minhash_sigs")(
      exprs => MinHashSignature(exprs(0),
        exprs(1).eval(InternalRow.empty).asInstanceOf[Int]))
}
