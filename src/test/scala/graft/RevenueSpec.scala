package graft

import graft.ops.gold.Revenue
import org.apache.spark.sql.types.{DecimalType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the money-math edge discipline (r17, QueryDef scaladoc): the
  * decimal twin keeps DECIMAL(38,10) math internal and renders the edge
  * as STRING — raw DECIMAL columns hash-mismatch through the driver's
  * canonicalizer even when every digit agrees (r16 red row). */
class RevenueSpec extends AnyFunSuite with SparkFixture {

  test("decimal twin emits STRING money columns at the edge") {
    val df = Revenue.factFeeTaxDecimal(spark, Sf)
    val money = Seq("traded_notional_dec", "fee_revenue_dec", "tax_collected_dec")
    money.foreach { c =>
      assert(df.schema(c).dataType == StringType, s"$c must leave as STRING")
    }
  }

  test("edge strings carry full scale-10 decimal fidelity and agree with the flagship") {
    val dec = Revenue.factFeeTaxDecimal(spark, Sf)
      .select("event_date", "symbol", "traded_notional_dec", "fee_revenue_dec", "tax_collected_dec")
      .collect().map(r => (r.getDate(0).toString, r.getString(1)) ->
        (BigDecimal(r.getString(2)), BigDecimal(r.getString(3)), BigDecimal(r.getString(4)))).toMap
    val dbl = Revenue.factFeeTax(spark, Sf)
      .select("event_date", "symbol", "traded_notional", "fee_revenue", "tax_collected")
      .collect().map(r => (r.getDate(0).toString, r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(dec.keySet == dbl.keySet)
    assert(dec.nonEmpty)
    dec.foreach { case (k, (tn, fee, tax)) =>
      // full-scale rendering: every value parses with exactly 10 fractional digits
      assert(tn.scale == 10 && fee.scale == 10 && tax.scale == 10, s"scale lost at $k")
      val (tnD, feeD, taxD) = dbl(k)
      assert((tn.toDouble - tnD).abs <= math.ulp(tnD) * 4, s"tn mismatch at $k")
      assert((fee.toDouble - feeD).abs <= math.ulp(math.max(feeD, 1.0)) * 4, s"fee mismatch at $k")
      assert((tax.toDouble - taxD).abs <= math.ulp(math.max(taxD, 1.0)) * 4, s"tax mismatch at $k")
    }
  }

  test("the internal pipeline is decimal to the edge (no double after the input cast)") {
    // The analyzed plan's string edge must wrap a DECIMAL(38,10) cast —
    // i.e. the twin's point (exact money math) survives the r17 rendering fix.
    val plan = Revenue.factFeeTaxDecimal(spark, Sf).queryExecution.analyzed
    val casts = plan.collect { case n => n }.flatMap(_.expressions).flatMap(_.collect {
      case c: org.apache.spark.sql.catalyst.expressions.Cast
          if c.dataType == StringType && c.child.dataType == DecimalType(38, 10) => c
    })
    assert(casts.size >= 3, s"expected 3 decimal(38,10)->string edge casts, saw ${casts.size}")
  }
}
