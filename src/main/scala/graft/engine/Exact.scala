package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic expression helpers.
  *
  * Double sums are accumulation-order-sensitive, so any aggregate that the
  * DuckDB oracle re-computes goes through exact DECIMAL arithmetic and is
  * cast to DOUBLE only as the last step (`decSum`). Decimal values are
  * never downscaled (Spark rounds HALF_UP, DuckDB truncates — see
  * scripts/check.py history). Timestamps are compared as epoch integers
  * (`epochMs`/`epochUs`) because the two engines' parquet writers disagree
  * on tz annotation for timestamp columns.
  */
object Exact {

  /** Tie-portable 6-decimal rounding of a DOUBLE expression.
    *
    * `round(x, 6)` is NOT cross-engine-safe when x can land exactly on
    * a decimal midpoint (dyadic rationals — ratios of power-of-two
    * counts — do, constantly): Spark rounds the exact binary expansion
    * HALF_UP via BigDecimal while DuckDB multiplies and rounds the
    * double, and the two disagree on ties (observed: 1.0015625 →
    * 1.001563 vs 1.001562). This form — floor(x·1e6 + 0.5)/1e6 with
    * every literal string-cast — makes BOTH engines execute the
    * identical IEEE sequence, so whatever the tie does, it does it the
    * same way twice. Use for compared outputs whose inputs are exact
    * rationals; transcendental-valued outputs (cosines, logs) hit ties
    * with probability ~0 and keep plain round(). */
  def portableRound6(c: String): String =
    s"floor(($c) * cast('1000000' as double) + cast('0.5' as double))" +
      " / cast('1000000' as double)"

  /** DuckDB twin of [[portableRound6]] — same ops, same order. */
  def portableRound6Sql(c: String): String =
    s"floor(($c) * '1000000'::DOUBLE + '0.5'::DOUBLE) / '1000000'::DOUBLE"

  /** Exact decimal sum of a double column, surfaced as DOUBLE.
    * DuckDB mirror: CAST(CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE). */
  def decSum(c: Column): Column = decSumRaw(c).cast("double")

  /** Exact decimal sum kept as DECIMAL(25,6) for further exact math.
    * (The outer cast narrows Spark's sum precision 35→25 at the same
    * scale — a pure precision-headroom change, no value rounding.) */
  def decSumRaw(c: Column): Column =
    sum(c.cast(DecimalType(25, 6))).cast(DecimalType(25, 6))

  /** [[decSum]] as a SQL fragment — the ONE definition of the
    * oracle-parity cast chain (it previously lived as four identical
    * private copies; a precision change must move every SQL surface
    * and this Column form in lockstep or one silently diverges from
    * the DuckDB oracle, r14 review find). The oracle strings still
    * restate the same chain verbatim per query — they ship to a
    * different engine, as they must. */
  def decSumSql(expr: String): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE)"

  /** Epoch milliseconds of a (possibly NTZ) timestamp column.
    * DuckDB mirror: epoch_ms(ts). Both truncate sub-ms digits. */
  def epochMs(c: Column): Column = unix_millis(c.cast("timestamp"))

  /** Epoch microseconds. DuckDB mirror: epoch_us(ts). */
  def epochUs(c: Column): Column = unix_micros(c.cast("timestamp"))
}
