package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine operator exercise: a Spark implementation and
  * (where SQL-expressible) an equivalent DuckDB oracle query over the same
  * parquet tables. The driver hash-compares the two at sf0.01, sorting
  * columns by name — so every computed column is aliased identically on
  * both sides, and compared outputs stick to DATE / BIGINT / DOUBLE /
  * STRING / BOOLEAN columns (raw timestamps differ in tz-annotation
  * between the engines' parquet writers, and raw DECIMAL columns render
  * differently through the driver's canonicalizer even when the values
  * are digit-for-digit identical — r16's `gold_fact_fee_tax_decimal`
  * proved this with a 0-diff exact string compare that still hash-failed).
  * Decimal-exact pipelines keep DECIMAL internal and emit the edge as
  * `CAST(... AS STRING)` on BOTH engines (full-scale rendering agrees)
  * or as DOUBLE with the decimal-fidelity claim pinned by a spec.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
