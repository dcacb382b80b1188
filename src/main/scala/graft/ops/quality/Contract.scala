package graft.ops.quality

import graft.ops.gold.Assertions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A single declarative column expectation — the dbt test vocabulary
  * (reference `dbt_project/models/staging/schema.yml:11-24`). */
sealed trait Check { def name: String }
case object NotNull extends Check { val name = "not_null" }
case object Unique extends Check { val name = "unique" }
final case class AcceptedValues(values: Seq[String]) extends Check {
  val name = "accepted_values"
}
final case class Relationship(toTable: String, field: String) extends Check {
  val name = "relationships"
}

final case class ColumnSpec(column: String, checks: Seq[Check])
final case class TableContract(table: String, columns: Seq[ColumnSpec])

/** Declarative data-quality contract runner — the dbt `schema.yml`
  * analog: per-table, per-column expectations declared as data and
  * compiled onto the [[graft.ops.gold.Assertions]] operators, evaluated
  * as ONE lazy report DataFrame `(table_name, column_name, check_name,
  * n_violations)`. [[Contract.gate]] turns the report into a hard
  * pipeline stage — any violation throws before downstream stages run,
  * which is `dbt test`'s role in the reference DAG
  * (`airflow/dags/binance_dbt_dag.py:38-45`, `binance_revenue_dag.py`).
  *
  * Scale shape: every check is an aggregate branch of one union plan —
  * nothing but the final O(#checks)-row report ever reaches the driver.
  * Accepted-values domains declared in config are literal `IN` filters
  * (codegen'd); derived/reference-table domains go through the anti-join
  * form of [[Assertions.acceptedValuesViolations]].
  */
object Contract {

  /** Compile contracts against a table resolver into the violations
    * report. Lazy: one action evaluates every check. */
  def report(contracts: Seq[TableContract], resolve: String => DataFrame): DataFrame = {
    val frames = for {
      tc <- contracts
      df = resolve(tc.table)
      cs <- tc.columns
      chk <- cs.checks
    } yield {
      val viol: DataFrame = chk match {
        case Unique => Assertions.uniqueViolations(df, cs.column)
        case NotNull => df.filter(col(cs.column).isNull)
        case AcceptedValues(vs) =>
          Assertions.acceptedValuesViolations(df, cs.column, vs)
        case Relationship(to, field) =>
          Assertions.relationshipViolations(df, cs.column, resolve(to), field)
      }
      viol.agg(count(lit(1)).as("n_violations"))
        .select(
          lit(tc.table).as("table_name"),
          lit(cs.column).as("column_name"),
          lit(chk.name).as("check_name"),
          col("n_violations"))
    }
    require(frames.nonEmpty, "empty contract")
    frames.reduce(_.unionByName(_))
      .orderBy("table_name", "column_name", "check_name")
  }

  /** The gate stage: evaluate and throw on any violation (blocks the
    * stages after it, as `dbt test` gates the reference DAG). */
  def gate(contracts: Seq[TableContract], resolve: String => DataFrame): Unit = {
    val bad = report(contracts, resolve)
      .filter(col("n_violations") > 0).collect()
    require(bad.isEmpty,
      "data-quality contract failed: " + bad.map(r =>
        s"${r.getString(0)}.${r.getString(1)} ${r.getString(2)}=${r.getLong(3)}")
        .mkString(", "))
  }
}
