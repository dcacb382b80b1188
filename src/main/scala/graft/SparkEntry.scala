package graft

import graft.engine.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query registry: every implemented operator from SURVEY.md §2 appears as
  * one entry in `queries`, with a DuckDB-equivalent `oracleSql` where the
  * semantics are ANSI-SQL-expressible.
  */
object SparkEntry {

  /** All declared operator exercises, grouped by engine layer. */
  def all: Seq[QueryDef] =
    graft.ops.bronze.Sinks.queries ++
      graft.ops.bronze.Backfill.queries ++
      graft.ops.silver.Staging.queries ++
      graft.ops.silver.TypedDedup.queries ++
      graft.ops.silver.DbtModels.queries ++
      graft.ops.gold.Revenue.queries ++
      graft.ops.gold.Aggregates.queries ++
      graft.ops.gold.Joins.queries ++
      graft.ops.gold.Skew.queries ++
      graft.ops.gold.JoinOrder.queries ++
      graft.ops.gold.Windows.queries ++
      graft.ops.gold.SortSetOps.queries ++
      graft.ops.gold.Bucketed.queries ++
      graft.ops.gold.Assertions.queries ++
      graft.streaming.EventTime.queries ++
      graft.functions.Scalars.queries ++
      graft.ops.ext.TextAnalysis.queries ++
      graft.ops.ext.Dedup.queries ++
      graft.ops.ext.GraphRank.queries ++
      graft.ops.ext.Similarity.queries ++
      graft.ops.ext.Multimodal.queries ++
      graft.ops.lake.Skipping.queries ++
      graft.ops.lake.TimeTravel.queries ++
      graft.ops.lake.Mutations.queries ++
      graft.ops.lake.ChangeApply.queries ++
      graft.ops.lake.DynamicFilter.queries ++
      graft.ops.lake.CopyInto.queries ++
      graft.ops.lake.Analyze.queries ++
      graft.ops.lake.SchemaAudit.queries ++
      graft.sql.LakeSqlQueries.queries ++
      graft.sources.PagesSource.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core business question: daily fee/tax revenue per
    * symbol/region (build_fact_fee_tax.py re-expressed on fixtures). */
  def entry(spark: SparkSession): DataFrame =
    graft.ops.gold.Revenue.factFeeTax(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
