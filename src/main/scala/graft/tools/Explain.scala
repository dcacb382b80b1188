package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of the named queries
  * (default: the bench headline set) for pushdown/broadcast/shuffle
  * review. Usage: runMain graft.tools.Explain [query ...]
  * With SPARK_GRAFT_EXECUTE=1 each query is executed first so the
  * printed plan is AQE's FINAL plan (isFinalPlan=true) — the only way
  * to see runtime decisions like dynamic broadcast-join conversion on
  * hint-free SF-scaling joins.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.configure(
      SparkSession.builder().master(s"local[${graft.engine.Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else graft.Bench.headline
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val execute = sys.env.get("SPARK_GRAFT_EXECUTE").contains("1")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      val df = graft.SparkEntry.queries(n)(spark, dir)
      if (execute) df.queryExecution.toRdd.count()
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
