package graft.tools

import org.apache.spark.sql.SparkSession

/** Mimics the driver's t1 smoke: SparkEntry.entry(spark) must return >0
  * rows on sf0.001. Builder-side QA entry point. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.configure(
      SparkSession.builder().master(s"local[${graft.engine.Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=$n ${if (n > 0) "OK" else "EMPTY — FAIL"}")
    spark.stop()
  }
}
