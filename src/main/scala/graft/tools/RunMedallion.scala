package graft.tools

import org.apache.spark.sql.SparkSession

/** CLI driver for the full bronze→silver→gold→check pipeline.
  * Usage: runMain graft.tools.RunMedallion [sfDir [baseDir]] */
object RunMedallion {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val base = args.lift(1).getOrElse("target/medallion")
    val spark = graft.engine.Graft.configure(
      SparkSession.builder().master(s"local[${graft.engine.Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = graft.ops.Medallion.run(spark, sfDir, base)
    println(s"[medallion] bronze=${s.bronzeRows} silver=${s.silverRows} " +
      s"gold=${s.goldRows} uniqueViolations=${s.uniqueViolations} " +
      s"nullViolations=${s.nullViolations}")
    spark.stop()
  }
}
