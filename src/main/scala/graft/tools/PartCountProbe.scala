package graft.tools
import graft.engine.{Graft, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17: partition counts of the cached repartition(col) frames in
  * pr1/pr2 — AQE coalesces REPARTITION_BY_COL, so a cache built that
  * way pins every downstream consumer at the coalesced parallelism. */
object PartCountProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.configure(SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, dir)
    val edges = graft.ops.ext.GraphRank.coPurchaseEdges(t)
    val e = edges.repartition(col("u"))
    e.write.format("noop").mode("overwrite").save()
    println(s"[pc] pr2-style repartition(col).rdd partitions = ${e.rdd.getNumPartitions}")
    val cached = graft.engine.Caching.persist(edges.repartition(col("u")))
    cached.write.format("noop").mode("overwrite").save() // materialize
    println(s"[pc] cached repartition(col) partitions = ${cached.rdd.getNumPartitions}")
    val pinned = graft.engine.Caching.persist(
      edges.repartition(spark.sparkContext.defaultParallelism, col("u")))
    pinned.write.format("noop").mode("overwrite").save()
    println(s"[pc] cached repartition(N, col) partitions = ${pinned.rdd.getNumPartitions}")
    spark.stop()
  }
}
