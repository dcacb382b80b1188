package graft.tools
import graft.engine.{Graft, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Pr2Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.configure(SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[pr2probe] $label: ${(System.nanoTime()-t0)/1e9}%.2f s (n=$n)")
    }
    val t = Tables(spark, dir)
    val li = t.lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
    time("edges join-form")(edges.count())
    time("edges join-form 2nd")(edges.count())
    val byOrder = t.lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .groupBy("ok").agg(collect_set(col("p")).as("ps"))
    val edges2 = byOrder
      .select(explode(col("ps")).as("u"), col("ps"))
      .select(col("u"), explode(col("ps")).as("v"))
      .filter(col("u") < col("v"))
      .select("u", "v").distinct()
    time("edges set-form")(edges2.count())
    time("edges set-form 2nd")(edges2.count())
    time("full join-form")(graft.ops.ext.GraphRank.trianglesOf(edges).count())
    time("full set-form")(graft.ops.ext.GraphRank.trianglesOf(edges2).count())
    time("full join-form 2nd")(graft.ops.ext.GraphRank.trianglesOf(edges).count())
    time("full set-form 2nd")(graft.ops.ext.GraphRank.trianglesOf(edges2).count())
    spark.stop()
  }
}
