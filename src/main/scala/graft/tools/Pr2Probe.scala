package graft.tools
import graft.engine.{Graft, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for pr2's co-occurrence edge build (r17): the retired
  * self-join form (kept inline — it deliberately preserves removed
  * code) vs the production set-form, which is SHARED with
  * [[graft.ops.ext.GraphRank.triangles]] via `coPurchaseEdges` so the
  * probe can never measure a stale copy. Only the SECOND (warm) run of
  * each pair is a controlled comparison — the first runs pay
  * first-touch parquet/page-cache/JIT cost in whatever order they
  * execute. Usage: `runMain graft.tools.Pr2Probe [sfDir]`. */
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
    val edgesJoin = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
    val edgesSet = graft.ops.ext.GraphRank.coPurchaseEdges(t)
    time("edges join-form cold")(edgesJoin.count())
    time("edges join-form warm")(edgesJoin.count())
    time("edges set-form cold")(edgesSet.count())
    time("edges set-form warm")(edgesSet.count())
    time("full join-form cold")(graft.ops.ext.GraphRank.trianglesOf(edgesJoin).count())
    time("full set-form cold")(graft.ops.ext.GraphRank.trianglesOf(edgesSet).count())
    time("full join-form warm")(graft.ops.ext.GraphRank.trianglesOf(edgesJoin).count())
    time("full set-form warm")(graft.ops.ext.GraphRank.trianglesOf(edgesSet).count())
    spark.stop()
  }
}
