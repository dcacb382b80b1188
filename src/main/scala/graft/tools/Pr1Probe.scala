package graft.tools
import graft.engine.{Caching, Graft, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for pr1 (r18, VERDICT #4): times the pageRank
  * pipeline's pieces — edge build, degree table, node count, and the
  * three power-iteration rounds — in isolation, so the optimization
  * target is the measured stage and not a guess. Replays the same
  * internals as [[graft.ops.ext.GraphRank.pageRank]] (same package
  * visibility); each timing materializes via toRdd.count() like the
  * bench. Usage: `runMain graft.tools.Pr1Probe [sfDir]`. */
object Pr1Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.configure(SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pr1probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 2) Caching.scoped {
      println(s"--- pass $round (${if (round == 1) "cold" else "warm"}) ---")
      val t = Tables(spark, dir)
      val pairs = t.orders.select("o_orderkey", "o_custkey")
        .join(t.lineitem.select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"),
          (col("l_suppkey") + graft.ops.ext.GraphRank.NodeOff).as("s"))
        .distinct()
      val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
        .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
      val nodes = t.customer.select(col("c_custkey").as("id"))
        .unionByName(t.supplier.select((col("s_suppkey") + graft.ops.ext.GraphRank.NodeOff).as("id")))
      val e = time("edge build+cache") {
        val e0 = Caching.persist(edges.repartition(col("src")))
        e0.queryExecution.toRdd.count(); e0
      }
      println(s"[pr1probe] e cached partitions: ${e.rdd.getNumPartitions}")
      val deg = time("deg build+cache") {
        val d0 = Caching.persist(e.groupBy("src").agg(count(lit(1)).as("d")))
        d0.queryExecution.toRdd.count(); d0
      }
      val n = time("nodes.count")(nodes.count())
      var ranks = nodes.withColumn("r", lit(graft.ops.ext.GraphRank.Mass / n))
      val base = (3L * (graft.ops.ext.GraphRank.Mass / n)) / 20L
      for (i <- 1 to graft.ops.ext.GraphRank.Rounds) {
        val acc = e.join(ranks.withColumnRenamed("id", "src"), "src")
          .join(deg, "src")
          .select(col("dst").as("id"), expr("r div d").as("contrib"))
          .groupBy("id").agg(sum("contrib").as("acc"))
        ranks = nodes.join(acc, Seq("id"), "left_outer")
          .select(col("id"),
            (lit(base) + expr("(17 * coalesce(acc, 0L)) div 20")).as("r"))
        val snap = ranks
        time(s"round $i (cumulative plan)")(snap.queryExecution.toRdd.count())
      }
      time("full query (fresh plan + sort)") {
        graft.SparkEntry.queries("pr1_pagerank")(spark, dir).queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
