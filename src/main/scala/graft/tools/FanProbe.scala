package graft.tools
import graft.engine.{Graft, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Controlled A/B for r17's fanScan decision: times each operator with
  * fanScan ON vs OFF (the in-JVM [[Graft.fanScanEnabled]] switch),
  * INTERLEAVED (A B A B A B) in one JVM so ambient drift hits both
  * arms, reporting every run. Each arm runs inside its own Caching
  * scope, so operator-internal persists rebuild per run — the numbers
  * compare plan shapes, not cache reuse. Usage:
  * `runMain graft.tools.FanProbe [sfDir] [query ...]`. */
object FanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("pr2_triangles", "pr1_pagerank", "dd7_dup_passages",
        "dd14_containment", "dd13_cdc_chunks", "tx18_bigram_lm",
        "tx22_bpe_encode", "dd3_minhash_lsh")
    val spark = Graft.configure(SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def once(name: String): Double = graft.engine.Caching.scoped {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      Graft.fanScanEnabled = true; once(n)
      Graft.fanScanEnabled = false; once(n) // warm both arms
      val (as, bs) = (Array.ofDim[Double](3), Array.ofDim[Double](3))
      for (i <- 0 until 3) {
        Graft.fanScanEnabled = true;  as(i) = once(n)
        Graft.fanScanEnabled = false; bs(i) = once(n)
      }
      Graft.fanScanEnabled = true
      println(f"[fanprobe] $n%-20s fan=[${as.map(x => f"$x%.2f").mkString(",")}] " +
        f"nofan=[${bs.map(x => f"$x%.2f").mkString(",")}]")
    }
    spark.stop()
  }
}
