package graft.tools

import graft.engine.{Graft, Tables}
import graft.ops.lake.{Analyze, Snapshots}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stats-refresh cost receipt (builder QA, r14): the three NDV
  * maintenance forms on one committed table, timed —
  *
  *   - `analyze`            exact multi-distinct (Expand; the oracle form)
  *   - `analyzeApprox`      one HLL++ aggregation scan
  *   - `analyzeFromSketches` fold of the per-file sidecar sketches
  *                          recorded by [[Snapshots.withHll]] at write
  *                          time — NO data-file or footer read
  *
  * plus the estimates themselves, so the receipt shows the accuracy
  * the speedup buys. The sketch fold's cost scales with the MANIFEST
  * (#files), the others with the DATA — at 10⁶ files × 100 MB the gap
  * is a metadata job vs a 100 TB scan; this probe shows the shape at
  * fixture scale. Run: `SPARK_GRAFT_SF_DIR=… runMain graft.tools.HllProbe`. */
object HllProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.configure(
      SparkSession.builder().master(s"local[$cpus]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val table = Graft.freshDir(
      "hllprobe-" + sfDir.replaceAll("[^A-Za-z0-9.]", "_"))
    val ev = Tables(spark, sfDir).events
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "user_id", "value", "event_date")
    Snapshots.commitAll(table, Snapshots.withHll(Snapshots.withHll(
      Snapshots.stageWithStats(ev, table, "event_date", "event_id"),
      table, "event_id", spark), table, "user_id", spark))
    val nFiles = Snapshots.entriesAll(table).size
    val cols = Seq("event_id", "user_id")

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // warm with one full UNTIMED pass over both columns: schema
    // resolution alone does not fault in data pages, so the first
    // timed form would otherwise pay everyone's cold page-cache read
    // and the ratios would partially measure cache warming (r14 review
    // find). The warm pass also fills the merged-read caches; its
    // extra props commit is immaterial to a probe table.
    Analyze.analyzeApprox(spark, table, cols)

    val (exact, tExact) = timed(Analyze.analyze(spark, table, cols))
    val (approx, tApprox) = timed(Analyze.analyzeApprox(spark, table, cols))
    val (folded, tFold) = timed(Analyze.analyzeFromSketches(spark, table, cols))

    def fmt(s: (Long, Seq[(String, Long, Long)])): String =
      s._2.map { case (c, ndv, _) => s"$c=$ndv" }.mkString(" ")
    println(f"[hll] files=$nFiles%4d rows=${exact._1}%8d | " +
      f"exact=$tExact%6.2fs approx=$tApprox%6.2fs sketch-fold=$tFold%6.2fs " +
      f"(fold ${tExact / tFold}%4.1fx vs exact, ${tApprox / tFold}%4.1fx vs approx)")
    println(s"[hll] exact  ndv: ${fmt(exact)}")
    println(s"[hll] approx ndv: ${fmt(approx)}")
    println(s"[hll] folded ndv: ${fmt(folded)}")
    spark.stop()
  }
}
