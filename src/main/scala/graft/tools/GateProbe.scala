package graft.tools

import graft.engine.{Graft, Tables}
import graft.ops.lake.{DynamicFilter, Mutations, Snapshots}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost-gate crossover receipt for [[DynamicFilter.prunedJoin]] (r15,
  * the r14 verdict item): `DefaultMinFiles = 256` was derived from a
  * 135-file sf0.1 fixture — this probe re-derives the crossover on a
  * LADDER of fact sizes cut from one corpus at a CONSTANT rows-per-file
  * grain (so "files" stays a faithful proxy for bytes as it is on a
  * real size-bounded table): at each rung it warm-times the pruned
  * join (key collect + manifest prune) against the plain join and
  * prints which one won. The gate is correctly placed when every rung
  * below it has plain winning and every rung above has prune winning.
  *
  *   runMain graft.tools.GateProbe [sfDir] [rowsPerFile]
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rowsPerFile = args.lift(1).map(_.toInt).getOrElse(4000)
    val spark = Graft.configure(
      SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // lineitem is the biggest driver table (6M rows at sf1) — the only
    // corpus that brackets the 256-file gate from both sides at a
    // production-ish 4k-row file grain; the constant tag keeps the
    // receipt about min/max KEY pruning alone (no tag-prune bonus)
    val corpus = Tables(spark, sfDir).lineitem
      .select(col("l_orderkey").as("event_id"),
        col("l_extendedprice").as("value"))
      .withColumn("event_date", lit("all"))
    val total = corpus.count()

    println(f"[gate-probe] sf=$sfDir corpus=$total%d rows, " +
      f"$rowsPerFile%d rows/file, gate=${DynamicFilter.DefaultMinFiles}")
    var rows = 32L * rowsPerFile
    while (rows <= total) {
      val slice = corpus.filter(col("event_id") % (total / rows).max(1L) === 0L)
      val table = Graft.freshDir(s"gateprobe-$rows")
      Snapshots.commitAll(table, Snapshots.stageWithStats(
        slice, table, "event_date", "event_id",
        buckets = (rows / rowsPerFile).toInt.max(1)))
      val files = Snapshots.entriesAll(table).size
      // 1%-selective CLUSTERED dim: the shape pruning exists for
      val maxId = slice.agg(max("event_id")).head().getLong(0)
      val dim = slice.filter(col("event_id") <= maxId / 100)
        .select(col("event_id").as("did")).distinct()

      def wall(pruned: Boolean): Double = {
        def mk() =
          if (pruned) DynamicFilter.prunedJoin(spark, table, dim,
            "event_id", "did", minFiles = 0)
          else Mutations.readMerged(spark, table)
            .join(dim, col("event_id") === col("did"), "inner")
        mk().agg(count(lit(1))).head() // warm
        val t0 = System.nanoTime()
        mk().agg(count(lit(1))).head()
        (System.nanoTime() - t0) / 1e9
      }
      val plain = wall(pruned = false)
      val prune = wall(pruned = true)
      val winner = if (prune < plain) "PRUNE" else "plain"
      println(f"[gate-probe] files=$files%5d rows=$rows%9d " +
        f"plain=${plain}%6.2fs prune=${prune}%6.2fs -> $winner")
      rows *= 4
    }
    spark.stop()
  }
}
