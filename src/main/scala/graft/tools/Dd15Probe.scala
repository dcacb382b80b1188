package graft.tools

import graft.engine.Graft
import graft.ops.ext.Dedup
import graft.ops.lake.{DynamicFilter, Mutations, Snapshots}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** dd15 index-probe pruning receipt (builder QA, r13): the r12 verdict's
  * one scale gap in the flagship incremental-LSH dedup was that the
  * batch→index candidate join read the FULL index despite the index
  * being stats-clustered on `band_hash`. This probe builds a scale-true
  * band-bucket index over the SF documents corpus (98% as "already
  * ingested"), probes it with a 2% crawl-increment batch both ways —
  * the r12 full-scan join vs the r13 DFP-pruned probe — and reports:
  *
  *   - index files OPENED by the pruned probe vs total index files
  *     (the O(batch + collisions) claim, now backed by file counts);
  *   - wall time of each probe shape on identical candidate output.
  */
object Dd15Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.configure(
      SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val idx = Graft.freshDir("probe-dd15-idx")
    val sh = Dedup.shingled(spark, dir)
      .filter(size(col("sh")) > 0).select("doc_id", "sh").persist()
    val corpusSh = sh.filter(col("doc_id") % 50 =!= 0)  // 98%: the lake
    val batchSh = sh.filter(col("doc_id") % 50 === 0)   // 2%: the increment
    def tagged(b: org.apache.spark.sql.DataFrame) =
      b.withColumn("band", col("band_id").cast("string"))
    Snapshots.commitAll(idx, Snapshots.stageWithStats(
      tagged(Dedup.bucketsFor(corpusSh)), idx, "band", "band_hash"))
    val total = Snapshots.entriesAll(idx).size

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // two regimes: a bulk 2% batch (hashes ≈ files — pruning admits
    // nearly everything, the full scan amortizes) and a point increment
    // (hashes << files — the dedup-on-arrival case the prune exists
    // for: opened files track the BATCH, not the index)
    def probe(label: String, b: org.apache.spark.sql.DataFrame): Unit = {
      val bb = Dedup.bucketsFor(b).persist()
      val nHashes = bb.count()
      // the scale-true pruning RECEIPT, independent of the cost gate:
      // what the prune admits when it runs (the O(batch + collisions)
      // claim's file counts)
      val (pred, keys) = DynamicFilter.taggedKeyPrune(spark, idx, "band_hash",
        bb.select(col("band_id"), col("band_hash"), col("doc_id").as("doc_b")),
        "band_hash", dimTagCol = "band_id", factTagCol = "band",
        maxKeys = 10000)
      val kept = Snapshots.entriesAll(idx).count(pred)
      val mode = if (keys.isDefined) "inlist" else "range"
      val gated = DynamicFilter.costGateSkips(idx, DynamicFilter.DefaultMinFiles)
      // the OPERATOR wall: probeIndex as dd15 ships it — under the r14
      // cost gate this index (135 files < DefaultMinFiles) takes the
      // plain join, which the r13 crossover measurement showed is the
      // cheaper arrival at this layout
      val (nOp, tOp) = timed(Dedup.probeIndex(spark, idx, bb).count())
      // the forced-prune wall, for the crossover comparison
      val (nPruned, tPruned) = timed(
        Dedup.probeIndex(spark, idx, bb, minFiles = 0).count())
      val full = bb
        .select(col("band_id"), col("band_hash"), col("doc_id").as("doc_b"))
        .join(Snapshots.read(spark, idx)
            .select(col("band_id"), col("band_hash"), col("doc_id").as("doc_a")),
          Seq("band_id", "band_hash"))
        .select("doc_a", "doc_b").dropDuplicates("doc_a", "doc_b")
      val (nFull, tFull) = timed(full.count())
      println(f"[dd15] $label%-6s indexFiles=$total%4d probedFiles=$kept%4d " +
        f"($mode, $nHashes%6d batch bucket rows, costGate=" +
        (if (gated) "skip" else "prune") +
        f") | operatorProbe=$tOp%6.2fs forcedPrune=$tPruned%6.2fs " +
        f"fullScanJoin=$tFull%6.2fs | candidates op=$nOp pruned=$nPruned " +
        f"full=$nFull " +
        (if (nPruned == nFull && nOp == nFull) "(equal)" else "(MISMATCH!)"))
      bb.unpersist()
    }
    probe("bulk", batchSh)                                   // 2%
    probe("point", sh.filter(col("doc_id") % 2000 === 0))    // ~0.05%
    spark.stop()
  }
}
