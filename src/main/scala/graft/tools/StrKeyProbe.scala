package graft.tools

import graft.engine.{Graft, Tables}
import graft.ops.lake.{ChangeApply, Mutations, Snapshots}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** STRING-key candidate-pruning probe (builder QA, r12): the r11
  * verdict's note was that doc_id-keyed corpora — exactly what an LLM
  * pipeline mirrors — paid a FULL footer-candidate scan on every CDC
  * catch-up because the key-bounds prune only understood numeric keys.
  * With the typed dispatch (`smin./smax.` unsigned-UTF-8 stats) a
  * catch-up's candidate set should track the CHANGED keys' range, not
  * the table. This probe builds a scale-true corpus table keyed on a
  * string doc id, mutates a narrow key band, and counts:
  *
  *   - candidate files the typed prune keeps (to scan for touched
  *     rows) vs total files — the r11 shape kept ALL of them;
  *   - the end-to-end catch-up time for a string-keyed SCD1 mirror.
  */
object StrKeyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.configure(
      SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val src = Graft.freshDir("probe-strkey-src")
    val tgt = Graft.freshDir("probe-strkey-tgt")
    // scale-true layout: the documents table re-keyed on a zero-padded
    // STRING doc id (lexicographic == numeric order), range-clustered
    // on it so per-file smin./smax. stats are selective
    val docs = Tables(spark, dir).documents
      .select(format_string("doc-%08d", col("doc_id")).as("did"),
        concat(lit("s"), (col("doc_id") % 8).cast("string")).as("source"),
        col("text"))
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      docs, src, "source", "did", buckets = 32))
    val total = Snapshots.entriesAll(src).size

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tBoot) = timed(
      ChangeApply.mirror(spark, tgt, src, Seq("did"), "source"))

    // narrow mutation: a contiguous doc-id band (~1/64 of the key space)
    import spark.implicits._
    val loK = "doc-00001000"; val hiK = "doc-00001400"
    Mutations.updateWhere(spark, src,
      col("did").between(loK, hiK), Map("text" -> lit("edited")), "source")

    // the typed prune's candidate set for exactly that band
    val band = Seq((loK, "x"), (hiK, "x")).toDF("did", "v")
    val keep = Mutations.keyBoundsCandidates(band, tgt, "did")
    val kept = Snapshots.entriesAll(tgt).count(keep)
    val tgtTotal = Snapshots.entriesAll(tgt).size

    val (_, tCatch) = timed(
      ChangeApply.mirror(spark, tgt, src, Seq("did"), "source"))
    val (_, tIdle) = timed(
      ChangeApply.mirror(spark, tgt, src, Seq("did"), "source"))

    println(f"[strkey] srcFiles=$total%4d bootstrap=$tBoot%6.2fs | " +
      f"string-band candidates: $kept%3d/$tgtTotal%3d target files " +
      f"(r11 shape kept $tgtTotal/$tgtTotal) | catchUp=$tCatch%6.2fs " +
      f"idlePoll=$tIdle%6.3fs")
    spark.stop()
  }
}
