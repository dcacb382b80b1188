package graft.tools

import graft.engine.Graft
import graft.ops.lake.{ChangeApply, Mutations, Snapshots}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CDC cancellation WIDTH probe (builder QA, r12): the row-tracking
  * round moved the carry-over cancellation from a groupBy KEYED ON
  * FULL ROW CONTENT to (commit, 128-bit canonical-JSON fingerprint)
  * keys. This probe measures the claim on wide documents — the LLM
  * corpus shape where the old key was ~2 KB of text per row:
  *
  *   A) the r12 fingerprint cancellation ([[ChangeApply.realChanges]]);
  *   B) the r11 shape, reconstructed inline: groupBy over every data
  *      column + commit (content-width grouping keys).
  *
  * Both run over the SAME cached feed: a corpus table whose COW update
  * of a handful of rows re-stated every surviving row of the touched
  * files as a carry-over pair. Same output rows (the update
  * survivors); the difference is what the aggregate sorts/hashes.
  *
  * MEASURED CONCLUSION (r12, recorded honestly): at 6k–31k feed rows ×
  * 2–8 KB docs the two shapes are WALL-CLOCK EQUIVALENT (0.83–0.92×,
  * i.e. parity within noise) — whole-stage codegen hashes wide
  * UnsafeRow grouping keys about as fast as it hashes fingerprints,
  * and the shuffled BYTES are identical either way (shape A carries
  * content as payload, shape B as key). The fingerprint form is kept
  * for what it enables, not for speed: `_row_id` lineage rides through
  * the cancellation (content-keys can't carry it as a key), map
  * columns group soundly, and a sort-based aggregation fallback (spill
  * regime, not reachable at fixture scale) compares 24-byte keys
  * instead of documents. An earlier whole-row `to_json` variant DID
  * regress (~1.5× slower at 2 KB docs) and was replaced by per-column
  * seeded hashes with JSON only on struct/array columns.
  */
object CdcWidthProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(40000)
    val docChars = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val spark = Graft.configure(
      SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val src = Graft.freshDir("probe-cdcw-src")
    // wide corpus rows: doc_id-keyed, one day tag per 8k docs, ~docChars
    // of text each (deterministic content — no RNG in probes)
    val filler = "lorem-ipsum-dolor-sit-amet-"
    val docs = spark.range(nDocs.toLong)
      .select(col("id").as("doc_id"),
        concat(lit("d"), (col("id") % 5).cast("string")).as("day"),
        concat_ws("", typedLit(Seq.fill(docChars / filler.length)(filler)))
          .as("base"))
      .select(col("doc_id"), col("day"),
        concat(col("base"), col("doc_id").cast("string")).as("text"))
    Snapshots.commitAll(src, Snapshots.stageWithStats(
      docs, src, "day", "doc_id"))                                    // v1
    // COW update of 10 scattered keys: every touched file's surviving
    // rows re-state as carry-over pairs — the cancellation's input is
    // ~2 files of wide documents, its output 10 update pairs
    Mutations.updateWhere(spark, src, col("doc_id") % (nDocs / 10) === 7L,
      Map("text" -> lit("rewritten")), "day")                         // v2

    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val n = f; (n, (System.nanoTime() - t0) / 1e9)
    }
    def run5(f: => Long): (Long, Double) = {
      timed(f) // warm
      val rs = Seq.fill(5)(timed(f))
      (rs.head._1, rs.map(_._2).sorted.apply(2))
    }

    // the CACHED feed isolates the measurement: both shapes aggregate
    // the same materialized rows, so the timings compare the
    // cancellation stage alone, not the (shared) changed-file reads
    val feed = Snapshots.changesAttributed(spark, src, 1, 2).persist()
    val feedRows = feed.count()
    val dataCols = feed.columns
      .filterNot(Seq("_change_type", "_commit_version", "_row_id").contains).toSeq
    val sgn = sum(when(col("_change_type") === "insert", 1).otherwise(-1)).as("__net")

    // A: the shipped fingerprint shape (per-column seeded hashes — the
    // production expressions from ChangeApply.realChanges)
    val parts1 = dataCols.zipWithIndex.map { case (c, i) => xxhash64(lit(i), col(s"`$c`")) }
    val parts2 = dataCols.zipWithIndex.map { case (c, i) => xxhash64(lit(-1 - i), col(s"`$c`")) }
    val (nA, tA) = run5(
      feed.withColumn("__h1", xxhash64(parts1: _*))
        .withColumn("__h2", xxhash64(parts2: _*))
        .groupBy(col("_commit_version"), col("__h1"), col("__h2"))
        .agg(sgn, first(struct(dataCols.map(c => col(s"`$c`")): _*)).as("__row"))
        .filter(col("__net") =!= 0)
        .queryExecution.toRdd.count())

    // B: the r11 shape — content-width grouping keys
    val (nB, tB) = run5(
      feed.groupBy((dataCols :+ "_commit_version").map(c => col(s"`$c`")): _*)
        .agg(sgn)
        .filter(col("__net") =!= 0)
        .queryExecution.toRdd.count())

    // and the end-to-end production path for context (feed re-derived)
    val (nE, tE) = run5(
      ChangeApply.realChanges(spark, src, 1, 2, Seq("doc_id"))
        .queryExecution.toRdd.count())

    println(f"[cdc-width] docs=$nDocs%7d chars=$docChars%5d feedRows=$feedRows%7d | " +
      f"agg fingerprint: rows=$nA%5d t=$tA%6.3fs | agg contentKeys(r11): rows=$nB%5d t=$tB%6.3fs " +
      f"(${tB / tA}%4.2fx) | realChanges e2e: rows=$nE%5d t=$tE%6.3fs")
    feed.unpersist()
    spark.stop()
  }
}
