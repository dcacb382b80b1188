package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental corpus ingest with exact dedup against the ACCUMULATED
  * fingerprint history — the ingest-side hygiene that keeps a growing
  * training corpus free of re-crawled duplicates without ever
  * re-scanning the corpus itself. Per micro-batch:
  *
  *   1. fingerprint incoming docs (md5 of whitespace-normalized
  *      lowercase text — dd1's exact-dedup key);
  *   2. canonicalize within the batch (min doc_id per fingerprint);
  *   3. anti-join against the persistent fingerprint STORE — the only
  *      state this pipeline keeps: one row per fingerprint ever
  *      admitted. O(corpus-distinct) but append-only, id-width rows,
  *      and bucketable by fingerprint prefix at 100 TB — the corpus
  *      (with its text payloads) is never re-read;
  *   4. write survivors to the corpus and their fingerprints to the
  *      store, both `partitionBy(ingest_batch)` under DYNAMIC partition
  *      overwrite — a replayed batch rewrites exactly its own partition,
  *      so delivery is idempotent (exactly-once) end to end, same
  *      discipline as [[Pipelines.incrementalMergeStream]].
  *
  * The anti-join shuffles only fingerprints (never text); with the
  * store bucketed on the fingerprint the exchange disappears entirely.
  * StreamingSpec drives two batches with cross-batch duplicates plus a
  * same-checkpoint replay and asserts the corpus stays exactly the
  * distinct-canonical set.
  */
object CorpusIngest {

  /** dd1's normalized-text fingerprint. */
  def fingerprinted(df: DataFrame): DataFrame =
    df.withColumn("fingerprint",
      md5(regexp_replace(lower(col("text")), "\\s+", " ").cast("binary")))

  def ingest(spark: SparkSession, stream: DataFrame,
      corpusDir: String, storeDir: String, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("fingerprint").orderBy("doc_id")
        val canon = fingerprinted(batch)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
        val fresh = (if (BatchIO.nonEmptyDir(spark, storeDir))
            // exclude THIS batch's own store partition from the anti-join:
            // a replay after a partially-committed store write would
            // otherwise see its own earlier fingerprints, admit only the
            // remainder, and the dynamic overwrite below would replace
            // the batch's corpus partition with that subset — dropping
            // documents forever. Filtering ingest_batch != batchId makes
            // the replay recompute the full batch (idempotent).
            canon.join(
              spark.read.parquet(storeDir)
                .filter(col("ingest_batch") =!= batchId)
                .select("fingerprint"),
              Seq("fingerprint"), "left_anti")
          else canon)
          // materialize once: both writes below reuse it, and the store
          // write must not re-plan an anti-join against its own output
          .localCheckpoint(true)
        // conf on the session the write reads it from (fresh rides the
        // micro-batch clone — see BatchIO.withDynamicPartitionOverwrite)
        BatchIO.withDynamicPartitionOverwrite(fresh.sparkSession) {
          fresh.withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite").partitionBy("ingest_batch").parquet(corpusDir)
          fresh.select("fingerprint").withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite").partitionBy("ingest_batch").parquet(storeDir)
        }
        ()
      }
      .start()
}
