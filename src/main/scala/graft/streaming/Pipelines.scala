package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming pipelines — the reference's E1 ingest path
  * (`binance_ws_to_kafka.py` → `kafka_to_s3_bronze.py`) as one continuous
  * query, plus the stateful capability upgrades (watermarked windows,
  * streaming dedup, foreachBatch incremental merge).
  *
  * Semantics vs the reference (SURVEY §2.8):
  *   - T1 micro-batching: trigger-driven (AvailableNow for tests/backfill,
  *     ProcessingTime("5 seconds") live — the reference's flush interval).
  *   - T2 delivery: checkpoint + file-sink log give exactly-once to the
  *     parquet sink, strictly stronger than the reference's
  *     at-least-once manual-commit loop.
  *   - T4/T5: partition values derive per-row from event time (fixing the
  *     reference's first-row mis-filing bug), and late data is handled by
  *     explicit watermarks instead of being silently mis-filed/dropped.
  */
object Pipelines {

  /** Wire schema of the Kafka JSON envelope (ts as int64 epoch-nanos —
    * the producer contract, independent of the parquet fixture's
    * encoding; see kafkaSource). */
  val rawEventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** S1/S2 stand-in: file-stream source over the events table with the
    * same normalization as the batch catalog. `ts` is TimestampType
    * (UTC) — streaming state (watermarks) wants an instant. `glob`
    * defaults to the fixture layout (one named file per table in the SF
    * dir); specs streaming their own part-files pass "*.parquet".
    *
    * The file source needs a user-supplied schema, and the fixture's ts
    * encoding changed between driver vintages (int64 nanos vs native
    * micros — see Tables.eventsTsIsRawNanos), so probe the footers once
    * with a batch read and branch the normalization on what's actually
    * there. */
  def eventsStream(spark: SparkSession, sfDir: String,
      glob: String = "events.parquet"): DataFrame = {
    val fileSchema =
      spark.read.option("pathGlobFilter", glob).parquet(sfDir).schema
    val s = spark.readStream
      .schema(fileSchema)
      .option("pathGlobFilter", glob) // file source needs a dir
      .parquet(sfDir)
    fileSchema("ts").dataType match {
      case LongType => s.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => s.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** P1–P3 bronze projection: envelope-validity filter, type filter is a
    * no-op on fixtures (all rows are events), flatten/rename + event-time
    * partition columns. */
  def bronzeProjection(stream: DataFrame): DataFrame =
    stream
      .filter(col("event_id").isNotNull && col("ts").isNotNull)
      .select(
        col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"),
        to_date(col("ts")).as("event_date"),
        hour(col("ts")).as("event_hour"))

  /** E1: streaming bronze ingest → event-time partitioned parquet with
    * checkpointed exactly-once delivery (S9 + T1–T5).
    *
    * The stream is repartitioned on the partition columns before the
    * sink: without it every source task writes its own file into every
    * hour directory it touches (tasks × partitions files per batch —
    * the classic streaming small-files problem; measured 1440 files
    * for 720 hour-partitions even from a 2-split source, and a
    * 1000-executor ingest would write ~1000× per directory). With the
    * exchange, each hour is owned by one task per batch → one file,
    * and downstream partition-pruned readers stat 720 files, not
    * hundreds of thousands. */
  def bronzeIngest(spark: SparkSession, sfDir: String, outDir: String,
      checkpointDir: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    bronzeProjection(eventsStream(spark, sfDir))
      // Explicit partition count (r17): with a bare repartition(cols),
      // AQE (on for STATELESS streaming in Spark 4) coalesces the
      // exchange to ~64 MB blocks — measured 3 writer tasks serially
      // writing 240 hour-files EACH at sf0.1 (4.7 s of the 5.0 s drain
      // was addBatch). The advisory size is blind to the per-writer
      // fan-out of a partitionBy sink (one file per owned hour). Pinning
      // cluster parallelism keeps one writer per core; hash(date, hour)
      // still maps each hour to exactly one task → one file per hour.
      // shuffle.partitions, not defaultParallelism (r17 ADVICE): the
      // latter snapshots whatever executors are registered at
      // plan-build time — under dynamic allocation a near-empty cluster
      // pins the writer width for the stream's whole lifetime; the conf
      // is the operator-declared, scale-parameterised target
      // (cpus-derived locally, cluster-sized in production).
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("event_date"), col("event_hour"))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("event_date", "event_hour")
      .trigger(trigger)
      .outputMode("append")
      .start()

  /** Watermarked tumbling hourly aggregate (streaming form of
    * EventTime.tumblingHourly — same expressions, same results). */
  def hourlyAgg(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Watermarked streaming dedup on the unique key (A4 streaming form).
    * `dropDuplicatesWithinWatermark`, not plain `dropDuplicates`: with
    * key-only dedup columns the classic operator never evicts its state
    * (eviction requires the event-time column in the keys), so its state
    * store grows with every distinct key ever seen — a slow-motion OOM on
    * an unbounded stream. The WithinWatermark form expires a key's state
    * once the watermark passes its first-seen event time, bounding state
    * to the horizon while keeping at-most-once emission per key among
    * events that arrive within it (duplicates straddling more than the
    * horizon are late data by definition). */
  def dedupStream(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Session windows per user with a 30-minute gap (streaming form of
    * EventTime.sessionWindows). */
  def sessionAgg(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n"), col("sum_value"))

  /** S1/S2: the live Kafka source — schema-asserted JSON values keyed by
    * symbol, `startingOffsets=earliest` ≅ the reference consumer's
    * `auto.offset.reset` (`kafka_to_s3_bronze.py:20-27`); offset progress
    * lives in the checkpoint, replacing manual commits. (Compile-level
    * wiring: this environment has no broker — the file-stream source
    * above is the tested stand-in with identical downstream semantics.) */
  def kafkaSource(spark: SparkSession, servers: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(
        col("key").cast("string").as("symbol_key"),
        from_json(col("value").cast("string"),
          org.apache.spark.sql.types.StructType(rawEventsSchema.fields)).as("e"))
      .select(col("symbol_key"), col("e.*"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** S8: the keyed, compact-JSON Kafka sink
    * (`binance_ws_to_kafka.py:36-43`); checkpointing makes delivery
    * effectively exactly-once into an idempotent downstream. */
  def kafkaSink(df: DataFrame, servers: String, topic: String,
      checkpointDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.select(
        lower(col("event_type")).as("key"),
        to_json(struct(df.columns.map(col): _*)).as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)

  /** Stream-stream join (SURVEY §2.8 capability row): purchases joined to
    * the same user's clicks within the preceding hour. Both sides are
    * watermarked so Spark bounds the join state: a click older than
    * (watermark − 1 h) can never match and is evicted — the property that
    * keeps state finite on an unbounded 100 TB/day stream. */
  def clickPurchaseJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = eventsStream(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "10 minutes")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "10 minutes")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") <= col("purchase_ts"))
  }

  /** Stream-static enrichment join — the dim-lookup every streaming
    * pipeline runs (events against a slowly-changing reference table).
    * Stateless: the static side broadcasts per micro-batch (a re-read
    * picks up dim updates between batches), no watermark or state store
    * involved — at 100 TB/day the stream side never shuffles for this
    * join. */
  def enrichStream(stream: DataFrame, dim: DataFrame): DataFrame =
    stream.join(broadcast(dim), Seq("event_type"), "left_outer")

  /** S14 streaming form: foreachBatch incremental upsert into an
    * event_date-partitioned parquet target. Per micro-batch:
    *   1. dedup the batch on the unique key;
    *   2. read back ONLY the event_date partitions the batch touches —
    *      the date set is collected (bounded by the batch's event-time
    *      span, i.e. O(days), never O(rows)) and applied as a static
    *      `isin` filter, so the scan is partition-pruned at planning;
    *   3. last-write-wins merge where the incoming batch beats the
    *      target on matched keys (MERGE WHEN MATCHED → UPDATE);
    *   4. bin-packed compaction: each touched date is rewritten as
    *      O(⌈rows/target⌉) files — `repartition(date, bucket)` clusters
    *      each date's rows onto ⌈rows/target⌉ writers (per-date row
    *      counts are an O(days) driver read off the already-materialized
    *      merge; hot dates fan out in parallel — NOT a coalesce(1)),
    *      and `maxRecordsPerFile` caps any single task's file size as
    *      the layout-independent backstop (AQE may coalesce small
    *      shuffles; skew may unbalance buckets). File counts are
    *      bounded by partition SIZE, never by how many micro-batches
    *      have touched the partition — without this the merge shuffle
    *      leaks its task layout as small files into every touched date
    *      each batch, the classic streaming small-file death at 100 TB;
    *   5. dynamic-partition-overwrite of the touched partitions alone.
    * Cost per batch is O(touched partitions), not O(target) — the
    * property that keeps an ever-growing 100 TB fact mergeable. The
    * existence probe uses the Hadoop FileSystem API (S3/HDFS-correct,
    * not java.io.File), and the merged frame is localCheckpoint-ed to
    * cut lineage so the overwrite never reads its own output path. */
  def incrementalMergeStream(spark: SparkSession, stream: DataFrame,
      targetDir: String, checkpointDir: String,
      targetRowsPerFile: Long = 1L << 20): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.expressions.Window
        val incoming = batch
          .withColumn("src_batch", lit(batchId))
          .withColumn("event_date", to_date(col("ts")))
          .dropDuplicates("event_id")
        val merged = if (BatchIO.nonEmptyDir(spark, targetDir)) {
          val touched = incoming.select("event_date").distinct()
            .collect().map(_.getDate(0)).toSeq
          val existing = spark.read.parquet(targetDir)
            .filter(col("event_date").isInCollection(touched))
          val w = Window.partitionBy("event_id")
            .orderBy(col("is_incoming").desc, col("src_batch").desc, col("ts").desc)
          existing.withColumn("is_incoming", lit(0))
            .unionByName(incoming.withColumn("is_incoming", lit(1)))
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1)
            .drop("rn", "is_incoming")
        } else incoming
        val mat = merged.localCheckpoint(true)
        // bin-packing: buckets-per-date from the checkpointed blocks
        // (no recompute), then repartition on (date, bucket) so each
        // date writes ⌈rows/target⌉ files regardless of batch history
        val dateBuckets = mat.groupBy("event_date").count()
          .collect().map(r => (r.getDate(0),
            math.max(1L, (r.getLong(1) + targetRowsPerFile - 1) / targetRowsPerFile)))
        val bucketsDf = broadcast(
          spark.createDataFrame(dateBuckets.toSeq).toDF("event_date", "n_buckets"))
        val packed = mat.join(bucketsDf, Seq("event_date"))
          .withColumn("file_bucket", pmod(hash(col("event_id")), col("n_buckets")))
          // explicit count for the same AQE-coalesce reason as
          // bronzeIngest: keep one writer task per core; (date, bucket)
          // still lands whole on one task, so file sizing is unchanged
          // conf-derived width, not the build-time defaultParallelism
          // snapshot (r17 ADVICE — same reasoning as bronzeIngest)
          .repartition(mat.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
            col("event_date"), col("file_bucket"))
          .drop("file_bucket", "n_buckets")
        // conf on the session the WRITE reads it from — packed's own
        // (see BatchIO.withDynamicPartitionOverwrite's session note)
        BatchIO.withDynamicPartitionOverwrite(packed.sparkSession) {
          packed.write.mode("overwrite")
            .option("maxRecordsPerFile", targetRowsPerFile)
            .partitionBy("event_date").parquet(targetDir)
        }
        ()
      }
      .start()
}
