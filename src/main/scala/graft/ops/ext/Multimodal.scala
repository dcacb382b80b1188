package graft.ops.ext

import graft.engine.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted in distributed batches.
  *
  * The container has no image/audio codecs, so `StubCodec` is a
  * clearly-marked deterministic fake — but everything Spark-side is real:
  * the binary column representation, the typed Dataset schema, the
  * per-partition batched decode (the Scala analog of `mapInPandas` — one
  * codec instance per partition, streamed rows, no per-row setup), and
  * the partition sizing that keeps a 100 TB media table from producing
  * executor-OOM batches (`spark.sql.files.maxPartitionBytes` + binary
  * column pruning: metadata-only queries never touch the bytes).
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, mime: String, content: Array[Byte])
  final case class DecodedRow(
      doc_id: Long, mime: String, width: Int, height: Int,
      n_frames: Int, feat_mean: Double)

  /** STUB: stands in for a real media codec (libjpeg/ffmpeg binding).
    * Deterministic pure function of the bytes so tests can assert
    * reproducibility; the real implementation would decode pixels and
    * run the feature extractor here, same signature, same batching. */
  object StubCodec {
    def decode(mime: String, bytes: Array[Byte]): (Int, Int, Int, Double) = {
      val n = bytes.length
      val width = 64 + (n % 577)
      val height = 64 + ((n / 7) % 417)
      val frames = if (mime.startsWith("video")) 1 + (n % 16) else 1
      var acc = 0.0
      var i = 0
      while (i < n) { acc += (bytes(i) & 0xff) / 255.0; i += 1 }
      val featMean = if (n == 0) 0.0 else acc / n
      (width, height, frames, featMean)
    }
  }

  /** The media table derived from documents: text bytes standing in for
    * encoded media payloads (binary column + mime metadata). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents.select(
      col("doc_id"),
      concat(lit("image/fake-"), col("lang")).as("mime"),
      col("text").cast("binary").as("content"))

  /** mm1 (oracle-checked): binary column metadata — byte length plus
    * deterministic derived dimensions; proves binary representation
    * parity with the oracle's BLOB encoding. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(
        col("doc_id"), col("mime"),
        length(col("content")).cast("bigint").as("n_bytes"),
        (length(col("content")) % 640).cast("bigint").as("fake_width"),
        (length(col("content")) % 480).cast("bigint").as("fake_height"))
      .orderBy("doc_id")

  val binaryMetaOracle: String =
    """SELECT doc_id, 'image/fake-' || lang AS mime,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
      |  CAST(octet_length(encode(text)) % 480 AS BIGINT) AS fake_height
      |FROM documents ORDER BY doc_id""".stripMargin

  /** mm2 (rows-only): the distributed decode pass — typed Dataset through
    * a per-partition codec, exactly the shape a real image/audio feature
    * extractor runs as. Deterministic via StubCodec; MultimodalSpec
    * asserts run-to-run equality. */
  def decodeStub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = mediaTable(spark, dir).as[MediaRow]
    media.mapPartitions { rows =>
      // one codec per partition: real codecs have expensive init
      val codec = StubCodec
      rows.map { m =>
        val (w, h, f, feat) = codec.decode(m.mime, m.content)
        DecodedRow(m.doc_id, m.mime, w, h, f, feat)
      }
    }.toDF().orderBy("doc_id")
  }

  /** Frame sampling for video-like payloads: every k-th frame offset,
    * computed as an array column without exploding the binary. */
  def frameSample(spark: SparkSession, dir: String, stride: Int = 4): DataFrame =
    mediaTable(spark, dir)
      .withColumn("n_frames", (length(col("content")) % 64 + 1).cast("int"))
      .withColumn("sampled_frames",
        expr(s"transform(sequence(0, cast((n_frames - 1) / $stride as int)), i -> i * $stride)"))
      .select("doc_id", "n_frames", "sampled_frames")

  /** Characters per manifest chunk (mm3). */
  val ChunkChars = 256

  /** mm3: content-addressable chunk manifest — the "store giant media
    * payloads as hashed fixed-size chunks" pattern (dedup at chunk
    * granularity, ranged fetches, integrity checks). One explode of the
    * chunk-index range + a narrow slice-and-hash projection; the payload
    * is never shuffled whole. Spark slices `binary` natively with the
    * same expressions; the oracle engine cannot slice BLOBs, so the
    * fixture manifest chunks the text payload by characters — identical
    * operator shape, hash-comparable output. Empty docs get one empty
    * chunk so every doc appears in the manifest. */
  def chunkManifest(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .withColumn("n_chunks",
        expr(s"greatest(cast(ceil(length(text) / $ChunkChars.0) as int), 1)"))
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(0, n_chunks - 1)")).as("chunk_id"))
      .withColumn("chunk", expr(s"substring(text, chunk_id * $ChunkChars + 1, $ChunkChars)"))
      .select(
        col("doc_id"), col("chunk_id").cast("bigint").as("chunk_id"),
        length(col("chunk")).cast("bigint").as("chunk_chars"),
        md5(col("chunk").cast("binary")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")

  val chunkManifestOracle: String =
    s"""SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
      |  CAST(length(substring(text, chunk_id * $ChunkChars + 1, $ChunkChars)) AS BIGINT) AS chunk_chars,
      |  md5(substring(text, chunk_id * $ChunkChars + 1, $ChunkChars)) AS chunk_md5
      |FROM (
      |  SELECT doc_id, text,
      |    unnest(range(0, greatest(CAST(ceil(length(text) / $ChunkChars.0) AS INTEGER), 1))) AS chunk_id
      |  FROM documents
      |)
      |ORDER BY doc_id, chunk_id""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("mm1_binary_meta", binaryMetaOracle)(binaryMeta),
    QueryDef.rowsOnly("mm2_decode_stub")(decodeStub),
    QueryDef.sql("mm3_chunk_manifest", chunkManifestOracle)(chunkManifest))
}
