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

  /** Frame-sampling stride (mm5). */
  val FrameStride = 4

  /** mm5: the frame-sampling MANIFEST — `frameSample`'s array exploded
    * to one row per (payload, sampled frame), the driving table for a
    * distributed frame-extraction pass (each row is one independent
    * decode task; the payload column stays behind and is range-fetched
    * by chunk, mm3). Pure per-row arithmetic — zero shuffle before the
    * presentation sort. */
  def frameManifest(spark: SparkSession, dir: String): DataFrame =
    frameSample(spark, dir, FrameStride)
      .select(col("doc_id"), col("n_frames").cast("bigint").as("n_frames"),
        explode(col("sampled_frames")).as("frame_idx"))
      .withColumn("frame_idx", col("frame_idx").cast("bigint"))
      .orderBy("doc_id", "frame_idx")

  val frameManifestOracle: String =
    s"""SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
      |       CAST(i * $FrameStride AS BIGINT) AS frame_idx
      |FROM (
      |  SELECT doc_id, octet_length(encode(text)) % 64 + 1 AS n_frames
      |  FROM documents
      |), LATERAL unnest(range(0, (n_frames - 1) // $FrameStride + 1)) t(i)
      |ORDER BY doc_id, frame_idx""".stripMargin

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

  /** Signature bits / banding chunks / hamming threshold for mm4 (same
    * pigeonhole guarantee as dd4: hamming ≤ 3 ⇒ ≥ 1 of 4 15-bit chunks
    * identical). */
  val PhashBits = 60
  val PhashHamMax = 3

  /** Content-defined sampling modulus: a shingle is a feature iff its
    * hash ≡ 0 (mod 4). Position-strided sampling would misalign after a
    * single-byte insertion (every later sample shifts); keying the
    * sample on CONTENT keeps the retained feature set stable under
    * shifts — the winnowing idea, and why near-dup payloads keep small
    * hamming distances here.
    *
    * Recall is MEASURED, not guaranteed: a signature hash concentrates
    * set similarity into hamming distance with variance (bits whose
    * ±1 sums sit near zero flip on small feature changes), so a tail
    * of genuine near-dups lands past any fixed threshold — 22/28 of
    * the fixture's planted pairs fall within hamming 3 here, and which
    * 6 miss MOVES with the sampling rate (4, 8, or no sampling all
    * leave a 4–9-hamming tail). That is inherent to SimHash-family
    * signatures, not a tuning gap; when guaranteed recall at a Jaccard
    * threshold is the requirement, the minhash band join (dd3) is the
    * right tool — this operator's value is the CONSTANT-SIZE signature
    * (one BIGINT per payload vs a signature row per band), which is
    * what media-scale stores index. */
  val PhashSampleMod = 8

  /** mm4: perceptual-hash-style near-duplicate pairing of media
    * payloads — the media half of the dedup family: a 60-bit SimHash
    * signature over content-defined byte-shingle features, banded by
    * 15-bit chunk (pigeonhole), verified by popcount. In production the
    * features are DECODED perceptual features (DCT blocks of frames,
    * mel patches of audio) — the container has no codecs, so features
    * are raw payload shingles (the fixture payload is text bytes, and
    * the oracle engine can only substring TEXT — same discipline as
    * mm3); every stage after feature extraction is the real pipeline:
    * signatures travel as single BIGINTs, candidates form by band-key
    * join (never payload-vs-payload), and payloads are never shuffled
    * at all.
    *
    * Scale: one narrow explode pass per payload (⅛ of shingles
    * survive the content-keyed sample), map-combined bit sums, a
    * 4-way band self-join on 15-bit keys, popcount verify on ≤
    * collision candidates. 100 TB of media dedups without a single
    * byte of media moving. */
  def phashPairs(spark: SparkSession, dir: String): DataFrame = {
    val bits = 0 until PhashBits
    val feats = mediaTable(spark, dir)
      .select(col("doc_id"), col("content").cast("string").as("s"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, greatest(length(s) - 7, 1)), i -> substring(s, i, 8))"))
        .as("sh"))
      .withColumn("h", expr(graft.engine.PortableHash.md5Prefix60("sh")))
      .filter(expr(s"h % $PhashSampleMod = 0"))
    val bitSums = bits.map { i =>
      sum(when(expr(s"(h >> $i) & 1") === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val sig = bits.map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L)).reduce(_ + _)
    val sigs = graft.engine.Caching.persist(
      feats.groupBy("doc_id")
        .agg(bitSums.head, bitSums.tail: _*)
        .withColumn("phash", sig)
        .select(col("doc_id"), col("phash")))
    val banded = sigs.select(col("doc_id"), col("phash"),
      explode(expr("array(" +
        (0 until 4).map(c => s"named_struct('c', $c, 'k', shiftright(phash, ${c * 15}) & 32767)")
          .mkString(",") + ")")).as("band"))
      .select(col("doc_id"), col("phash"), col("band.c").as("c"), col("band.k").as("k"))
    val a = banded.select(col("c"), col("k"), col("doc_id").as("doc_a"), col("phash").as("pa"))
    val b = banded.select(col("c"), col("k"), col("doc_id").as("doc_b"), col("phash").as("pb"))
    a.join(b, Seq("c", "k"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(pa ^ pb)").cast("bigint").as("hamming"))
      .distinct()
      .filter(col("hamming") <= PhashHamMax)
      .orderBy("doc_a", "doc_b")
  }

  lazy val phashPairsOracle: String = {
    val bitSums = (0 until PhashBits)
      .map(i => s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
      .mkString(",\n      ")
    val sig = (0 until PhashBits)
      .map(i => s"(CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    val bands = (0 until 4)
      .map(c => s"SELECT doc_id, phash, $c AS c, (phash >> ${c * 15}) & 32767 AS k FROM sigs")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH feats AS (
      |  SELECT doc_id, h FROM (
      |    SELECT doc_id,
      |      ('0x' || substring(md5(substring(text, i, 8)), 1, 15))::BIGINT AS h
      |    FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - 7, 1) + 1)) AS i
      |          FROM documents)
      |  ) WHERE h % $PhashSampleMod = 0
      |),
      |bits AS (
      |  SELECT doc_id,
      |      $bitSums
      |  FROM feats GROUP BY doc_id
      |),
      |sigs AS (SELECT doc_id, CAST($sig AS BIGINT) AS phash FROM bits),
      |banded AS (
      |  $bands
      |),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |         CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
      |  FROM banded a JOIN banded b ON a.c = b.c AND a.k = b.k AND a.doc_id < b.doc_id
      |)
      |SELECT doc_a, doc_b, hamming FROM cand
      |WHERE hamming <= $PhashHamMax ORDER BY doc_a, doc_b""".stripMargin
  }

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("mm1_binary_meta", binaryMetaOracle)(binaryMeta),
    QueryDef.rowsOnly("mm2_decode_stub")(decodeStub),
    QueryDef.sql("mm3_chunk_manifest", chunkManifestOracle)(chunkManifest),
    QueryDef.sql("mm4_phash_pairs", phashPairsOracle)(phashPairs),
    QueryDef.sql("mm5_frame_manifest", frameManifestOracle)(frameManifest))
}
