package graft.ops.ext

import graft.engine.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * ann1 is the exact baseline: broadcast the (small) query set against the
  * corpus — a broadcast-nested-loop whose inner loop is the codegen'd
  * CosineSimilarity expression. At 100 TB the corpus side stays
  * partitioned (never collected) and the scan is embarrassingly parallel.
  *
  * ann2 is the scale path: random-hyperplane LSH (4 tables × 8 bits).
  * Bucket ids are computed in one narrow pass; the candidate join touches
  * only same-bucket rows, so the similarity work drops from O(|q|·n) to
  * O(|q|·n/2^bits·tables) at the cost of recall (bounded in the spec).
  */
object Similarity {

  val Dim: Int = graft.functions.HyperplaneBuckets.Dim
  // 8 tables × 6 bits: for near-orthogonal 64-dim data, a true neighbor
  // at cos≈0.45 hits P(bit)≈0.66 → ≈0.08/table → ≈0.5 recall over 8
  // tables, while random vectors collide at 0.5^6 → ~11% of the corpus
  // becomes candidates — an ~9× cost reduction per recall point that
  // improves as dimensionality concentrates real corpora.
  val Tables_ : Int = graft.functions.HyperplaneBuckets.Tables
  val BitsPerTable: Int = graft.functions.HyperplaneBuckets.BitsPerTable

  /** Deterministic pseudo-random hyperplanes — owned by the native
    * [[graft.functions.HyperplaneBuckets]] expression; referenced here to
    * generate the bit-identical DuckDB oracle arithmetic. */
  def hyperplanes: Array[Array[Array[Double]]] = graft.functions.HyperplaneBuckets.planes

  private def queriesDf(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).embeddings.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_emb"))

  /** ann1: exact brute-force cosine top-5 per query vector. The ranking
    * stage funnels through the native [[graft.plans.GroupedTopK]]
    * operator on a narrow (q_vec_id, vec_id, cos_r) projection: the
    * scored corpus×queries rows reduce to 5-per-query survivors BEFORE
    * any exchange, instead of the window form shuffling every scored
    * row; the rank window then runs over ≤ 5·|queries| rows. */
  def bruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    val corpus = Tables(spark, dir).embeddings.filter(col("vec_id") >= 10)
    val scored = corpus.crossJoin(broadcast(queriesDf(spark, dir)))
      .withColumn("cos_r", round(expr("cosine_sim(q_emb, embedding)"), 6))
      .select("q_vec_id", "vec_id", "cos_r")
    val survivors = graft.plans.GroupedTopK(
      scored, Seq("q_vec_id"), Seq("cos_r" -> false, "vec_id" -> true), k = 5)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_vec_id").orderBy(col("cos_r").desc, col("vec_id"))
    survivors
      .withColumn("rank", row_number().over(w))
      .select(col("q_vec_id"), col("rank").cast("bigint").as("rank"),
        col("vec_id"), col("cos_r"))
      .orderBy("q_vec_id", "rank")
  }

  val bruteForceTopKOracle: String =
    """WITH q AS (SELECT vec_id AS q_vec_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.q_vec_id, c.vec_id,
      |    round(list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
      |                                 CAST(c.embedding AS DOUBLE[])), 6) AS cos_r
      |  FROM q CROSS JOIN (SELECT * FROM embeddings WHERE vec_id >= 10) c
      |)
      |SELECT q_vec_id, CAST(rank AS BIGINT) AS rank, vec_id, cos_r FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
      |                               ORDER BY cos_r DESC, vec_id) AS rank
      |  FROM scored
      |) WHERE rank <= 5 ORDER BY q_vec_id, rank""".stripMargin

  /** (vec_id, table_id, bucket) assignments — one narrow pass through the
    * native [[graft.functions.HyperplaneBuckets]] expression (the
    * generated-SQL form of these sums blew janino's 64 KB method limit
    * and knocked the whole stage out of codegen). */
  def bucketAssignments(df: DataFrame, embCol: String): DataFrame = {
    graft.functions.HyperplaneBuckets.register(df.sparkSession)
    df.select(col("*"),
      posexplode(expr(s"hyperplane_buckets($embCol)")).as(Seq("table_id", "bucket")))
  }

  /** DuckDB restatement of [[bucketExpr]] for table `t`. The weights are
    * emitted as `'…'::DOUBLE` string casts (correctly-rounded strtod —
    * a bare decimal literal would parse as DECIMAL and round-trip through
    * integer division) and the terms keep the same left-associative
    * order, so the IEEE double sum — and therefore the sign bit and
    * bucket id — is bit-identical to Spark's. */
  private def duckBucketExpr(embCol: String, t: Int): String = {
    val bits = (0 until BitsPerTable).map { p =>
      val terms = hyperplanes(t)(p).zipWithIndex
        .map { case (wgt, d) => s"$embCol[${d + 1}]::DOUBLE * '$wgt'::DOUBLE" }
        .mkString(" + ")
      s"(CASE WHEN ($terms) > 0 THEN ${1L << p} ELSE 0 END)"
    }
    bits.mkString(" + ")
  }

  /** DuckDB CASE dispatching [[duckBucketExpr]] on an unnested table_id. */
  private def duckBucketCase(embCol: String): String =
    (0 until Tables_).map(t => s"WHEN $t THEN (${duckBucketExpr(embCol, t)})")
      .mkString("CASE table_id ", " ", " END")

  /** Oracle for [[lshTopK]]: reproduces the hyperplane buckets with the
    * exact same double arithmetic, then the same candidate join and
    * ranking — ann2 is hash-compared, not rows-only. */
  lazy val lshTopKOracle: String =
    s"""WITH tabs AS (SELECT unnest(range(0, $Tables_)) AS table_id),
      |cb AS (
      |  SELECT vec_id, ${duckBucketCase("embedding")} AS bucket, table_id
      |  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 10), tabs
      |),
      |qb AS (
      |  SELECT q_vec_id, ${duckBucketCase("q_emb")} AS bucket, table_id
      |  FROM (SELECT vec_id AS q_vec_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10), tabs
      |),
      |cand AS (
      |  SELECT DISTINCT qb.q_vec_id, cb.vec_id
      |  FROM qb JOIN cb ON qb.table_id = cb.table_id AND qb.bucket = cb.bucket
      |),
      |scored AS (
      |  SELECT cand.q_vec_id, cand.vec_id,
      |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                 CAST(c.embedding AS DOUBLE[])), 6) AS cos_r
      |  FROM cand
      |  JOIN embeddings q ON q.vec_id = cand.q_vec_id
      |  JOIN embeddings c ON c.vec_id = cand.vec_id
      |)
      |SELECT q_vec_id, CAST(rank AS BIGINT) AS rank, vec_id, cos_r FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
      |                               ORDER BY cos_r DESC, vec_id) AS rank
      |  FROM scored
      |) WHERE rank <= 3 ORDER BY q_vec_id, rank""".stripMargin

  /** ann2: LSH-bucketed approximate top-3 per query. Candidates = corpus
    * vectors sharing ≥1 (table, bucket) with the query; the
    * SimilaritySpec additionally bounds recall vs ann1. */
  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    val corpus = Tables(spark, dir).embeddings.filter(col("vec_id") >= 10)
    val corpusBuckets = bucketAssignments(corpus, "embedding")
      .select(col("table_id"), col("bucket"), col("vec_id"), col("embedding"))
    val queryBuckets = bucketAssignments(queriesDf(spark, dir), "q_emb")
      .select(col("table_id"), col("bucket"), col("q_vec_id"), col("q_emb"))
    val candidates = corpusBuckets
      .join(broadcast(queryBuckets), Seq("table_id", "bucket"))
      .dropDuplicates("q_vec_id", "vec_id")
      .withColumn("cos_r", round(expr("cosine_sim(q_emb, embedding)"), 6))
      .select("q_vec_id", "vec_id", "cos_r")
    rankTop3(candidates)
  }

  /** Shared ANN ranking tail: native GroupedTopK reduces candidates to
    * 3-per-query survivors pre-exchange, then the (tiny) rank window. */
  private def rankTop3(scored: DataFrame): DataFrame = {
    val survivors = graft.plans.GroupedTopK(
      scored, Seq("q_vec_id"), Seq("cos_r" -> false, "vec_id" -> true), k = 3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_vec_id").orderBy(col("cos_r").desc, col("vec_id"))
    survivors
      .withColumn("rank", row_number().over(w))
      .select(col("q_vec_id"), col("rank").cast("bigint").as("rank"),
        col("vec_id"), col("cos_r"))
      .orderBy("q_vec_id", "rank")
  }

  val IvfCells = 16
  val IvfProbes = 2

  /** Cell assignment: nearest of the 16 deterministic centroid vectors
    * (the first 16 corpus vectors — a real build would k-means refine;
    * the query shape is identical). One broadcast of 16 centroids, one
    * narrow argmax pass — no shuffle. */
  def ivfAssignments(spark: SparkSession, dir: String, df: DataFrame,
      idCol: String, embCol: String, probes: Int): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    val centroids = Tables(spark, dir).embeddings
      .filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("cell_id"), col("embedding").as("centroid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("cell_cos").desc, col("cell_id"))
    df.crossJoin(broadcast(centroids))
      // round(…,6) before ranking: cell choice becomes engine-portable
      // (raw-double ordering could tie-break differently in the oracle)
      .withColumn("cell_cos", round(expr(s"cosine_sim($embCol, centroid)"), 6))
      .withColumn("cell_rank", row_number().over(w))
      .filter(col("cell_rank") <= probes)
      .drop("centroid", "cell_cos", "cell_rank")
  }

  /** ann3: IVF-style ANN — corpus is partitioned into centroid cells;
    * each query probes its 2 nearest cells and brute-forces only those.
    * Expected cost: probes/cells (~12%) of the brute-force scan; the
    * inverted-file layout at 100 TB is the same DataFrame written
    * partitionBy(cell_id), making a probe a partition-pruned read.
    * Rows-only; SimilaritySpec bounds recall vs ann1. */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Tables(spark, dir).embeddings.filter(col("vec_id") >= 10)
    val corpusCells = ivfAssignments(spark, dir, corpus, "vec_id", "embedding", probes = 1)
      .select(col("cell_id"), col("vec_id"), col("embedding"))
    val queryCells = ivfAssignments(spark, dir, queriesDf(spark, dir),
      "q_vec_id", "q_emb", probes = IvfProbes)
      .select(col("cell_id"), col("q_vec_id"), col("q_emb"))
    rankTop3(corpusCells
      .join(broadcast(queryCells), Seq("cell_id"))
      .withColumn("cos_r", round(expr("cosine_sim(q_emb, embedding)"), 6))
      .dropDuplicates("q_vec_id", "vec_id")
      .select("q_vec_id", "vec_id", "cos_r"))
  }

  /** ann3b: [[ivfTopK]] against a MATERIALIZED inverted-file index — a
    * [[graft.ops.lake.Snapshots]] table tagged by `cell_id`, the SAME
    * artifact lifecycle ann3c maintains incrementally: build publishes
    * one atomic snapshot commit (a reader concurrent with a rebuild
    * sees the old index XOR the new one, never a mix), probes prune at
    * the MANIFEST level (no file under an unprobed cell is ever
    * opened). The probed cell list is collected to the driver — ≤
    * queries × probes values, O(1) metadata, the same list a vector DB
    * ships to its router. Output is identical to ann3 (same assignment,
    * same ranking), so it shares ann3's oracle. At 100 TB this is the
    * difference between scanning the corpus per query batch and reading
    * probes/cells ≈ 12% of it.
    *
    * Build once, reuse on subsequent invocations — UNLESS the source
    * corpus changed (the index dir outlives the JVM, and serving a
    * stale index after a fixture regeneration would fail the oracle
    * compare mysteriously / bench the wrong data). Staleness is decided
    * by a CONTENT MANIFEST (per-file name|size|mtime of the source dir)
    * recorded at build time, not a newest-mtime comparison: a source
    * restored with preserved or older mtimes (`cp -p`, archive unpack,
    * cache restore) still flips the manifest, while pure mtime ordering
    * would silently serve the old index. */
  def ivfIndexedTopK(spark: SparkSession, dir: String): DataFrame = {
    val table = graft.engine.Graft.tmpDir(
      "ann3b-ivf-" + dir.replaceAll("[^A-Za-z0-9.]", "_"))
    val manifestFile = new java.io.File(table, "_GRAFT_SRC_MANIFEST")
    val current = srcManifest(new java.io.File(s"$dir/embeddings.parquet"))
    val recorded =
      if (manifestFile.exists())
        new String(java.nio.file.Files.readAllBytes(manifestFile.toPath), "UTF-8")
      else ""
    if (recorded != current ||
        graft.ops.lake.Snapshots.currentVersion(table) == 0) {
      def wipe(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(wipe)
        f.delete()
      }
      wipe(new java.io.File(table)); new java.io.File(table).mkdirs()
      buildIvfIndex(spark, dir, table)
      java.nio.file.Files.write(manifestFile.toPath, current.getBytes("UTF-8"))
    }
    probeIvfIndex(spark, dir, table)
  }

  /** ann3c: INCREMENTAL index maintenance — the piece ann3b's
    * build-once lifecycle is missing at 100 TB: when the corpus grows,
    * rebuilding the whole inverted file rereads every vector ever
    * ingested, so a daily 0.1% delta costs a full-corpus job. Because a
    * vector's cell assignment depends only on the (fixed) coarse
    * codebook — never on other corpus vectors — the delta can be
    * assigned alone and PUBLISHED AS AN ADD-ONLY SNAPSHOT COMMIT
    * ([[graft.ops.lake.Snapshots]], tag = cell_id): base index files
    * are never rewritten, readers concurrent with the upsert see the
    * old or new snapshot atomically, and the resulting index is
    * bit-identical in content to a full rebuild — which is why the
    * oracle is ann3's full-corpus query verbatim (the invariant under
    * test). Probes prune at the MANIFEST level (tag filter) before any
    * file opens. The base/delta split here is `vec_id % 3` (simulating
    * an ingest delta deterministically at every SF); SimilaritySpec
    * additionally pins the add-only property (base files byte-listed
    * unchanged across the upsert commit) and parity with ann3. */
  def ivfIncrementalTopK(spark: SparkSession, dir: String): DataFrame = {
    val table = graft.engine.Graft.tmpDir(
      "ann3c-ivf-" + dir.replaceAll("[^A-Za-z0-9.]", "_"))
    val manifestFile = new java.io.File(table, "_GRAFT_SRC_MANIFEST")
    val current = srcManifest(new java.io.File(s"$dir/embeddings.parquet"))
    val recorded =
      if (manifestFile.exists())
        new String(java.nio.file.Files.readAllBytes(manifestFile.toPath), "UTF-8")
      else ""
    // rebuild when the source changed OR the table has no readable
    // snapshot (e.g. a log-format migration left an old-layout dir
    // behind with a matching source fingerprint)
    if (recorded != current ||
        graft.ops.lake.Snapshots.currentVersion(table) == 0) {
      def wipe(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(wipe)
        f.delete()
      }
      wipe(new java.io.File(table)); new java.io.File(table).mkdirs()
      val corpus = Tables(spark, dir).embeddings.filter(col("vec_id") >= 10)
      buildIncrementalIvf(spark, dir, table,
        base = corpus.filter(col("vec_id") % 3 =!= 0),
        delta = corpus.filter(col("vec_id") % 3 === 0))
      java.nio.file.Files.write(manifestFile.toPath, current.getBytes("UTF-8"))
    }
    probeSnapshotIvf(spark, dir, table)
  }

  /** Base build (v1) + delta upsert (v2, ADD-ONLY) as two snapshot
    * commits. Split out so the spec can drive its own base/delta and
    * inspect the manifests between commits. */
  private[graft] def buildIncrementalIvf(spark: SparkSession, dir: String,
      table: String, base: DataFrame, delta: DataFrame): Unit = {
    import graft.ops.lake.Snapshots
    def assigned(df: DataFrame) =
      ivfAssignments(spark, dir, df, "vec_id", "embedding", probes = 1)
        .select(col("cell_id"), col("vec_id"), col("embedding"))
    Snapshots.commit(table, Snapshots.stage(assigned(base), table, "cell_id"))
    Snapshots.commit(table, Snapshots.stage(assigned(delta), table, "cell_id"))
  }

  /** Probe a snapshot-backed IVF index: query cells prune MANIFEST
    * LINES (no file under an unprobed cell is ever opened), then the
    * probed partitions brute-force exactly as [[probeIvfIndex]]. */
  private[graft] def probeSnapshotIvf(spark: SparkSession, dir: String,
      table: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    val queryCells = ivfAssignments(spark, dir, queriesDf(spark, dir),
      "q_vec_id", "q_emb", probes = IvfProbes)
      .select(col("cell_id"), col("q_vec_id"), col("q_emb"))
    val probed = queryCells.select("cell_id").distinct()
      .collect().map(_.getLong(0).toString).toSet
    val index = graft.ops.lake.Snapshots.read(spark, table, tagFilter = probed.contains)
    rankTop3(index
      .join(broadcast(queryCells), Seq("cell_id"))
      .withColumn("cos_r", round(expr("cosine_sim(q_emb, embedding)"), 6))
      .dropDuplicates("q_vec_id", "vec_id")
      .select("q_vec_id", "vec_id", "cos_r"))
  }

  /** Sorted `relative-path|size|mtime` lines for every file under `f` —
    * the change-detection fingerprint [[ivfIndexedTopK]] stores next to
    * the index it derives from the source. */
  private[ext] def srcManifest(f: java.io.File): String = {
    def walk(g: java.io.File): Seq[java.io.File] =
      if (g.isDirectory) Option(g.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(g)
    val base = f.toPath
    walk(f).map { g =>
      s"${base.relativize(g.toPath)}|${g.length()}|${g.lastModified()}"
    }.sorted.mkString("\n")
  }

  /** Build the IVF inverted-file artifact as a snapshot table at
    * `path`: corpus vectors assigned to their nearest centroid cell,
    * staged tagged by `cell_id` and published as ONE atomic commit.
    * This is the reusable half of the vector-DB lifecycle — built once
    * per corpus snapshot, probed by many query batches
    * ([[probeIvfIndex]]); [[ivfIndexedTopK]] composes the two with
    * build-if-absent, and [[buildIncrementalIvf]] grows the same
    * artifact with add-only delta commits (ann3c). */
  def buildIvfIndex(spark: SparkSession, dir: String, path: String): Unit = {
    import graft.ops.lake.Snapshots
    val corpus = Tables(spark, dir).embeddings.filter(col("vec_id") >= 10)
    val assigned = ivfAssignments(spark, dir, corpus, "vec_id", "embedding", probes = 1)
      .select(col("cell_id"), col("vec_id"), col("embedding"))
    Snapshots.commit(path, Snapshots.stage(assigned, path, "cell_id"))
  }

  /** Probe a prebuilt IVF snapshot index — read-only: delegates to
    * [[probeSnapshotIvf]] (shared with ann3c), which assigns the query
    * batch to its [[IvfProbes]] nearest cells and opens only the index
    * files whose manifest tag matches a probed cell. SimilaritySpec
    * asserts a repeat probe touches no index file. */
  def probeIvfIndex(spark: SparkSession, dir: String, path: String): DataFrame =
    probeSnapshotIvf(spark, dir, path)

  /** Oracle for [[ivfTopK]]: same centroid-cell assignment (ranked on
    * round(cos,6) with cell_id tie-break), same 2-probe candidate join,
    * same final ranking — ann3 is hash-compared, not rows-only. */
  lazy val ivfTopKOracle: String = {
    def cellCte(rows: String, idCol: String, probes: Int): String =
      s"""SELECT $idCol, cell_id FROM (
        |    SELECT v.vec_id AS $idCol, cent.cell_id,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        round(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
        |                                     CAST(cent.centroid AS DOUBLE[])), 6) DESC,
        |        cent.cell_id) AS rk
        |    FROM ($rows) v CROSS JOIN cent
        |  ) WHERE rk <= $probes""".stripMargin
    s"""WITH cent AS (
      |  SELECT vec_id AS cell_id, embedding AS centroid FROM embeddings WHERE vec_id < $IvfCells
      |),
      |ccell AS (
      |  ${cellCte("SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 10", "vec_id", 1)}
      |),
      |qcell AS (
      |  ${cellCte("SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10", "q_vec_id", IvfProbes)}
      |),
      |cand AS (
      |  SELECT DISTINCT qcell.q_vec_id, ccell.vec_id
      |  FROM qcell JOIN ccell ON qcell.cell_id = ccell.cell_id
      |),
      |scored AS (
      |  SELECT cand.q_vec_id, cand.vec_id,
      |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                 CAST(c.embedding AS DOUBLE[])), 6) AS cos_r
      |  FROM cand
      |  JOIN embeddings q ON q.vec_id = cand.q_vec_id
      |  JOIN embeddings c ON c.vec_id = cand.vec_id
      |)
      |SELECT q_vec_id, CAST(rank AS BIGINT) AS rank, vec_id, cos_r FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
      |                               ORDER BY cos_r DESC, vec_id) AS rank
      |  FROM scored
      |) WHERE rank <= 3 ORDER BY q_vec_id, rank""".stripMargin
  }

  // ---- k-means centroid training (the "real build would k-means
  // refine" step the IVF scaladoc promises) -------------------------

  /** Fixed-point quantization scale (2^24). Centroid means over floats
    * are accumulation-order-dependent in BOTH engines and DuckDB's
    * double→DECIMAL cast disagrees with Spark's at high scales (measured:
    * 1/3 → …333312 vs …333300), so all distance/mean arithmetic runs on
    * `floor(x · 2^24)` BIGINTs — exact, order-independent, and identical
    * cross-engine (the fixed-point-allreduce trick deterministic
    * training pipelines use). 64 dims × (2^28)² diffs stays under 2^63. */
  val KmQ: Long = 1L << 24
  val KmK = 8

  private def quantExpr(embCol: String): String =
    s"transform($embCol, x -> cast(floor(cast(x as double) * $KmQ.0D) as bigint))"

  /** One Lloyd assignment pass: nearest `probes` centroids by quantized
    * L2, cell_id tie-break (exact integer distances — no rounding
    * portability hazard). Centroids broadcast, so the distance pass is a
    * narrow scan; the only exchange is the per-vector argmin window
    * (k rows per vec_id). Keeps `dist` for SSE tracking. */
  private def kmAssign(e: DataFrame, cents: DataFrame, probes: Int = 1): DataFrame = {
    graft.functions.LongVecOps.register(e.sparkSession)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("dist"), col("cell_id"))
    e.crossJoin(broadcast(cents))
      // native codegen'd kernel — the rows × k × d Lloyd hot loop; the
      // HOF form it replaces ran the lambda interpreted per element
      .withColumn("dist", expr("quantized_l2(qe, qc)"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= probes)
      .select(col("vec_id"), col("cell_id"), col("qe"), col("dist"))
  }

  /** Per-(cluster, dim) exact integer sums for the centroid update. */
  private def kmUpdate(assigned: DataFrame): DataFrame =
    assigned.select(col("cell_id").as("cluster_id"),
        posexplode(col("qe")).as(Seq("pos", "qval")))
      .groupBy("cluster_id", "pos")
      .agg(sum("qval").as("s"), count(lit(1)).as("n"))

  /** Re-quantized centroid list from an update's long form — integer
    * floor division, never a float accumulator (see [[KmQ]]). */
  private def kmRequant(upd: DataFrame): DataFrame =
    upd.withColumn("qv", expr("cast(floor(cast(s as double) / n) as bigint)"))
      .groupBy(col("cluster_id").as("cell_id"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, qv))), p -> p.qv)").as("qc"))

  private def kmCorpus(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).embeddings
      .select(col("vec_id"), expr(quantExpr("embedding")).as("qe"))

  /** km1: one Lloyd step (assignment + centroid update) from the
    * deterministic init (the [[KmK]] lowest vec_ids — the same seed
    * centroids ann3's IVF uses). Output is the long-form centroid table
    * (cluster_id, dim, centroid_val, n_members) — array-free so the
    * oracle hash compare is scalar. [[kmeansTrain]] iterates this to
    * convergence; one step is the SQL-expressible (hence hash-compared)
    * unit. */
  def kmeansStep(spark: SparkSession, dir: String): DataFrame = {
    val e = kmCorpus(spark, dir)
    val cents = e.filter(col("vec_id") < KmK)
      .select(col("vec_id").as("cell_id"), col("qe").as("qc"))
    kmUpdate(kmAssign(e, cents))
      .select(
        col("cluster_id"),
        (col("pos") + 1).cast("bigint").as("dim"),
        round(col("s").cast("double") / col("n") / KmQ, 6).as("centroid_val"),
        col("n").cast("bigint").as("n_members"))
      .orderBy("cluster_id", "dim")
  }

  lazy val kmeansStepOracle: String =
    s"""WITH e AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $KmQ.0) AS BIGINT)) AS qe
      |  FROM embeddings
      |),
      |cent AS (SELECT vec_id AS cell_id, qe AS qc FROM e WHERE vec_id < $KmK),
      |d AS (
      |  SELECT e.vec_id, cent.cell_id,
      |    list_sum(list_transform(range(1, ${Dim + 1}),
      |      i -> (e.qe[i] - cent.qc[i]) * (e.qe[i] - cent.qc[i]))) AS dist
      |  FROM e CROSS JOIN cent
      |),
      |a AS (
      |  SELECT vec_id, cell_id FROM (
      |    SELECT vec_id, cell_id,
      |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell_id) AS rk
      |    FROM d) WHERE rk = 1
      |),
      |u AS (
      |  SELECT a.cell_id AS cluster_id, r.i AS dim,
      |         sum(e.qe[r.i]) AS s, count(*) AS n
      |  FROM a JOIN e USING (vec_id), range(1, ${Dim + 1}) AS r(i)
      |  GROUP BY 1, 2
      |)
      |SELECT cluster_id, CAST(dim AS BIGINT) AS dim,
      |       round(CAST(s AS DOUBLE) / n / $KmQ.0, 6) AS centroid_val,
      |       CAST(n AS BIGINT) AS n_members
      |FROM u ORDER BY cluster_id, dim""".stripMargin

  /** Fixed Lloyd rounds for km2 (2 keeps the unrolled oracle SQL and the
    * sf0.01 runtime modest while still exercising centroids-built-from-
    * centroids — the genuinely iterative dependency). */
  val KmTrainRounds = 2

  /** km2: the hash-compared iterative tail of [[kmeansTrain]] — exactly
    * [[KmTrainRounds]] Lloyd update rounds (assign → exact-integer
    * update → floor-requantize → re-assign …) from the same
    * deterministic init as km1. One declarative plan, no driver
    * round-trips: each round is a broadcast of the (≤ [[KmK]]-row)
    * centroid table into a narrow distance scan, an argmin window, and
    * one aggregation — the fixture's convergence behavior stays covered
    * by the spec'd adaptive trainer, while this pins the arithmetic of
    * the round-over-round composition against DuckDB. `rounds = 1`
    * degenerates to [[kmeansStep]]. */
  /** The long-form update table after exactly `rounds` Lloyd rounds —
    * shared by [[kmeansRounds]] (report form) and [[trainedCentroids]]
    * (the centroid list ann4 probes against). */
  private def kmRoundsUpdate(spark: SparkSession, dir: String, rounds: Int,
      k: Long = KmK.toLong): DataFrame = {
    require(rounds >= 1)
    val e = kmCorpus(spark, dir)
    var cents = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cell_id"), col("qe").as("qc"))
    var upd = kmUpdate(kmAssign(e, cents))
    for (_ <- 2 to rounds) {
      cents = kmRequant(upd)
      upd = kmUpdate(kmAssign(e, cents))
    }
    upd
  }

  /** Quantized centroid list after `rounds` Lloyd rounds — the trained
    * codebook ann4's inverted file is built from. `k` defaults to the
    * fixture codebook size; dd8 passes its occupancy-derived count. */
  def trainedCentroids(spark: SparkSession, dir: String,
      rounds: Int = KmTrainRounds, k: Long = KmK.toLong): DataFrame =
    kmRequant(kmRoundsUpdate(spark, dir, rounds, k))

  def kmeansRounds(spark: SparkSession, dir: String,
      rounds: Int = KmTrainRounds): DataFrame = {
    val upd = kmRoundsUpdate(spark, dir, rounds)
    upd.select(
        col("cluster_id"),
        (col("pos") + 1).cast("bigint").as("dim"),
        round(col("s").cast("double") / col("n") / KmQ, 6).as("centroid_val"),
        col("n").cast("bigint").as("n_members"))
      .orderBy("cluster_id", "dim")
  }

  private def kmDims = s"range(1, ${Dim + 1})"

  private def kmRequantCte(r: Int): String =
    s"""cent$r AS (
      |  SELECT cluster_id AS cell_id,
      |         list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) ORDER BY dim) AS qc
      |  FROM u$r GROUP BY 1
      |)""".stripMargin

  /** DuckDB CTE chain `e, cent0, d1/a1/u1 [, cent1, d2/a2/u2, …]` up to
    * `u<rounds>` — the Lloyd rounds unrolled (a fixed iteration count
    * needs no recursion, and unrolling keeps every round's algebra
    * visible to the comparison). Shared by [[kmeansRoundsOracle]] and
    * [[ivfTrainedTopKOracle]]. */
  private def kmRoundCtesSql(rounds: Int, kExpr: String = KmK.toString): String = {
    def assign(r: Int, cents: String) =
      s"""d$r AS (
        |  SELECT e.vec_id, c.cell_id,
        |    list_sum(list_transform($kmDims,
        |      i -> (e.qe[i] - c.qc[i]) * (e.qe[i] - c.qc[i]))) AS dist
        |  FROM e CROSS JOIN $cents c
        |),
        |a$r AS (
        |  SELECT vec_id, cell_id FROM (
        |    SELECT vec_id, cell_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell_id) AS rk
        |    FROM d$r) WHERE rk = 1
        |),
        |u$r AS (
        |  SELECT a$r.cell_id AS cluster_id, r.i AS dim,
        |         sum(e.qe[r.i]) AS s, count(*) AS n
        |  FROM a$r JOIN e USING (vec_id), $kmDims AS r(i)
        |  GROUP BY 1, 2
        |)""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      val cents = if (r == 1) "cent0" else s"cent${r - 1}"
      if (r < rounds) assign(r, cents) + ",\n" + kmRequantCte(r)
      else assign(r, cents)
    }.mkString(",\n")
    s"""e AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $KmQ.0) AS BIGINT)) AS qe
      |  FROM embeddings
      |),
      |cent0 AS (SELECT vec_id AS cell_id, qe AS qc FROM e WHERE vec_id < $kExpr),
      |$roundCtes""".stripMargin
  }

  /** Oracle for [[kmeansRounds]]. */
  lazy val kmeansRoundsOracle: String =
    s"""WITH ${kmRoundCtesSql(KmTrainRounds)}
      |SELECT cluster_id, CAST(dim AS BIGINT) AS dim,
      |       round(CAST(s AS DOUBLE) / n / $KmQ.0, 6) AS centroid_val,
      |       CAST(n AS BIGINT) AS n_members
      |FROM u$KmTrainRounds ORDER BY cluster_id, dim""".stripMargin

  /** emb1: embedding L2-normalize + int8 quantize — the storage/serving
    * compression every vector pipeline runs before shipping embeddings
    * (4× smaller than float32, cosine preserved to ~1e-2). Portability
    * discipline: the squared norm is an EXACT integer sum over the
    * 2²⁴-quantized components (float sums are accumulation-order-
    * dependent; 64 · (3·2²⁴)² stays under 2⁶³), and both engines cast
    * the same BIGINT to the same IEEE double before the sqrt, so the
    * norm — and every code — is bit-identical cross-engine. Output is
    * one compact row per vector: norm, code stats, and an md5 over the
    * full code array (proving all 64 codes without 64× output rows).
    * Pure narrow projection — zero shuffle before the oracle order. */
  def quantizeEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
      .withColumn("qe", expr(quantExpr("embedding")))
      .withColumn("ss", expr("aggregate(qe, 0L, (acc, x) -> acc + x * x)"))
      .withColumn("norm", expr("sqrt(cast(ss as double))"))
      .withColumn("codes", expr(
        """CASE WHEN ss = 0 THEN transform(qe, x -> 0L)
          |ELSE transform(qe, x -> cast(greatest(least(
          |       round(cast(x as double) / norm * 127.0), 127.0D), -127.0D) as bigint))
          |END""".stripMargin))
    e.select(
        col("vec_id"),
        round(col("norm") / KmQ, 6).as("norm_r"),
        expr("aggregate(codes, 0L, (acc, x) -> acc + x)").as("code_sum"),
        expr("array_min(codes)").cast("bigint").as("code_min"),
        expr("array_max(codes)").cast("bigint").as("code_max"),
        md5(expr("cast(concat_ws(',', transform(codes, c -> cast(c as string))) as binary)"))
          .as("codes_fp"))
      .orderBy("vec_id")
  }

  lazy val quantizeEmbeddingsOracle: String =
    s"""WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $KmQ.0) AS BIGINT)) AS qe
      |  FROM embeddings
      |),
      |n AS (
      |  SELECT vec_id, qe,
      |    CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT) AS ss
      |  FROM q
      |),
      |c AS (
      |  SELECT vec_id, ss, sqrt(CAST(ss AS DOUBLE)) AS norm,
      |    CASE WHEN ss = 0 THEN list_transform(qe, x -> CAST(0 AS BIGINT))
      |         ELSE list_transform(qe, x -> CAST(greatest(least(
      |                round(CAST(x AS DOUBLE) / sqrt(CAST(ss AS DOUBLE)) * 127.0),
      |                127.0), -127.0) AS BIGINT))
      |    END AS codes
      |  FROM n
      |)
      |SELECT vec_id,
      |  round(norm / $KmQ.0, 6) AS norm_r,
      |  CAST(list_sum(codes) AS BIGINT) AS code_sum,
      |  CAST(list_min(codes) AS BIGINT) AS code_min,
      |  CAST(list_max(codes) AS BIGINT) AS code_max,
      |  md5(array_to_string(codes, ',')) AS codes_fp
      |FROM c ORDER BY vec_id""".stripMargin

  /** Output dimensionality of the random projection (emb2). */
  val RpDims = 16
  /** Weight quantization scale (2¹²): products qe·qw stay ≤ ~2⁴⁷ over
    * 64 dims — exact BIGINT arithmetic, no float accumulator. */
  val RpQ: Long = 1L << 12

  /** emb2's projection matrix: the first [[RpDims]] deterministic
    * Gaussian hyperplanes (reusing [[graft.functions.HyperplaneBuckets]]
    * .planes — already seeded, public and restated in oracles),
    * floor-quantized at [[RpQ]]. */
  private lazy val rpWeights: Array[Array[Long]] = {
    val flat = for {
      t <- graft.functions.HyperplaneBuckets.planes.toSeq
      p <- t.toSeq
    } yield p
    flat.take(RpDims)
      .map(_.map(x => math.floor(x * RpQ).toLong))
      .toArray
  }

  /** emb2: random-projection dimensionality reduction 64 → [[RpDims]] —
    * the Johnson–Lindenstrauss workhorse for cheap-then-exact retrieval
    * and storage reduction. All arithmetic is exact integer (embedding
    * quantized at 2²⁴, weights at 2¹²), so the projection — unlike a
    * float dot product — is accumulation-order-independent and
    * bit-identical in the oracle. One narrow projection, zero shuffle;
    * at 100 TB this streams. Long-form output (vec_id, dim, val). */
  def randomProjection(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.LongVecOps.register(spark)
    val scale = (KmQ * RpQ).toDouble
    val dimCols = rpWeights.zipWithIndex.map { case (w, j) =>
      struct(lit(j + 1).cast("bigint").as("dim"),
        expr(s"long_dot(qe, array(${w.map(_ + "L").mkString(",")}))").as("yq"))
    }
    kmCorpus(spark, dir)
      .select(col("vec_id"), explode(array(dimCols: _*)).as("p"))
      .select(col("vec_id"), col("p.dim").as("dim"),
        round(col("p.yq") / scale, 6).as("val"))
      .orderBy("vec_id", "dim")
  }

  lazy val randomProjectionOracle: String = {
    val rows = rpWeights.zipWithIndex
      .map { case (w, j) => s"(${j + 1}, [${w.mkString(", ")}])" }
      .mkString(",\n    ")
    s"""WITH e AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $KmQ.0) AS BIGINT)) AS qe
      |  FROM embeddings
      |),
      |w(dim, wv) AS (VALUES
      |    $rows
      |)
      |SELECT vec_id, CAST(dim AS BIGINT) AS dim,
      |  round(CAST(list_sum(list_transform(range(1, ${Dim + 1}),
      |          i -> qe[i] * wv[i])) AS DOUBLE) / ${KmQ * RpQ}.0, 6) AS val
      |FROM e, w ORDER BY vec_id, dim""".stripMargin
  }

  // -- emb3: product quantization -----------------------------------

  /** PQ subspace count / sub-dimension / codebook size: 64 dims split
    * into 4 × 16-dim subspaces, 8 centroids each. Real deployments use
    * 8-bit codebooks (256 entries); 8 keeps the oracle's cross-join
    * CTEs small while exercising the identical algebra. */
  val PqM = 4
  val PqDsub: Int = Dim / PqM
  val PqK = 8

  /** Sub-vector rows (vec_id, sub_id ∈ 0..[[PqM]]-1, sq = quantized
    * [[PqDsub]]-dim slice) — the unit PQ trains and assigns on. */
  private def pqSub(spark: SparkSession, dir: String): DataFrame =
    kmCorpus(spark, dir).select(col("vec_id"),
      posexplode(expr(
        s"transform(sequence(0, ${PqM - 1}), s -> slice(qe, s * $PqDsub + 1, $PqDsub))"))
        .as(Seq("sub_id", "sq")))

  /** Exact quantized-L2 distance of every sub-vector to every codebook
    * entry of its subspace (the codebook — [[PqM]]·[[PqK]] rows —
    * broadcasts; narrow scan, no shuffle). Shared by encoding (argmin
    * over it) and ann5's ADC tables (the query side, un-argmin'd). */
  private def pqDists(sub: DataFrame, cents: DataFrame): DataFrame = {
    graft.functions.LongVecOps.register(sub.sparkSession)
    sub.join(broadcast(cents), "sub_id")
      .withColumn("dist", expr("quantized_l2(sq, qc)"))
  }

  /** Nearest codebook entry per (vector, subspace) by exact quantized
    * L2, cell_id tie-break — [[kmAssign]] keyed by subspace. The
    * argmin window shuffles on (vec_id, sub_id). */
  private def pqAssign(sub: DataFrame, cents: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id", "sub_id").orderBy(col("dist"), col("cell_id"))
    pqDists(sub, cents)
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("vec_id"), col("sub_id"), col("cell_id"), col("dist"))
  }

  /** Seed codebook: the sub-vectors of the first [[PqK]] vectors. */
  private def pqSeed(sub: DataFrame): DataFrame =
    sub.filter(col("vec_id") < PqK)
      .select(col("sub_id"), col("vec_id").as("cell_id"), col("sq").as("qc"))

  /** Trained per-subspace codebook: one exact-integer Lloyd update +
    * floor-requantize from the seed ([[KmQ]] discipline). */
  private[graft] def pqCodebookOf(sub: DataFrame): DataFrame = {
    val u1 = pqAssign(sub, pqSeed(sub)).join(sub, Seq("vec_id", "sub_id"))
      .select(col("sub_id"), col("cell_id").as("cluster_id"),
        posexplode(col("sq")).as(Seq("pos", "qval")))
      .groupBy("sub_id", "cluster_id", "pos")
      .agg(sum("qval").as("s"), count(lit(1)).as("n"))
    u1.withColumn("qv", expr("cast(floor(cast(s as double) / n) as bigint)"))
      .groupBy(col("sub_id"), col("cluster_id").as("cell_id"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, qv))), p -> p.qv)").as("qc"))
  }

  /** PQ codes after `rounds` ∈ {0, 1} Lloyd training rounds (0 = assign
    * straight to the seed codebook; 1 = one exact-integer update +
    * floor-requantize, the trained codebook). Spec entry — emb3 is
    * `rounds = 1`. */
  private[graft] def pqCodesAt(spark: SparkSession, dir: String, rounds: Int): DataFrame = {
    require(rounds == 0 || rounds == 1)
    val sub = graft.engine.Caching.persist(pqSub(spark, dir))
    val cents = if (rounds == 0) pqSeed(sub) else pqCodebookOf(sub)
    pqAssign(sub, cents)
      .groupBy("vec_id")
      .agg(
        concat_ws(",", expr(
          "transform(sort_array(collect_list(struct(sub_id, cell_id))), p -> cast(p.cell_id as string))"))
          .as("codes"),
        sum("dist").cast("bigint").as("qerr"))
      .orderBy("vec_id")
  }

  /** emb3: product quantization — the fine-grained compression layer of
    * the FAISS-style vector-serving stack (ann4's trained IVF is the
    * coarse layer; IVF-PQ composes the two): each vector is stored as
    * [[PqM]] codebook indices (4 bytes here vs 256 bytes of float32 —
    * with 256-entry codebooks the production ratio is 64×), and
    * distances are later evaluated against codebooks, not raw vectors.
    * Codebooks are trained per subspace with one exact fixed-point
    * Lloyd round from the deterministic seed (same [[KmQ]] discipline
    * as km1/km2: integer sums, floor-requantize — bit-identical
    * cross-engine). At 100 TB the codebook (M·K rows) is trained on a
    * sample and BROADCAST; encoding is a narrow scan + a (vec_id,
    * sub_id) argmin window, and the emitted codes table is the
    * shuffle-light artifact downstream ANN serves from. Output:
    * per-vector code string + exact integer quantization error. */
  def pqEncode(spark: SparkSession, dir: String): DataFrame =
    pqCodesAt(spark, dir, rounds = 1)

  /** Quantized-L2 between a sub-vector row of `$s` and a codebook row
    * `$c`, as DuckDB SQL. */
  private def pqDistSql(s: String, c: String): String =
    s"""list_sum(list_transform(range(1, ${PqDsub + 1}),
      |      i -> ($s.sq[i] - $c.qc[i]) * ($s.sq[i] - $c.qc[i])))""".stripMargin

  /** Prefixed PQ CTE chain over a shared `e` (quantized embeddings)
    * CTE: `${p}sub` (sub-vector rows) … `${p}cent1` (the trained
    * codebook) — prefixing keeps the names disjoint from the coarse
    * k-means chain when ann5 composes both into one oracle (same
    * pattern as Dedup.minhashBandCtes). */
  private def pqCtesSql(p: String): String =
    s"""${p}sub AS (
      |  SELECT vec_id, s.i AS sub_id,
      |    list_transform(range(1, ${PqDsub + 1}), j -> qe[s.i * $PqDsub + j]) AS sq
      |  FROM e, range(0, $PqM) AS s(i)
      |),
      |${p}cent0 AS (SELECT sub_id, vec_id AS cell_id, sq AS qc FROM ${p}sub WHERE vec_id < $PqK),
      |${p}d1 AS (
      |  SELECT sv.vec_id, sv.sub_id, c.cell_id, ${pqDistSql("sv", "c")} AS dist
      |  FROM ${p}sub sv JOIN ${p}cent0 c USING (sub_id)
      |),
      |${p}a1 AS (
      |  SELECT vec_id, sub_id, cell_id FROM (
      |    SELECT vec_id, sub_id, cell_id,
      |           row_number() OVER (PARTITION BY vec_id, sub_id ORDER BY dist, cell_id) AS rk
      |    FROM ${p}d1) WHERE rk = 1
      |),
      |${p}u1 AS (
      |  SELECT a.sub_id, a.cell_id AS cluster_id, r.i AS dim,
      |         sum(sv.sq[r.i]) AS s, count(*) AS n
      |  FROM ${p}a1 a JOIN ${p}sub sv USING (vec_id, sub_id), range(1, ${PqDsub + 1}) AS r(i)
      |  GROUP BY 1, 2, 3
      |),
      |${p}cent1 AS (
      |  SELECT sub_id, cluster_id AS cell_id,
      |         list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) ORDER BY dim) AS qc
      |  FROM ${p}u1 GROUP BY 1, 2
      |)""".stripMargin

  /** The shared quantized-embeddings CTE (DuckDB side of
    * [[kmCorpus]]). */
  private def qeCteSql: String =
    s"""e AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $KmQ.0) AS BIGINT)) AS qe
      |  FROM embeddings
      |)""".stripMargin

  lazy val pqEncodeOracle: String =
    s"""WITH $qeCteSql,
      |${pqCtesSql("")},
      |d2 AS (
      |  SELECT s.vec_id, s.sub_id, c.cell_id, ${pqDistSql("s", "c")} AS dist
      |  FROM sub s JOIN cent1 c USING (sub_id)
      |),
      |a2 AS (
      |  SELECT vec_id, sub_id, cell_id, dist FROM (
      |    SELECT vec_id, sub_id, cell_id, dist,
      |           row_number() OVER (PARTITION BY vec_id, sub_id ORDER BY dist, cell_id) AS rk
      |    FROM d2) WHERE rk = 1
      |)
      |SELECT vec_id,
      |  array_to_string(list(cell_id ORDER BY sub_id), ',') AS codes,
      |  CAST(sum(dist) AS BIGINT) AS qerr
      |FROM a2 GROUP BY vec_id ORDER BY vec_id""".stripMargin

  /** ann5: IVF-PQ with asymmetric distance computation (ADC) — the
    * billion-scale ANN architecture (Jégou et al. 2011; FAISS
    * `IVFADC`): ann4's trained coarse quantizer prunes the corpus to
    * the probed cells' inverted lists, and candidates are ranked NOT
    * against their raw vectors but against their [[PqM]]-byte PQ codes
    * — the per-query cost of a candidate is M table lookups + adds
    * instead of a D-dimensional dot product, and the serving set is
    * the codes table (4 B/vector here; 64 B at production's 256-entry
    * codebooks vs 256 B raw), which is what lets an index hold 10⁹
    * vectors in RAM.
    *
    * Composition: coarse cells from [[trainedCentroids]] (2 Lloyd
    * rounds); PQ codebook from [[pqCodebookOf]] (1 round); the ADC
    * distance tables are the QUERY sub-vectors' exact quantized-L2 to
    * every codebook entry (queries × M × K rows — tiny, broadcast),
    * and a candidate's approximate distance is the sum of its M
    * looked-up entries, which equals the exact quantized distance to
    * its DECODED vector (SimilaritySpec pins that identity). Encodes
    * raw vectors, not coarse-residuals (residual PQ is the same plan
    * shape with the codebook trained on `x − centroid`; the fixture's
    * 8-cell coarse grid leaves residuals uninformative). All integer
    * arithmetic end-to-end → hash-compared against the composed
    * Lloyd + PQ CTE chains. */
  def ivfPqTopK(spark: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val scored = ivfPqScored(spark, dir)
    val survivors = graft.plans.GroupedTopK(
      scored, Seq("q_vec_id"), Seq("adc_dist" -> true, "vec_id" -> true), k = 3)
    val w = W.partitionBy("q_vec_id").orderBy(col("adc_dist"), col("vec_id"))
    survivors
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .select(col("q_vec_id"), col("rank"), col("vec_id"), col("adc_dist"))
      .orderBy("q_vec_id", "rank")
  }

  /** Oracle for [[ivfPqTopK]]: the coarse Lloyd chain (shared with
    * km2/ann4) + the prefixed PQ chain (shared with emb3) + cell
    * assignment, code assignment, ADC lookup join, and the final
    * ranking. */
  /** The IVF-PQ candidate-scoring stage shared by ann5 and ann7:
    * coarse-cell candidate generation (trained Lloyd centroids,
    * [[IvfProbes]] probes) + ADC scoring of each candidate as the sum
    * of its M looked-up sub-distance entries. Returns
    * `(q_vec_id, vec_id, adc_dist)`. */
  private[graft] def ivfPqScored(spark: SparkSession, dir: String): DataFrame = {
    val cents = graft.engine.Caching.persist(trainedCentroids(spark, dir))
    val q = kmCorpus(spark, dir)
    val corpusCells = kmAssign(q.filter(col("vec_id") >= 10), cents)
      .select(col("cell_id"), col("vec_id"))
    val queryCells = kmAssign(q.filter(col("vec_id") < 10), cents, probes = IvfProbes)
      .select(col("cell_id"), col("vec_id").as("q_vec_id"))
    val cand = corpusCells.join(broadcast(queryCells), Seq("cell_id"))
      .select("q_vec_id", "vec_id").dropDuplicates("q_vec_id", "vec_id")
    val sub = graft.engine.Caching.persist(pqSub(spark, dir))
    val codebook = graft.engine.Caching.persist(pqCodebookOf(sub))
    val codes = pqAssign(sub.filter(col("vec_id") >= 10), codebook)
      .select("vec_id", "sub_id", "cell_id")
    val adc = pqDists(sub.filter(col("vec_id") < 10), codebook)
      .select(col("vec_id").as("q_vec_id"), col("sub_id"), col("cell_id"), col("dist"))
    cand.join(codes, "vec_id")
      .join(broadcast(adc), Seq("q_vec_id", "sub_id", "cell_id"))
      .groupBy("q_vec_id", "vec_id").agg(sum("dist").cast("bigint").as("adc_dist"))
  }

  /** ann7: two-stage retrieval — the production serving shape every
    * vector store converges on (FAISS/SCaNN's "approximate then
    * re-rank"): stage 1 scores candidates with cheap compressed-domain
    * ADC ([[ivfPqScored]], integer lookups, no float vectors touched)
    * and keeps the top-[[RerankPool]] per query; stage 2 re-ranks ONLY
    * that pool with exact cosine on the original float vectors and
    * returns the top-3. At 100 TB the float corpus is touched for
    * ≤ pool·|queries| rows (a doc_id-keyed join against the vector
    * table), while the scan-heavy stage runs entirely on ~16-byte PQ
    * codes — the IO asymmetry that makes re-ranking affordable. Both
    * stages funnel through the native [[graft.plans.GroupedTopK]]
    * operator, so neither the scored table nor the pool exchange-sorts. */
  def ivfPqRerankTopK(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    val W = org.apache.spark.sql.expressions.Window
    val pool = graft.plans.GroupedTopK(
      ivfPqScored(spark, dir),
      Seq("q_vec_id"), Seq("adc_dist" -> true, "vec_id" -> true), k = RerankPool)
    val emb = Tables(spark, dir).embeddings
    val rescored = pool
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_emb"))), Seq("q_vec_id"))
      .withColumn("cos_r", round(expr("cosine_sim(q_emb, embedding)"), 6))
      .select("q_vec_id", "vec_id", "cos_r")
    val survivors = graft.plans.GroupedTopK(
      rescored, Seq("q_vec_id"), Seq("cos_r" -> false, "vec_id" -> true), k = 3)
    val w = W.partitionBy("q_vec_id").orderBy(col("cos_r").desc, col("vec_id"))
    survivors
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .select(col("q_vec_id"), col("rank"), col("vec_id"), col("cos_r"))
      .orderBy("q_vec_id", "rank")
  }

  /** ann7's stage-1 pool size (candidates per query surviving to the
    * exact re-rank). */
  val RerankPool = 10

  lazy val ivfPqRerankTopKOracle: String =
    s"""$ivfPqScoredSql,
      |pool AS (
      |  SELECT q_vec_id, vec_id FROM (
      |    SELECT q_vec_id, vec_id,
      |           row_number() OVER (PARTITION BY q_vec_id
      |                              ORDER BY adc_dist, vec_id) AS rk
      |    FROM scored) WHERE rk <= $RerankPool),
      |rescored AS (
      |  SELECT p.q_vec_id, p.vec_id,
      |         round(list_cosine_similarity(CAST(qv.embedding AS DOUBLE[]),
      |                                      CAST(cv.embedding AS DOUBLE[])), 6) AS cos_r
      |  FROM pool p
      |  JOIN embeddings qv ON qv.vec_id = p.q_vec_id
      |  JOIN embeddings cv ON cv.vec_id = p.vec_id)
      |SELECT q_vec_id, CAST(rank AS BIGINT) AS rank, vec_id, cos_r FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
      |                               ORDER BY cos_r DESC, vec_id) AS rank
      |  FROM rescored
      |) WHERE rank <= 3 ORDER BY q_vec_id, rank""".stripMargin

  lazy val ivfPqTopKOracle: String =
    s"""$ivfPqScoredSql
      |SELECT q_vec_id, CAST(rank AS BIGINT) AS rank, vec_id, adc_dist FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
      |                               ORDER BY adc_dist, vec_id) AS rank
      |  FROM scored
      |) WHERE rank <= 3 ORDER BY q_vec_id, rank""".stripMargin

  /** The `WITH …, scored AS (…)` CTE chain of [[ivfPqTopKOracle]] —
    * shared verbatim with [[ivfPqRerankTopKOracle]] so the two oracles
    * cannot drift apart. Ends after the `scored` CTE (no final SELECT,
    * no trailing comma). */
  private lazy val ivfPqScoredSql: String = {
    val R = KmTrainRounds
    s"""WITH ${kmRoundCtesSql(R)},
      |${kmRequantCte(R)},
      |cd AS (
      |  SELECT e.vec_id, c.cell_id,
      |    list_sum(list_transform($kmDims,
      |      i -> (e.qe[i] - c.qc[i]) * (e.qe[i] - c.qc[i]))) AS dist
      |  FROM e CROSS JOIN cent$R c
      |),
      |ranked AS (
      |  SELECT vec_id, cell_id,
      |         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell_id) AS rk
      |  FROM cd
      |),
      |ccell AS (SELECT vec_id, cell_id FROM ranked WHERE rk = 1 AND vec_id >= 10),
      |qcell AS (SELECT vec_id AS q_vec_id, cell_id FROM ranked WHERE rk <= $IvfProbes AND vec_id < 10),
      |cand AS (
      |  SELECT DISTINCT qcell.q_vec_id, ccell.vec_id
      |  FROM qcell JOIN ccell ON qcell.cell_id = ccell.cell_id
      |),
      |${pqCtesSql("pq")},
      |pqd AS (
      |  SELECT sv.vec_id, sv.sub_id, c.cell_id, ${pqDistSql("sv", "c")} AS dist
      |  FROM pqsub sv JOIN pqcent1 c USING (sub_id)
      |),
      |codes AS (
      |  SELECT vec_id, sub_id, cell_id FROM (
      |    SELECT vec_id, sub_id, cell_id,
      |           row_number() OVER (PARTITION BY vec_id, sub_id ORDER BY dist, cell_id) AS rk
      |    FROM pqd WHERE vec_id >= 10) WHERE rk = 1
      |),
      |adc AS (SELECT vec_id AS q_vec_id, sub_id, cell_id, dist FROM pqd WHERE vec_id < 10),
      |scored AS (
      |  SELECT cand.q_vec_id, cand.vec_id, CAST(sum(adc.dist) AS BIGINT) AS adc_dist
      |  FROM cand
      |  JOIN codes ON codes.vec_id = cand.vec_id
      |  JOIN adc ON adc.q_vec_id = cand.q_vec_id
      |           AND adc.sub_id = codes.sub_id AND adc.cell_id = codes.cell_id
      |  GROUP BY 1, 2
      |)""".stripMargin
  }

  /** ann4: IVF over a TRAINED codebook — the step the ann3 scaladoc
    * promises ("a real build would k-means refine"): coarse-quantizer
    * centroids come from [[trainedCentroids]] (2 Lloyd rounds) instead
    * of the first-[[KmK]] seed vectors; corpus and queries assign to
    * cells by exact quantized L2 (engine-portable integers), queries
    * probe their [[IvfProbes]] nearest cells, and candidates are
    * brute-forced with exact cosine on the original float vectors.
    * The codebook is tiny (k rows) and broadcasts; at 100 TB it is
    * trained once on a sample and reused — here the training plan
    * composes directly into the query (persisted, scope-released, so
    * corpus-side and query-side assignment share one training run). */
  def ivfTrainedTopK(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    val cents = graft.engine.Caching.persist(trainedCentroids(spark, dir))
    val q = kmCorpus(spark, dir)
    val corpusCells = kmAssign(q.filter(col("vec_id") >= 10), cents)
      .select(col("cell_id"), col("vec_id"))
    val queryCells = kmAssign(q.filter(col("vec_id") < 10), cents, probes = IvfProbes)
      .select(col("cell_id"), col("vec_id").as("q_vec_id"))
    val eAll = Tables(spark, dir).embeddings
    val corpusEmb = eAll.filter(col("vec_id") >= 10).select(col("vec_id"), col("embedding"))
    val queryEmb = eAll.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_emb"))
    rankTop3(corpusCells
      .join(broadcast(queryCells), Seq("cell_id"))
      .dropDuplicates("q_vec_id", "vec_id")
      .join(corpusEmb, Seq("vec_id"))
      .join(broadcast(queryEmb), Seq("q_vec_id"))
      .withColumn("cos_r", round(expr("cosine_sim(q_emb, embedding)"), 6))
      .select("q_vec_id", "vec_id", "cos_r"))
  }

  /** Oracle for [[ivfTrainedTopK]]: the unrolled Lloyd chain →
    * requantized codebook → quantized-L2 cell assignment (probes 1 and
    * [[IvfProbes]]) → candidate join → exact-cosine ranking. */
  lazy val ivfTrainedTopKOracle: String = {
    val R = KmTrainRounds
    s"""WITH ${kmRoundCtesSql(R)},
      |${kmRequantCte(R)},
      |cd AS (
      |  SELECT e.vec_id, c.cell_id,
      |    list_sum(list_transform($kmDims,
      |      i -> (e.qe[i] - c.qc[i]) * (e.qe[i] - c.qc[i]))) AS dist
      |  FROM e CROSS JOIN cent$R c
      |),
      |ranked AS (
      |  SELECT vec_id, cell_id,
      |         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell_id) AS rk
      |  FROM cd
      |),
      |ccell AS (SELECT vec_id, cell_id FROM ranked WHERE rk = 1 AND vec_id >= 10),
      |qcell AS (SELECT vec_id AS q_vec_id, cell_id FROM ranked WHERE rk <= $IvfProbes AND vec_id < 10),
      |cand AS (
      |  SELECT DISTINCT qcell.q_vec_id, ccell.vec_id
      |  FROM qcell JOIN ccell ON qcell.cell_id = ccell.cell_id
      |),
      |scored AS (
      |  SELECT cand.q_vec_id, cand.vec_id,
      |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                 CAST(c.embedding AS DOUBLE[])), 6) AS cos_r
      |  FROM cand
      |  JOIN embeddings q ON q.vec_id = cand.q_vec_id
      |  JOIN embeddings c ON c.vec_id = cand.vec_id
      |)
      |SELECT q_vec_id, CAST(rank AS BIGINT) AS rank, vec_id, cos_r FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
      |                               ORDER BY cos_r DESC, vec_id) AS rank
      |  FROM scored
      |) WHERE rank <= 3 ORDER BY q_vec_id, rank""".stripMargin
  }

  /** Full Lloyd trainer: iterate assignment/update until assignments are
    * stable (or maxIters). Returns (assignment, centroid table, rounds,
    * per-round SSE). Quantized arithmetic makes every round
    * deterministic; `localCheckpoint` truncates the iterative lineage.
    * Cluster means are re-quantized with integer floor division, so the
    * trainer never touches a float accumulator. */
  def kmeansTrain(spark: SparkSession, dir: String,
      maxIters: Int = 20): (DataFrame, DataFrame, Int, Seq[Long]) = {
    val e = kmCorpus(spark, dir).localCheckpoint()
    var cents = e.filter(col("vec_id") < KmK)
      .select(col("vec_id").as("cell_id"), col("qe").as("qc"))
      .localCheckpoint()
    var assigned = kmAssign(e, cents).localCheckpoint()
    var sses = Seq(assigned.agg(sum("dist")).first().getLong(0))
    var rounds = 0
    var stable = false
    while (!stable && rounds < maxIters) {
      cents = kmRequant(kmUpdate(assigned)).localCheckpoint()
      val next = kmAssign(e, cents).localCheckpoint()
      stable = next.select("vec_id", "cell_id")
        .join(assigned.select(col("vec_id"), col("cell_id").as("prev")), Seq("vec_id"))
        .filter(col("cell_id") =!= col("prev"))
        .isEmpty
      assigned = next
      sses = sses :+ assigned.agg(sum("dist")).first().getLong(0)
      rounds += 1
    }
    (assigned, cents, rounds, sses)
  }

  // -- dd8: semantic deduplication (SemDeDup) ------------------------

  /** Cosine threshold above which two same-cluster embeddings count as
    * semantic duplicates. The fixture's max pairwise cosine is ≈ 0.5
    * (TESTDATA: no planted embedding dups), so the working threshold
    * sits below that to exercise non-empty dup groups at the driver SFs;
    * a production corpus runs the same plan at ~0.95+. */
  val SemDedupTau = 0.4

  /** Target cluster OCCUPANCY for dd8: cluster count k =
    * max([[KmK]], ⌈N/250⌉), so per-cluster pairwise work is bounded by
    * ~250²/2 comparisons regardless of corpus size — the SemDeDup
    * paper's own k ∝ N discipline (LAION: 50k clusters for 5B items).
    * 250 is chosen so the driver fixtures keep k = 8 exactly
    * (N = 200 → ⌈0.8⌉, N = 2000 → ⌈8⌉ — oracle outputs unchanged)
    * while the sf1 sweep's 20k vectors get k = 80 (measured: the fixed-k
    * form ran 17× wall for 10× data; occupancy-bounded is linear).
    * The codebook stays broadcastable far past the paper's regime
    * (N = 5·10⁹ ⇒ k = 2·10⁷ rows ≈ low GB; beyond that the assignment
    * itself needs an IVF/hierarchical route — documented, out of the
    * swept range). */
  val SemDedupOccupancy = 250L

  /** dd8: SemDeDup — semantic deduplication via clustered pairwise
    * cosine (Abbas et al. 2023, arXiv:2303.09540: the LAION/web-scale
    * recipe). All-pairs cosine over a corpus is O(N²) and impossible at
    * 100 TB; SemDeDup's insight is that semantic duplicates land in the
    * same k-means cluster, so pairwise comparison only happens WITHIN
    * clusters — with k grown ∝ N (target cluster size fixed), per-
    * cluster work is bounded and total cost is O(N · cluster_size).
    *
    * Composition here: the coarse clusters are [[trainedCentroids]]'s
    * 2-round Lloyd codebook (shared plan with km2/ann4/ann5 — trained
    * once, broadcast); vectors assign by exact quantized L2; the
    * within-cluster self-join ships (cell_id, vec_id, embedding) rows
    * and drops a vector when a LOWER-id cluster-mate matches at
    * ≥ [[SemDedupTau]] (the paper keeps one exemplar per dup
    * neighborhood; lowest-id is the deterministic, engine-portable
    * choice of exemplar). Output: every vector with its cluster, the
    * drop verdict, the exemplar it duplicates, and the evidence cosine.
    * The only shuffles are the cluster-key exchange for the self-join
    * and the per-vector evidence agg — no global pairwise stage. */
  def semDedup(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    // O(1) metadata count (parquet row count) → occupancy-bounded k;
    // same integer ceil both engines: (n + occ - 1) div occ
    val n = Tables(spark, dir).embeddings.count()
    val k = math.max(KmK.toLong, (n + SemDedupOccupancy - 1) / SemDedupOccupancy)
    val cents = graft.engine.Caching.persist(trainedCentroids(spark, dir, k = k))
    // the assignment table feeds THREE consumers (both self-join sides
    // and the verdict projection) — cached so the corpus is clustered
    // once, not three times; at scale this is the materialized
    // (vec, cluster) artifact a SemDeDup run keeps anyway
    val withVec = graft.engine.Caching.persist(
      kmAssign(kmCorpus(spark, dir), cents).select("vec_id", "cell_id")
        .join(Tables(spark, dir).embeddings.select("vec_id", "embedding"), Seq("vec_id")))
    val asgn = withVec.select("vec_id", "cell_id")
    val a = withVec.select(col("cell_id"), col("vec_id").as("x"), col("embedding").as("ex"))
    val b = withVec.select(col("cell_id"), col("vec_id").as("y"), col("embedding").as("ey"))
    val evidence = a.join(b, Seq("cell_id"))
      .filter(col("y") < col("x"))
      .withColumn("cos_r", round(expr("cosine_sim(ex, ey)"), 6))
      .filter(col("cos_r") >= SemDedupTau)
      .groupBy(col("x").as("vec_id"))
      .agg(min("y").as("dup_of"), max("cos_r").as("max_cos"))
    asgn.join(evidence, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell_id"),
        col("dup_of").isNotNull.as("dropped"), col("dup_of"), col("max_cos"))
      .orderBy("vec_id")
  }

  /** Oracle for [[semDedup]]: the shared Lloyd chain → final codebook →
    * single-probe assignment → within-cluster lower-id pairing at the
    * same rounded-cosine threshold. */
  lazy val semDedupOracle: String = {
    val R = KmTrainRounds
    val kExpr = s"(SELECT greatest($KmK, CAST((count(*) + ${SemDedupOccupancy - 1}) " +
      s"// $SemDedupOccupancy AS BIGINT)) FROM embeddings)"
    s"""WITH ${kmRoundCtesSql(R, kExpr)},
      |${kmRequantCte(R)},
      |cd AS (
      |  SELECT e.vec_id, c.cell_id,
      |    list_sum(list_transform($kmDims,
      |      i -> (e.qe[i] - c.qc[i]) * (e.qe[i] - c.qc[i]))) AS dist
      |  FROM e CROSS JOIN cent$R c
      |),
      |asgn AS (
      |  SELECT vec_id, cell_id FROM (
      |    SELECT vec_id, cell_id,
      |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell_id) AS rk
      |    FROM cd) WHERE rk = 1
      |),
      |evidence AS (
      |  SELECT xa AS vec_id, min(xb) AS dup_of, max(cos_r) AS max_cos
      |  FROM (
      |    SELECT a.vec_id AS xa, b.vec_id AS xb,
      |      round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
      |                                   CAST(eb.embedding AS DOUBLE[])), 6) AS cos_r
      |    FROM asgn a JOIN asgn b ON a.cell_id = b.cell_id AND b.vec_id < a.vec_id
      |    JOIN embeddings ea ON ea.vec_id = a.vec_id
      |    JOIN embeddings eb ON eb.vec_id = b.vec_id
      |  ) p
      |  WHERE cos_r >= '$SemDedupTau'::DOUBLE
      |  GROUP BY xa
      |)
      |SELECT a.vec_id AS vec_id, a.cell_id AS cell_id,
      |       (m.dup_of IS NOT NULL) AS dropped, m.dup_of AS dup_of, m.max_cos AS max_cos
      |FROM asgn a LEFT JOIN evidence m ON m.vec_id = a.vec_id
      |ORDER BY a.vec_id""".stripMargin
  }

  /** ann6: FILTERED vector search — top-k under a metadata predicate
    * (here: candidates restricted to the query's own label class), the
    * problem every vector DB names pre- vs post-filtering. POST-filter
    * (search first, filter the top-k after) silently under-delivers:
    * any of the global top-5 outside the class is discarded and the
    * query returns < k rows with recall loss — SimilaritySpec
    * measures exactly that deficit on these fixtures. PRE-filter is
    * the relational shape and Spark gets it for free: the metadata
    * predicate becomes the JOIN KEY (label equi-join replaces the
    * cross join), so the candidate set shrinks BEFORE any distance
    * math — selectivity s cuts the scored rows to s·N — and the
    * native GroupedTopK tail guarantees exactly k per query whenever
    * the class holds k members. At 100 TB the same query runs against
    * a `partitionBy(label)` layout as a partition-pruned scan (the
    * ann3b index pattern composes: per-label IVF cells). */
  def filteredTopK(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    val q = Tables(spark, dir).embeddings.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
    val corpus = Tables(spark, dir).embeddings.filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding"), col("label"))
    val scored = corpus.join(broadcast(q), col("label") === col("q_label"))
      .withColumn("cos_r", round(expr("cosine_sim(q_emb, embedding)"), 6))
      .select("q_vec_id", "vec_id", "cos_r")
    val survivors = graft.plans.GroupedTopK(
      scored, Seq("q_vec_id"), Seq("cos_r" -> false, "vec_id" -> true), k = 5)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_vec_id").orderBy(col("cos_r").desc, col("vec_id"))
    survivors
      .withColumn("rank", row_number().over(w))
      .select(col("q_vec_id"), col("rank").cast("bigint").as("rank"),
        col("vec_id"), col("cos_r"))
      .orderBy("q_vec_id", "rank")
  }

  val filteredTopKOracle: String =
    """WITH q AS (SELECT vec_id AS q_vec_id, embedding AS q_emb, label AS q_label
      |           FROM embeddings WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.q_vec_id, c.vec_id,
      |    round(list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
      |                                 CAST(c.embedding AS DOUBLE[])), 6) AS cos_r
      |  FROM q JOIN (SELECT * FROM embeddings WHERE vec_id >= 10) c
      |    ON c.label = q.q_label
      |)
      |SELECT q_vec_id, CAST(rank AS BIGINT) AS rank, vec_id, cos_r FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
      |                               ORDER BY cos_r DESC, vec_id) AS rank
      |  FROM scored
      |) WHERE rank <= 5 ORDER BY q_vec_id, rank""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("dd8_semdedup", semDedupOracle)(semDedup),
    QueryDef.sql("ann1_bruteforce_topk", bruteForceTopKOracle)(bruteForceTopK),
    QueryDef.sql("ann2_lsh_topk", lshTopKOracle)(lshTopK),
    QueryDef.sql("ann3_ivf_topk", ivfTopKOracle)(ivfTopK),
    QueryDef.sql("ann3b_ivf_indexed", ivfTopKOracle)(ivfIndexedTopK),
    QueryDef.sql("ann3c_ivf_incremental", ivfTopKOracle)(ivfIncrementalTopK),
    QueryDef.sql("km1_kmeans_step", kmeansStepOracle)(kmeansStep),
    QueryDef.sql("km2_kmeans_train", kmeansRoundsOracle)((s, d) => kmeansRounds(s, d)),
    QueryDef.sql("ann4_ivf_trained", ivfTrainedTopKOracle)(ivfTrainedTopK),
    QueryDef.sql("emb1_quantize", quantizeEmbeddingsOracle)(quantizeEmbeddings),
    QueryDef.sql("emb2_random_projection", randomProjectionOracle)(randomProjection),
    QueryDef.sql("emb3_pq_encode", pqEncodeOracle)(pqEncode),
    QueryDef.sql("ann5_ivfpq_topk", ivfPqTopKOracle)(ivfPqTopK),
    QueryDef.sql("ann6_filtered_topk", filteredTopKOracle)(filteredTopK),
    QueryDef.sql("ann7_rerank_topk", ivfPqRerankTopKOracle)(ivfPqRerankTopK))
}
