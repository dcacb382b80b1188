package graft.ops.ext

import graft.engine.{Caching, QueryDef, Tables}
import graft.ops.lake.Snapshots
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline, in increasing
  * sophistication: exact (hash group-by), blocked n-gram Jaccard,
  * MinHash+LSH, SimHash. The fixture corpus contains planted near-dup
  * pairs (Jaccard ≈ 0.99) that *cross* lang/source blocks — which is the
  * whole argument for signature-based LSH over metadata blocking.
  *
  * Scale notes: exact dedup is one shuffle on the fingerprint. The
  * Jaccard verify is always run on *candidate pairs* (never all pairs);
  * candidates come from a blocking key (dd2) or MinHash band buckets
  * (dd3), both of which shuffle on small keys and keep the join fan-out
  * proportional to true-duplicate density, not O(n²).
  */
object Dedup {

  /** Distinct 3-gram word shingles of `text`, as a SQL expression over a
    * pre-split token array column `w`. Built from zipped shifted slices,
    * not `transform(sequence(..), i -> element_at(w, i))` — an outer
    * `w` reference inside a lambda gets inlined on project collapse and
    * the token split re-runs per element (see bigramProfile's note);
    * slices reference `w` a constant number of times per row. The
    * size guard keeps slice lengths non-negative. */
  val shingleExpr: String =
    """CASE WHEN size(w) < 3 THEN filter(w, x -> false)
      |ELSE array_distinct(zip_with(
      |       zip_with(slice(w, 1, size(w) - 2), slice(w, 2, size(w) - 2),
      |                (x, y) -> concat(x, ' ', y)),
      |       slice(w, 3, size(w) - 2),
      |       (xy, z) -> concat(xy, ' ', z)))
      |END""".stripMargin

  def shingled(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .withColumn("w", split(trim(col("text")), "\\s+"))
      .withColumn("sh", expr(shingleExpr))
      .drop("w")

  /** dd1: exact dedup via normalized-text fingerprint group-by. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .groupBy(md5(regexp_replace(lower(col("text")), "\\s+", " ").cast("binary")).as("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))
      .orderBy("fingerprint")

  val exactDedupOracle: String =
    """SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint,
      |       count(*) AS n_docs, min(doc_id) AS keep_doc_id
      |FROM documents GROUP BY 1 ORDER BY fingerprint""".stripMargin

  private def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b)))
  }

  /** dd2: n-gram Jaccard near-dup pairs over a cheap blocking key (the
    * document's first shingle — prefix blocking). SQL-expressible, so
    * oracle-checked; recall on the planted dups is 100% here because the
    * planted edits don't touch the prefix. dd3 removes the blocking
    * assumption.
    *
    * Same id-only-candidates shape as dd3: the blocking join exchanges
    * bare (doc_id, first_sh) rows and the shingle arrays are joined back
    * only for the candidate pairs — a popular prefix fans out id pairs,
    * not O(block²) copies of full shingle arrays. CAVEAT (the reason this
    * stays a standalone demonstrator): candidate COUNT is still quadratic
    * in the hottest block — B docs sharing a boilerplate opening yield
    * B² id pairs and B² Jaccard verifications. On a real crawl the
    * hottest prefix is millions of documents, so anything built ON TOP of
    * pair detection ([[dupClusters]], the tx9 cleaning funnel) consumes
    * [[minhashPairs]] instead: banding bounds candidates by signature
    * collision, independent of any single hot key. DedupSpec's
    * hot-prefix case pins the difference. */
  def ngramJaccardBlocked(spark: SparkSession, dir: String): DataFrame = {
    val sh = Caching.persist(shingled(spark, dir)
      .select(col("doc_id"), col("sh"), element_at(col("sh"), 1).as("first_sh"))
    ) // blocking pass + both candidate join-backs
    val ids = sh.select(col("doc_id"), col("first_sh"))
    val candidates = ids.select(col("doc_id").as("doc_a"), col("first_sh"))
      .join(ids.select(col("doc_id").as("doc_b"), col("first_sh")), Seq("first_sh"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") > 0.8)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  val ngramJaccardBlockedOracle: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(w)-1),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s,
      |    w[1] || ' ' || w[2] || ' ' || w[3] AS first_sh
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents)
      |)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |       len(list_intersect(a.s, b.s))::DOUBLE
      |         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
      |FROM sh a JOIN sh b ON a.first_sh = b.first_sh AND a.doc_id < b.doc_id
      |WHERE len(list_intersect(a.s, b.s))::DOUBLE
      |         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) > 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  /** dd2b's block cap. 2 on fixtures so BOTH branches carry rows at the
    * driver's SFs (planted-dup blocks reach size 3–4); production sets
    * this to the largest block one task comfortably squares (10³–10⁴). */
  val Dd2BlockCap = 2

  /** dd2b: the production-guarded form of dd2 — prefix blocking with a
    * BLOCK-SIZE CAP. Blocks of ≤ [[Dd2BlockCap]] docs pair all-vs-all
    * (bounded ≤ cap² work per block); docs in OVERSIZED blocks — the hot
    * boilerplate prefixes that make plain dd2 quadratic — route to
    * MinHash banding ([[minhashCandidatesFor]]), whose candidate count
    * is bounded by signature collision instead of block size. Both
    * branches emit bare id pairs, one shingle join-back verifies
    * Jaccard ≥ 0.8. (The banding branch may also pair routed docs
    * ACROSS different hot prefixes — a strict recall improvement over
    * blocking.) Worst case is banding's, never B². */
  def ngramJaccardCapped(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleTable(spark, dir)
    val keyed = sh.withColumn("first_sh", element_at(col("sh"), 1))
    val sizes = keyed.groupBy("first_sh").agg(count(lit(1)).as("bc"))
    val tagged = keyed.join(sizes, Seq("first_sh"))
    val small = tagged.filter(col("bc") <= Dd2BlockCap)
      .select("doc_id", "first_sh")
    val blockedCand = small.select(col("doc_id").as("doc_a"), col("first_sh"))
      .join(small.select(col("doc_id").as("doc_b"), col("first_sh")), Seq("first_sh"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    // routed feeds minhashCandidatesFor ONCE (the band buckets inside it
    // are the real multi-consumer point, and persist there) — no cache
    val routed = tagged.filter(col("bc") > Dd2BlockCap).select("doc_id", "sh")
    val candidates = blockedCand.unionAll(minhashCandidatesFor(routed))
      .dropDuplicates("doc_a", "doc_b")
    candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  lazy val ngramJaccardCappedOracle: String =
    s"""WITH $shingleCtes,
      |bs AS (SELECT first_sh, count(*) AS bc FROM sh GROUP BY 1),
      |small AS (SELECT sh.doc_id, sh.first_sh FROM sh JOIN bs USING (first_sh) WHERE bc <= $Dd2BlockCap),
      |big AS (SELECT sh.doc_id, sh.s FROM sh JOIN bs USING (first_sh) WHERE bc > $Dd2BlockCap),
      |bcand AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM small a JOIN small b ON a.first_sh = b.first_sh AND a.doc_id < b.doc_id
      |),
      |${minhashBandCtes("big", "r")},
      |allcand AS (
      |  SELECT DISTINCT doc_a, doc_b FROM (
      |    SELECT doc_a, doc_b FROM bcand UNION ALL SELECT doc_a, doc_b FROM rcand
      |  )
      |)
      |SELECT doc_a, doc_b, jaccard FROM (
      |  SELECT doc_a, doc_b,
      |    len(list_intersect(x.s, y.s))::DOUBLE
      |      / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS jaccard
      |  FROM allcand JOIN sh x ON x.doc_id = allcand.doc_a JOIN sh y ON y.doc_id = allcand.doc_b
      |) WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b""".stripMargin

  val MinhashK = 32
  val Bands = 8 // × 4 rows per band

  /** dd3: MinHash + LSH banding over ALL documents (no metadata/prefix
    * blocking): 32 minhashes → 8 bands of 4 → band-bucket join produces
    * candidates → exact Jaccard verify ≥ 0.8. The signatures use the
    * engine-portable md5-based multiplicative family
    * ([[graft.functions.MinHashSignature]]) and the band key is the plain
    * `'|'`-concat of the band's 4 minhash values, so the DuckDB oracle
    * ([[minhashLshOracle]]) reproduces the banding — and therefore the
    * full output — bit-for-bit: dd3 is hash-compared, not rows-only.
    *
    * Physical shape (the one that survives 100 TB): the signature pass is
    * ONE narrow projection (all 32 minhashes in a single nested-transform
    * expression — 32 chained withColumns would explode the plan), the
    * bucket table is persisted so the self-join doesn't recompute
    * signatures, candidates travel as bare (doc_a, doc_b) id pairs, and
    * the shingle arrays are joined back only for the (small) verified
    * candidate set instead of being shuffled per-candidate. */
  /** The non-empty shingle table dd3's passes share — persisted (scope-
    * released, see [[graft.engine.Caching]]) because the signature pass
    * and both verify re-joins re-read it. The non-empty guard is
    * `size(w) >= 3` on the TOKEN array (≡ `size(sh) > 0`: 3+ tokens ⟺
    * ≥1 shingle survives distinct) — filtering on `sh` itself pushed the
    * entire shingle CASE expression into the scan condition, evaluating
    * split() ~6× per row just to test emptiness; the token form costs
    * one split. */
  private def shingleTable(spark: SparkSession, dir: String): DataFrame =
    Caching.persist(
      // fanScanBuild (r18, VERDICT #1): the split + shingle CASE chain —
      // the cache BUILD cost — runs fanned across cores, but the CACHED
      // frame is restored to the scan's own narrow layout. r17's plain
      // fanScan pinned a 32-way layout into the cache, and every one of
      // dd2b's ~10 consumer stages paid 32 tasks of scheduling overhead
      // (2.1× wall, the round's one real regression); the narrow cache
      // is exactly the r16 shape all consumers were tuned on.
      graft.engine.Graft.fanScanBuild(
        Tables(spark, dir).documents, col("doc_id")) { d =>
        d.withColumn("w", split(trim(col("text")), "\\s+"))
          .filter(size(col("w")) >= 3)
          .withColumn("sh", expr(shingleExpr))
          .select("doc_id", "sh")
      })

  /** Band-bucket candidate id pairs for a shingled `(doc_id, sh)` frame —
    * bare ids only, no shingle array rides the bucket shuffle. Exposed
    * (pre-verify) so DedupSpec can pin the scale property directly:
    * candidates are bounded by signature collision, not by any blocking
    * key's hot-block size.
    *
    * Residual skew note: banding's own worst case is a megacluster of
    * EXACT duplicates — identical docs share identical signatures, so a
    * block of B exact copies collides in every band (B² candidates
    * again). That is not near-dup detection's job: run [[exactDedup]]
    * first (as tx9's funnel does — its semi-join keeps one canonical doc
    * per fingerprint) and the surviving corpus has no identical-text
    * blocks, leaving band buckets sized by true near-dup density. */
  /** Band-bucket rows `(doc_id, band_id, band_hash)` for a shingled
    * frame — the unit both the self-join candidates ([[minhashCandidatesFor]])
    * and the PERSISTENT index ([[incrementalLsh]]) are built from. */
  private[graft] def bucketsFor(sh: DataFrame): DataFrame = {
    graft.functions.MinHashSignature.register(sh.sparkSession)
    val sigs = sh.select(
      col("doc_id"),
      expr(s"minhash_sigs(sh, $MinhashK)").as("mhs"))
    val bandCols = (0 until Bands).map { bId =>
      val rowHashes = (1 to 4).map(r => s"element_at(mhs, ${bId * 4 + r})").mkString(", ")
      struct(lit(bId).as("band_id"), expr(s"concat_ws('|', $rowHashes)").as("band_hash"))
    }
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band_id"), col("b.band_hash"))
  }

  private[ext] def minhashCandidatesFor(sh: DataFrame): DataFrame = {
    val buckets = Caching.persist(bucketsFor(sh))
    val l = buckets.select(col("band_id"), col("band_hash"), col("doc_id").as("doc_a"))
    val r = buckets.select(col("band_id"), col("band_hash"), col("doc_id").as("doc_b"))
    l.join(r, Seq("band_id", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Band-bucket candidate pairs over the corpus (pre-verify). */
  def minhashCandidates(spark: SparkSession, dir: String): DataFrame =
    minhashCandidatesFor(shingleTable(spark, dir))

  /** dd3's verified near-dup pairs, UNORDERED — the composition form
    * [[dupClusters]] and the tx9 funnel consume (their downstream
    * shuffles would discard an ordering anyway). [[minhashLsh]] adds the
    * oracle ordering. */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleTable(spark, dir)
    val candidates = minhashCandidatesFor(sh)
    candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b", "jaccard")
  }

  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashPairs(spark, dir).orderBy("doc_a", "doc_b")

  /** DuckDB CTE chain (no WITH prefix) ending in
    * `verified(doc_a, doc_b, jaccard)` — dd3's verified near-dup pairs
    * with the same md5-based multiplicative MinHash (coefficients shared
    * from MinHashSignature), same 8×4 banding, same Jaccard verify.
    * Shared by [[minhashLshOracle]], [[dupClustersOracle]] and
    * TextAnalysis.cleanCorpusOracle so every consumer of the pair stream
    * stays hash-compared. */
  /** DuckDB CTEs `<p>hs, <p>mh, <p>buckets, <p>cand` computing the
    * MinHash band-bucket candidate pairs of CTE `src(doc_id, s)` —
    * prefix `p` keeps multiple instantiations (dd3's full-corpus chain,
    * dd2b's routed-residual chain) in one statement. */
  private def minhashBandCtes(src: String, p: String): String = {
    import graft.functions.MinHashSignature.{Prime, coeffA, coeffB}
    val minExprs = (0 until MinhashK).map { j =>
      s"list_min(list_transform(h, v -> (${coeffA(j)} * v + ${coeffB(j)}) % $Prime))"
    }.mkString(",\n      ")
    val bandKey = "concat_ws('|', m[band_id*4+1], m[band_id*4+2], m[band_id*4+3], m[band_id*4+4])"
    s"""${p}hs AS (
      |  SELECT doc_id,
      |    list_transform(s, x -> ('0x' || substring(md5(x), 1, 15))::BIGINT % $Prime) AS h
      |  FROM $src
      |),
      |${p}mh AS (
      |  SELECT doc_id, [
      |      $minExprs
      |    ] AS m
      |  FROM ${p}hs
      |),
      |${p}buckets AS (
      |  SELECT doc_id, band_id, $bandKey AS band_key
      |  FROM ${p}mh, (SELECT unnest(range(0, $Bands)) AS band_id)
      |),
      |${p}cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM ${p}buckets a JOIN ${p}buckets b
      |    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
      |)""".stripMargin
  }

  /** The shared `sh0/sh` shingle CTEs (`sh` = non-empty shingle sets).
    * `first_sh` comes from the TOKEN array, not `s[1]` — DuckDB's
    * `list_distinct` does not preserve element order (Spark's
    * `array_distinct` does, so `element_at(sh, 1)` is the same value). */
  private val shingleCtes: String =
    s"""sh0 AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(w)-1),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s,
      |    w[1] || ' ' || w[2] || ' ' || w[3] AS first_sh
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') w FROM documents)
      |),
      |sh AS (SELECT doc_id, s, first_sh FROM sh0 WHERE len(s) > 0)""".stripMargin

  private[ext] lazy val minhashVerifiedCtes: String =
    s"""$shingleCtes,
      |${minhashBandCtes("sh", "")},
      |verified AS (
      |  SELECT doc_a, doc_b, jaccard FROM (
      |    SELECT doc_a, doc_b,
      |      len(list_intersect(x.s, y.s))::DOUBLE
      |        / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS jaccard
      |    FROM cand JOIN sh x ON x.doc_id = cand.doc_a JOIN sh y ON y.doc_id = cand.doc_b
      |  ) WHERE jaccard >= 0.8
      |)""".stripMargin

  /** DuckDB restatement of [[minhashLsh]] — engine-portable arithmetic
    * end to end, so the driver hash-compares dd3 instead of counting
    * rows. */
  lazy val minhashLshOracle: String =
    s"""WITH $minhashVerifiedCtes
      |SELECT doc_a, doc_b, jaccard FROM verified ORDER BY doc_a, doc_b""".stripMargin

  /** SimHash width: 60 bits — the md5-prefix token hash both engines can
    * compute ( `('0x'||substring(md5(tok),1,15))::BIGINT` in DuckDB,
    * `conv(substring(md5(tok),1,15),16,10)` in Spark ) yields 60 portable
    * bits, which is what lets dd4 be hash-compared instead of rows-only. */
  val SimhashBits = 60

  /** dd4: SimHash signatures. Tokens are exploded once; the bit counters
    * are plain conditional sums (map-side combined), so the cost is one
    * narrow pass + one shuffle on doc_id. The 4×15-bit chunk keys support
    * hamming-distance banding (pigeonhole: hamming ≤ 3 ⇒ ≥1 of 4 chunks
    * identical); DedupSpec exercises the pairing. */
  private def simhashCore(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir).documents
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      .withColumn("h",
        expr(graft.engine.PortableHash.md5Prefix60("tok")))
    val bitSums = (0 until SimhashBits).map { i =>
      sum(when(expr(s"(h >> $i) & 1") === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val sig = (0 until SimhashBits)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L))
      .reduce(_ + _)
    toks.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .withColumn("simhash", sig)
      .select(
        col("doc_id"), col("simhash"),
        expr("simhash & 32767").as("chunk0"),
        expr("(simhash >> 15) & 32767").as("chunk1"),
        expr("(simhash >> 30) & 32767").as("chunk2"),
        expr("(simhash >> 45) & 32767").as("chunk3"))
  }

  def simhashSignatures(spark: SparkSession, dir: String): DataFrame =
    simhashCore(spark, dir).orderBy("doc_id")

  /** Shared CTE chain ending in `sigs(doc_id, simhash)` — the portable
    * SQL core of [[simhashOracle]] and [[simhashPairsOracle]]. */
  private lazy val simhashCoreSql: String = {
    val bitSums = (0 until SimhashBits)
      .map(i => s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
      .mkString(",\n      ")
    val sig = (0 until SimhashBits)
      .map(i => s"(CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents
      |),
      |h AS (
      |  SELECT doc_id, ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h FROM toks
      |),
      |bits AS (
      |  SELECT doc_id,
      |      $bitSums
      |  FROM h GROUP BY doc_id
      |),
      |sigs AS (
      |  SELECT doc_id, CAST($sig AS BIGINT) AS simhash FROM bits
      |)""".stripMargin
  }

  /** DuckDB restatement of [[simhashSignatures]]: same md5-prefix token
    * hash, same ±1 bit votes, same 15-bit chunking — dd4 is
    * hash-compared, not rows-only. */
  lazy val simhashOracle: String =
    s"""$simhashCoreSql
      |SELECT doc_id, simhash,
      |  simhash & 32767 AS chunk0,
      |  (simhash >> 15) & 32767 AS chunk1,
      |  (simhash >> 30) & 32767 AS chunk2,
      |  (simhash >> 45) & 32767 AS chunk3
      |FROM sigs ORDER BY doc_id""".stripMargin

  /** DuckDB restatement of [[simhashPairs]] at the given radius —
    * chunk-pigeonhole banding + popcount verify, same portable
    * signatures. */
  def simhashPairsOracle(maxHamming: Int): String =
    s"""$simhashCoreSql,
      |chunks AS (
      |  SELECT doc_id, simhash, c.chunk_id,
      |    CASE c.chunk_id WHEN 0 THEN simhash & 32767
      |         WHEN 1 THEN (simhash >> 15) & 32767
      |         WHEN 2 THEN (simhash >> 30) & 32767
      |         ELSE (simhash >> 45) & 32767 END AS chunk_val
      |  FROM sigs, (SELECT unnest(range(0, 4)) AS chunk_id) c
      |)
      |SELECT doc_a, doc_b, hamming FROM (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
      |  FROM chunks a JOIN chunks b
      |    ON a.chunk_id = b.chunk_id AND a.chunk_val = b.chunk_val
      |       AND a.doc_id < b.doc_id
      |) WHERE hamming <= $maxHamming ORDER BY doc_a, doc_b""".stripMargin

  /** Hamming-banded SimHash near-dup candidates (used by DedupSpec and
    * exposed as dd4b): join on any equal 15-bit chunk, verify
    * popcount(xor) ≤ maxHamming. */
  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 6): DataFrame = {
    val sigs = simhashCore(spark, dir)
    val chunks = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("chunk_id"), col(s"chunk$i").as("chunk_val"))): _*)).as("c"))
      .select(col("doc_id"), col("simhash"), col("c.chunk_id"), col("c.chunk_val"))
    val l = chunks.select(col("chunk_id"), col("chunk_val"),
      col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
    val r = chunks.select(col("chunk_id"), col("chunk_val"),
      col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
    l.join(r, Seq("chunk_id", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** dd5: embedding-cosine near-dup — top-50 most-similar vector pairs
    * within label blocks via the native codegen'd CosineSimilarity
    * expression; ranking on round(cos, 6) keeps cross-engine order
    * stable. */
  def embeddingTopPairs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    val e = Tables(spark, dir).embeddings
    val a = e.select(col("label"), col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = e.select(col("label"), col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos_r", round(expr("cosine_sim(emb_a, emb_b)"), 6))
      .select(col("label").cast("int").as("label"), col("vec_a"), col("vec_b"), col("cos_r"))
      .orderBy(col("cos_r").desc, col("vec_a"), col("vec_b"))
      .limit(50)
  }

  val embeddingTopPairsOracle: String =
    """SELECT CAST(a.label AS INTEGER) AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                               CAST(b.embedding AS DOUBLE[])), 6) AS cos_r
      |FROM embeddings a JOIN embeddings b
      |  ON a.label = b.label AND a.vec_id < b.vec_id
      |ORDER BY cos_r DESC, vec_a, vec_b LIMIT 50""".stripMargin

  /** Chunks per label block in the dd5b triangle grid. On a cluster this
    * would scale with the hot block size (C ≈ √(block²/target_task_pairs));
    * 4 is plenty at fixture scale and keeps replication at C+1 = 5×. */
  val GridChunks = 4

  /** dd5b: the SAME exact top-50 as dd5 (same oracle, hash-identical
    * output), restructured so a hot label cannot sink the job. dd5's
    * `a.join(b, "label")` puts an entire label block into one task —
    * O(block²) pairs in one place. dd5b splits each block into C chunks
    * and enumerates the C(C+1)/2 chunk-pairs as separate join keys
    * (the Afrati–Ullman triangle partitioning): the left row for chunk i
    * replicates to grid cells (i, j≥i), the right row for chunk j to
    * (i≤j, j), so every pair lands in exactly one cell — off-diagonal
    * cells once in one orientation (normalized with least/greatest),
    * diagonal cells in both (filtered to vec_a < vec_b). Tasks carry
    * block²/C² pairs (64× less memory at C=8) and a hot label runs on
    * C(C+1)/2 cores instead of 1, at the cost of (C+1)× input
    * replication. The final TakeOrderedAndProject keeps only 50 rows per
    * partition, so the ordering shuffle is O(50·partitions).
    *
    * Why not an LSH prefilter here (the obvious "candidate-bounded"
    * shape)? Exactness math: this fixture's top-50 cutoff is cos ≈ 0.33
    * with continuous pair density just below it; at that angle a random
    * hyperplane agrees with probability 0.61 vs 0.50 for noise, giving an
    * LSH ρ = ln0.61/ln0.5 ≈ 0.72 — full recall of the top-50 forces
    * ≥60% of all pairs into the candidate set, i.e. LSH cannot bound
    * candidates in the modest-similarity top-k regime. LSH is the right
    * tool at near-dup similarity (cos ≥ 0.9), which dd5c implements. */
  def embeddingTopPairsGrid(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    val e = Tables(spark, dir).embeddings
      .withColumn("ch", pmod(xxhash64(col("vec_id")), lit(GridChunks)).cast("int"))
    val left = e.select(col("label"), col("vec_id").as("vec_a"),
        col("embedding").as("emb_a"), col("ch").as("i"))
      .withColumn("j", explode(expr(s"sequence(i, ${GridChunks - 1})")))
    val right = e.select(col("label"), col("vec_id").as("vec_b"),
        col("embedding").as("emb_b"), col("ch").as("j"))
      .withColumn("i", explode(expr("sequence(0, j)")))
    left.join(right, Seq("label", "i", "j"))
      .filter(col("i") < col("j") || col("vec_a") < col("vec_b"))
      .withColumn("cos_r", round(expr("cosine_sim(emb_a, emb_b)"), 6))
      .select(col("label").cast("int").as("label"),
        least(col("vec_a"), col("vec_b")).as("vec_a"),
        greatest(col("vec_a"), col("vec_b")).as("vec_b"),
        col("cos_r"))
      .orderBy(col("cos_r").desc, col("vec_a"), col("vec_b"))
      .limit(50)
  }

  /** Cosine threshold defining "near-duplicate" for dd5c. At cos ≥ 0.9 a
    * hyperplane bit agrees with prob 0.86, so the 8×6-bit band miss rate
    * is (1 − 0.86⁶)^8 ≈ 2%, and ≈ 1.3e-4 at cos 0.98 (real dup edits) —
    * while random pairs collide at ~11% (ann2's analysis). */
  val NearDupTau = 0.9

  /** dd5c candidate pairs: same-label vectors sharing ≥1 LSH (table,
    * bucket) — bare (label, vec_a, vec_b) ids only, the dd3 trick, so no
    * embedding array ever rides the band-bucket shuffle. */
  def embeddingLshCandidates(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val buckets = Similarity.bucketAssignments(e, "embedding")
      .select(col("label"), col("table_id"), col("bucket"), col("vec_id"))
    val l = buckets.withColumnRenamed("vec_id", "vec_a")
    val r = buckets.withColumnRenamed("vec_id", "vec_b")
    l.join(r, Seq("label", "table_id", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select("label", "vec_a", "vec_b")
      .dropDuplicates("vec_a", "vec_b")
  }

  /** dd5c: candidate-bounded embedding near-dup — the 100 TB dedup shape.
    * LSH band buckets (reusing ann2's hyperplanes) propose id-only
    * candidate pairs; embeddings are joined back only for the candidates
    * and exact cosine keeps pairs ≥ [[NearDupTau]]. The fixture corpus
    * has no embedding near-dups (max pairwise cos ≈ 0.48) so the
    * oracle-checked output is empty on driver fixtures; DedupSpec plants
    * cos ≈ 0.98 duplicate vectors and asserts 100% recall with the
    * candidate set ≪ all pairs. */
  def embeddingLshDup(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    val e = Tables(spark, dir).embeddings
    embeddingLshCandidates(spark, dir)
      .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")), Seq("vec_a"))
      .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")), Seq("vec_b"))
      .withColumn("cos_r", round(expr("cosine_sim(emb_a, emb_b)"), 6))
      .filter(col("cos_r") >= NearDupTau)
      .select(col("label").cast("int").as("label"), col("vec_a"), col("vec_b"), col("cos_r"))
      .orderBy("vec_a", "vec_b")
  }

  val embeddingLshDupOracle: String =
    s"""SELECT CAST(a.label AS INTEGER) AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                               CAST(b.embedding AS DOUBLE[])), 6) AS cos_r
      |FROM embeddings a JOIN embeddings b
      |  ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                                   CAST(b.embedding AS DOUBLE[])), 6) >= $NearDupTau
      |ORDER BY vec_a, vec_b""".stripMargin

  /** Connected components over undirected pair edges via alternating
    * large-star / small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14). Large-star hangs
    * every larger neighbor of each vertex under that vertex's minimum
    * neighbor; small-star re-hangs the smaller neighbors; alternating
    * the two contracts chains geometrically, so the fixed point —
    * disjoint stars rooted at each component's minimum — arrives in
    * O(log) rounds where plain min-label propagation needs O(diameter).
    * Every round shuffles only the CURRENT EDGE LIST (never the corpus),
    * `localCheckpoint` truncates the iterative lineage, and the
    * fixed-point gate is an exact multiset compare (count + anti-join)
    * on the edge list. Returns (labels, rounds): one (doc_id, label)
    * row per vertex with label = component minimum. */
  def connectedComponents(pairs: DataFrame): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    // canonical orientation u > v; drop self loops; dedupe
    val init = pairs.toDF("a", "b")
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()

    // large-star: for each vertex x (over symmetrized edges) with
    // m(x) = min(x ∪ N(x)), emit (y, m(x)) for every neighbor y > x.
    // Output stays oriented u > v and never self-loops (y > x ≥ m).
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      sym.join(m, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }

    // small-star: edges arrive oriented u > v; with m(u) = min N(u),
    // re-hang u and all its other (smaller) neighbors under m(u).
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy("u").agg(min("v").as("m"))
      val rehung = e.join(m, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      rehung.unionAll(m.select(col("u"), col("m").as("v"))).distinct()
    }

    var edges = init
    var converged = edges.isEmpty
    var rounds = 0
    while (!converged && rounds < 50) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      // fixed-point gate in ONE job: both sides are distinct sets, so
      // tagging 1/2 and summing per edge yields 3 exactly on the
      // intersection — any other total is an asymmetric edge
      converged = edges.select(col("u"), col("v"), lit(1).as("s"))
        .unionAll(next.select(col("u"), col("v"), lit(2).as("s")))
        .groupBy("u", "v").agg(sum("s").as("t"))
        .filter(col("t") =!= 3)
        .isEmpty
      edges = next
      rounds += 1
    }
    require(converged, s"large-star/small-star did not converge in $rounds rounds")
    val roots = edges.select(col("v").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
    val children = edges.groupBy(col("u").as("doc_id")).agg(min("v").as("label"))
    (children.unionByName(roots), rounds)
  }

  /** dd6: duplicate-cluster resolution — the step after pair detection
    * that an actual dedup pipeline needs: near-dup PAIRS form a graph
    * whose connected components are the duplicate clusters; the canonical
    * document is the min doc_id per component. The edge list comes from
    * [[minhashPairs]] (MinHash banding), NOT the dd2 prefix blocking: a
    * hot boilerplate prefix makes dd2's candidate set quadratic in the
    * hottest block, while banding bounds candidates by signature
    * collision — the difference between a demo and the 100 TB shape.
    * Runs [[connectedComponents]] (large-star/small-star), so even
    * pathological chain-of-dups diameters cost logarithmically many
    * edge-list shuffles. */
  def dupClusters(spark: SparkSession, dir: String): DataFrame =
    dupClusterTable(spark, dir).orderBy("cluster_id", "doc_id")

  /** The duplicate-cluster table as a MATERIALIZED corpus-snapshot
    * artifact (ann3b's build-once/probe-read lifecycle — see
    * [[Similarity.ivfIndexedTopK]]): the banding → verify → connected-
    * components chain is a function of the corpus alone, consumed by
    * three operators (dd6's report, dd10's reweighting, tx9's cleaning
    * funnel), so recomputing it per consumer multiplies the most
    * expensive dedup stage by the consumer count (measured: dd10 at
    * 9.5 s vs dd6's 2.1 s in the same r5 driver suite — the chain ran
    * twice). Built at most once per corpus snapshot, gated by the same
    * content manifest ann3b uses (file name|size|mtime of the source —
    * a `cp -p` restore flips it where newest-mtime would not), then
    * every consumer is a bare parquet read of (cluster_id, doc_id). */
  private[graft] def dupClusterTable(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.engine.Graft.tmpDir(
      "dd6-clusters-" + dir.replaceAll("[^A-Za-z0-9.]", "_"))
    val manifestFile = new java.io.File(path, "_GRAFT_SRC_MANIFEST")
    val current = Similarity.srcManifest(new java.io.File(s"$dir/documents.parquet"))
    val recorded =
      if (manifestFile.exists())
        new String(java.nio.file.Files.readAllBytes(manifestFile.toPath), "UTF-8")
      else ""
    if (!new java.io.File(path, "_SUCCESS").exists() || recorded != current) {
      val pairs = minhashPairs(spark, dir).select("doc_a", "doc_b")
      val (labels, _) = connectedComponents(pairs)
      labels.select(col("label").as("cluster_id"), col("doc_id"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
      java.nio.file.Files.write(manifestFile.toPath, current.getBytes("UTF-8"))
    }
    spark.read.parquet(path)
  }

  /** Oracle for [[dupClusters]]: dd3's verified-pair CTE chain + a
    * recursive reachability closure; cluster id = min reachable doc id. */
  lazy val dupClustersOracle: String =
    s"""WITH RECURSIVE $minhashVerifiedCtes,
      |edges AS (
      |  SELECT doc_a AS u, doc_b AS v FROM verified
      |  UNION SELECT doc_b, doc_a FROM verified
      |),
      |reach(doc_id, r) AS (
      |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      |  UNION
      |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.doc_id = e.v
      |)
      |SELECT min(r) AS cluster_id, doc_id FROM reach
      |GROUP BY doc_id ORDER BY cluster_id, doc_id""".stripMargin

  /** Duplicate-passage window width. 8 words is the published
    * exact-substring-dedup grain (Lee et al. use 50 BPE tokens; at the
    * fixture's short-word vocabulary 8 words ≈ the same specificity):
    * long enough that organic text collides only on true shared
    * passages, short enough to catch partial-document copying that
    * whole-document fingerprints (dd1) miss. */
  val PassageN = 8

  /** dd7: cross-document duplicate-PASSAGE detection — the exact-
    * substring layer of a dedup stack (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better"), expressed at fixed
    * [[PassageN]]-gram granularity: a window is duplicated iff its
    * 8-gram occurs in ≥ 2 DISTINCT documents (within-document repeats
    * don't count — that's tx11's repetition filter). Output is the
    * per-doc report: window counts + a keep flag (keep iff < 20% of
    * windows are duplicated); the filtered corpus is `WHERE keep`.
    *
    * The 100 TB shape: grams travel as 60-bit md5 hashes (8 bytes vs
    * ~72-byte strings — the shuffle is id-width), and every aggregate
    * is map-side combinable: (ghash, doc_id) pre-aggregation crushes
    * within-doc repeats before the exchange, the distinct-doc count is
    * a count over that pre-agg (never a count-distinct expand), and a
    * boilerplate gram shared by B docs costs B pair rows — linear in
    * pair-table size, no quadratic block. The pair table is persisted
    * (scope-released, [[graft.engine.Caching]]) because it feeds both
    * the frequency agg and the join back: column pruning strips the
    * occurrence count from the frequency branch, so the two pre-agg
    * subtrees are NOT canonically equal and exchange reuse cannot
    * kick in — without the persist the corpus would be scanned and
    * exploded twice (verified in the AQE final plan). Skewed grams
    * stay safe: the hot key's rows hit the join pre-split by AQE, and
    * no window ever collects a gram's full posting list into one
    * task. */
  def dupPassages(spark: SparkSession, dir: String): DataFrame =
    dupPassagesOf(Tables(spark, dir).documents)

  /** [[dupPassages]] over any `(doc_id, text)` frame (spec entry). */
  private[graft] def dupPassagesOf(docs: DataFrame): DataFrame = {
    // fan the unsplittable doc scan BEFORE the tokenize/window/md5 chain
    // (Graft.fanScan: the whole per-window hash pipeline otherwise runs
    // in the scan's single task); keyed by doc_id so the pre-agg's
    // (ghash, doc_id) exchange stays the only wide hop
    val d = graft.engine.Graft.fanScan(docs, col("doc_id"))
      .withColumn("w", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"),
        expr(TextAnalysis.ngramExpr(PassageN, distinct = false)).as("gr"))
    val pairs = Caching.persist(
      d.select(col("doc_id"), explode(col("gr")).as("ng"))
        .select(col("doc_id"),
          expr(graft.engine.PortableHash.md5Prefix60("ng")).as("ghash"))
        .groupBy("ghash", "doc_id").agg(count(lit(1)).as("c")))
    // per-doc window totals fall out of the cached pair table (sum of
    // within-doc occurrence counts == window count); only the doc-id
    // universe needs the source again — a doc_id-only column scan, so
    // the text is read and tokenized exactly once
    val winPerDoc = pairs.groupBy("doc_id").agg(sum("c").cast("bigint").as("nw"))
    val dupGrams = pairs.groupBy("ghash").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select("ghash")
    val dup = pairs.join(dupGrams, "ghash")
      .groupBy("doc_id").agg(sum("c").cast("bigint").as("dw"))
    docs.select("doc_id")
      .join(winPerDoc, Seq("doc_id"), "left_outer")
      .join(dup, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"),
        coalesce(col("nw"), lit(0L)).as("n_windows"),
        coalesce(col("dw"), lit(0L)).as("dup_windows"),
        (coalesce(col("dw"), lit(0L)) * 5 < coalesce(col("nw"), lit(0L)) ||
          coalesce(col("nw"), lit(0L)) === 0).as("keep"))
      .orderBy("doc_id")
  }

  lazy val dupPassagesOracle: String = {
    val gram = (0 until PassageN).map(j => s"w[i+$j]").mkString(" || ' ' || ")
    s"""WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w FROM documents),
      |g AS (
      |  SELECT doc_id, greatest(len(w) - ${PassageN - 1}, 0) AS n_windows,
      |    list_transform(range(1, len(w) - ${PassageN - 2}), i -> $gram) AS gr
      |  FROM d),
      |p AS (
      |  SELECT ('0x' || substring(md5(ng), 1, 15))::BIGINT AS ghash, doc_id, count(*) AS c
      |  FROM (SELECT doc_id, unnest(gr) AS ng FROM g) GROUP BY 1, 2),
      |f AS (SELECT ghash FROM p GROUP BY 1 HAVING count(*) >= 2),
      |dup AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS dup_windows
      |  FROM p JOIN f USING (ghash) GROUP BY 1)
      |SELECT g.doc_id AS doc_id,
      |       CAST(g.n_windows AS BIGINT) AS n_windows,
      |       coalesce(dup.dup_windows, 0) AS dup_windows,
      |       (coalesce(dup.dup_windows, 0) * 5 < g.n_windows OR g.n_windows = 0) AS keep
      |FROM g LEFT JOIN dup USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  // -- dd10: dedup-aware reweighting (soft dedup) ----------------------

  /** dd10: dedup-aware REWEIGHTING — the soft alternative to dropping:
    * instead of discarding a near-dup cluster's members, keep the
    * exemplar (min doc_id — which IS the cluster label, so no extra
    * join to find it) carrying `weight = cluster size`, and give every
    * un-clustered document weight 1. Downstream sampling then draws the
    * exemplar proportionally to how often its content appeared — the
    * frequency signal duplicate-dropping throws away (the
    * importance-resampling view of dedup, cf. DataComp-LM's treatment
    * of duplicate counts as a quality feature). Invariant:
    * `sum(weight) == |corpus|`, so the training-token budget is
    * preserved exactly. Cost on top of [[dupClusters]] is one count
    * per cluster label plus an anti-join of the (bare-id) member set
    * against the corpus — id-width shuffles only. */
  def dedupWeights(spark: SparkSession, dir: String): DataFrame = {
    // reads the materialized cluster artifact — the chain behind it is
    // built once per corpus snapshot, not once per consumer
    val clusters = dupClusterTable(spark, dir).select("cluster_id", "doc_id")
    val exemplars = clusters.groupBy("cluster_id")
      .agg(count(lit(1)).as("weight"))
      .select(col("cluster_id").as("doc_id"), col("weight"))
    val singletons = Tables(spark, dir).documents.select("doc_id")
      .join(clusters.select("doc_id"), Seq("doc_id"), "left_anti")
      .withColumn("weight", lit(1L))
    singletons.unionByName(exemplars).orderBy("doc_id")
  }

  lazy val dedupWeightsOracle: String =
    s"""WITH RECURSIVE $minhashVerifiedCtes,
      |edges AS (
      |  SELECT doc_a AS u, doc_b AS v FROM verified
      |  UNION SELECT doc_b, doc_a FROM verified
      |),
      |reach(doc_id, r) AS (
      |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      |  UNION
      |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.doc_id = e.v
      |),
      |clusters AS (SELECT min(r) AS cluster_id, doc_id FROM reach GROUP BY doc_id),
      |cw AS (
      |  SELECT cluster_id AS doc_id, CAST(count(*) AS BIGINT) AS weight
      |  FROM clusters GROUP BY 1)
      |SELECT doc_id, weight FROM cw
      |UNION ALL
      |SELECT d.doc_id, CAST(1 AS BIGINT) AS weight
      |FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
      |WHERE c.doc_id IS NULL
      |ORDER BY doc_id""".stripMargin

  // -- dd9: bloom-prefiltered incremental (re-delivery) dedup ----------

  /** Sketch sizing for [[bloomDedup]]: ~8 bits per expected history
    * fingerprint at 1 M items → a 1 MiB sketch (ε ≈ 2%). At 100 TB the
    * estimate scales with the history's row count, not its bytes — a
    * billion-document history is a ~1 GiB sketch, still a broadcast,
    * not a shuffle. */
  val BloomEstItems = 1000000L
  val BloomNumBits  = 8388608L

  /** [[bloomDedup]] over any `(doc_id, text)` frame, with the sketch
    * size exposed so the spec can force false positives. Returns
    * (result, probed-incoming) — the second frame carries the raw
    * `maybe_dup` bloom verdicts for the no-false-negative assertion. */
  private[graft] def bloomDedupOf(
      spark: SparkSession, docs: DataFrame, numBits: Long): (DataFrame, DataFrame) = {
    graft.functions.BloomSketch.register(spark)
    val fp = docs.select(
      col("doc_id"),
      md5(regexp_replace(lower(col("text")), "\\s+", " ").cast("binary")).as("fingerprint"))
    val history  = fp.filter(col("doc_id") % 10 < 8)
    val incoming = fp.filter(col("doc_id") % 10 >= 6)
    // One full-history pass reduces to an O(numBits/8) driver-side
    // sketch — the only per-epoch touch of history outside the verify
    // join, and the merge is a bitwise OR, so the bitset is identical
    // under any partitioning. A null sketch means the history was empty:
    // every incoming row is new and the probe short-circuits to false.
    val sketch = history
      .agg(call_function("graft_bloom_agg",
        xxhash64(col("fingerprint")), lit(BloomEstItems), lit(numBits)).as("bf"))
      .head.getAs[Array[Byte]](0)
    val probe =
      if (sketch == null) lit(false)
      else call_function("graft_bloom_might_contain", lit(sketch), xxhash64(col("fingerprint")))
    val probed = Caching.persist(incoming.withColumn("maybe_dup", probe))
    // Definite-new rows (the vast majority of a healthy batch) never
    // reach an exchange; only bloom positives — true re-deliveries plus
    // the ε false-positive tail — join history for the exact verdict.
    val negatives = probed.filter(!col("maybe_dup"))
      .select(col("doc_id"), lit(false).as("is_dup"))
    val histFp = history.select("fingerprint").distinct().withColumn("hit", lit(true))
    val verified = probed.filter(col("maybe_dup"))
      .join(histFp, Seq("fingerprint"), "left_outer")
      .select(col("doc_id"), coalesce(col("hit"), lit(false)).as("is_dup"))
    (negatives.unionByName(verified).orderBy("doc_id"), probed)
  }

  /** dd9: incremental ingest dedup with a bloom prefilter — the
    * at-least-once re-delivery scenario: an ingest batch (`doc_id % 10
    * >= 6`) partially overlaps the already-landed history (`doc_id % 10
    * < 8`; the `{6,7}` residues are the re-delivered rows), and each
    * incoming document must be classified dup-vs-new BY CONTENT before
    * landing. The naive shape joins the whole batch against the whole
    * history every epoch; here Spark's own `BloomFilterAggregate` /
    * `BloomFilterMightContain` (the runtime row-level-filter machinery,
    * invoked declaratively — [[graft.functions.BloomSketch]]) compress
    * history to a ~1 MiB sketch, the batch probes it without shuffling,
    * and only bloom positives enter the exact fingerprint join. Bloom
    * errors are one-sided, so the final `is_dup` is EXACT: negatives
    * are definitely new, and the verify join clears the ε false
    * positives — which is why the query stays DuckDB-oracle-checkable
    * (plain semi-join semantics) despite the approximate prefilter. */
  def bloomDedup(spark: SparkSession, dir: String): DataFrame =
    bloomDedupOf(spark, Tables(spark, dir).documents, BloomNumBits)._1

  lazy val bloomDedupOracle: String =
    """WITH fp AS (
      |  SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint
      |  FROM documents),
      |hist AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 10 < 8)
      |SELECT i.doc_id AS doc_id, (h.fingerprint IS NOT NULL) AS is_dup
      |FROM fp i LEFT JOIN hist h ON i.fingerprint = h.fingerprint
      |WHERE i.doc_id % 10 >= 6
      |ORDER BY doc_id""".stripMargin

  // -- dd11: exact-substring scrub (span rewrite) ----------------------

  /** dd11: exact-substring deduplication with TEXT REWRITE — the Lee
    * et al. 2022 ("Deduplicating Training Data Makes Language Models
    * Better") treatment, at [[PassageN]]-gram grain instead of suffix
    * arrays: any token span that recurs ANYWHERE in the corpus
    * (cross-doc or within-doc, total occurrences >= 2) is cut out of
    * every document, and the survivors are re-assembled in order. Where
    * dd7 only *reports* per-doc duplication, this emits the scrubbed
    * corpus — the form that actually ships to training.
    *
    * The 100 TB shape, stage by stage:
    *   - gram fingerprints travel as 60-bit hashes with their start
    *     position — never the gram text — so the frequency shuffle is
    *     ~12 bytes/window;
    *   - duplicated-gram detection is one partial/final count on the
    *     hash (map-side combine absorbs within-partition repeats);
    *   - coverage EXPANSION (each dup window -> its [[PassageN]]
    *     covered positions) happens only on matched windows — a sliver
    *     of the corpus — and dedups to `(doc_id, position)`;
    *   - the rewrite is a positional anti-join of exploded tokens
    *     against covered positions, both hash-partitioned on doc_id, so
    *     re-assembly needs no per-token membership probe against a
    *     collected set (linear, no O(len x spans) lambda scans);
    *   - `concat_ws` over the position-sorted survivors restores the
    *     text; docs shorter than one window pass through untouched.
    * Ref analog: none — the reference keeps raw payloads
    * (`dbt_project/models/staging/stg_trades.sql:1-9` trusts upstream
    * uniqueness); this is the corpus-hygiene extension. */
  def substringScrub(spark: SparkSession, dir: String): DataFrame =
    substringScrubOf(Tables(spark, dir).documents)

  /** [[substringScrub]] over any `(doc_id, text)` frame (spec entry). */
  private[graft] def substringScrubOf(docs: DataFrame): DataFrame = {
    val d = docs
      .withColumn("w", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), col("w"))
    val base = Caching.persist(d)
    // the gram table feeds the occurrence count AND the matched-window
    // join — unpersisted, the md5 of every window runs twice (r11 s3) —
    // but its cache lifetime is ONLY the coverage computation below:
    // covDoc (tiny — one row per doc that contains a duplicated span)
    // materializes eagerly and the per-window cache is freed BEFORE the
    // heavy rebuild stage runs (r12: riding both caches through the
    // whole query competed with suite-resident caches and spilled —
    // 2.2 s isolated vs 5.5 s in-suite)
    val pos = base
      .select(col("doc_id"),
        posexplode(expr(TextAnalysis.ngramExpr(PassageN, distinct = false))))
      .select(col("doc_id"), col("pos"),
        expr(graft.engine.PortableHash.md5Prefix60("col")).as("ghash"))
      .persist()
    // total-occurrence count (not distinct docs): a span repeated
    // inside one document is as much a training dup as a cross-doc one.
    // Kept as agg + join-back (NOT a per-gram collect_list) so a
    // boilerplate gram repeated 10⁹ times never materializes one list.
    val dupGrams = pos.groupBy("ghash").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select("ghash")
    // ONLY matched windows cross the doc_id exchange (r11 s3 — the old
    // shape pos-exploded EVERY corpus token through a (doc_id, j)
    // anti-join); coverage expansion, the kept-position complement, and
    // the text rebuild are all LOCAL array ops on the per-doc row:
    // array_except is hash-set linear, element_at is O(1) per token
    val covDoc =
      try {
        val cd = Caching.persist(pos.join(dupGrams, "ghash")
          .groupBy("doc_id")
          .agg(array_distinct(flatten(collect_list(
            sequence(col("pos"), col("pos") + lit(PassageN - 1))))).as("cov")))
        cd.count() // materialize while the gram cache is still live
        cd
      } finally pos.unpersist(blocking = false)
    base.join(covDoc, Seq("doc_id"), "left_outer")
      .withColumn("allpos",
        when(size(col("w")) === 0, array().cast("array<int>"))
          .otherwise(sequence(lit(0), size(col("w")) - 1)))
      .withColumn("keptpos", array_sort(array_except(col("allpos"),
        coalesce(col("cov"), array().cast("array<int>")))))
      .select(
        col("doc_id"),
        concat_ws(" ",
          transform(col("keptpos"), j => element_at(col("w"), j + 1))).as("clean_text"),
        size(col("keptpos")).cast("bigint").as("n_kept"),
        (size(col("w")) - size(col("keptpos"))).cast("bigint").as("n_removed"))
      .orderBy("doc_id")
  }

  lazy val substringScrubOracle: String = {
    val n = PassageN
    val gram = (0 until n).map(j => s"w[i+$j]").mkString(" || ' ' || ")
    s"""WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, greatest(len(w) - ${n - 2}, 1)),
      |      i -> {'pos': i - 1,
      |            'ghash': ('0x' || substring(md5($gram), 1, 15))::BIGINT}),
      |      recursive := true)
      |  FROM d),
      |dup AS (SELECT ghash FROM g GROUP BY 1 HAVING count(*) >= 2),
      |cov AS (
      |  SELECT DISTINCT doc_id, unnest(range(pos, pos + $n)) AS j
      |  FROM g JOIN dup USING (ghash)),
      |tok AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(w) + 1), j -> {'j': j - 1, 't': w[j]}),
      |      recursive := true)
      |  FROM d),
      |kept AS (
      |  SELECT t.doc_id, t.j, t.t
      |  FROM tok t ANTI JOIN cov c ON t.doc_id = c.doc_id AND t.j = c.j),
      |re AS (
      |  SELECT doc_id, string_agg(t, ' ' ORDER BY j) AS clean_text, count(*) AS n_kept
      |  FROM kept GROUP BY 1)
      |SELECT d.doc_id AS doc_id,
      |       coalesce(re.clean_text, '') AS clean_text,
      |       CAST(coalesce(re.n_kept, 0) AS BIGINT) AS n_kept,
      |       CAST(len(d.w) - coalesce(re.n_kept, 0) AS BIGINT) AS n_removed
      |FROM d LEFT JOIN re USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  /** dd12's sketch size (per-source bottom-k summary). */
  val OverlapK = 64

  /** dd12: cross-source corpus overlap via BOTTOM-K sketches — the
    * "how much does source A duplicate source B" signal that drives
    * mixing/dedup decisions between crawl snapshots. Each source's
    * shingle set collapses to its k smallest 60-bit shingle hashes (a
    * bottom-k sketch — order-statistics cousin of MinHash, mergeable:
    * union = k smallest of the concatenation), built natively with
    * [[graft.plans.GroupedTopK]] ascending. Pairwise estimated Jaccard
    * = |B_k(A∪B) ∩ A_sketch ∩ B_sketch| / |B_k(A∪B)|.
    *
    * The 100 TB shape: the corpus is touched ONCE to build #sources·k
    * sketch rows; all 190 pairwise comparisons then run on sketch-sized
    * data — never a corpus×corpus comparison. The output carries the
    * exact Jaccard next to the estimate (the exact side is bare-hash
    * joins, affordable at fixture scale and the spec's error anchor;
    * production runs estimate-only). Integer counts everywhere; the
    * single final division is int/int → IEEE-identical both engines. */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    // the distinct (source, h) table is CORPUS-sized and feeds exactly
    // three consumers, each sketch-sized: the per-source counts, the
    // bottom-k sketches, and the exact intersection counts. All three
    // materialize EAGERLY below and the corpus cache is freed BEFORE
    // the final assembly — riding it through the whole query competed
    // with suite-resident caches and drifted in-suite timings to ~1.5×
    // isolated (r12 verdict; same failure class as dd14/dd11, same fix)
    val sh = shingled(spark, dir)
      .select(col("source"), explode(col("sh")).as("g"))
      .select(col("source"),
        expr(graft.engine.PortableHash.md5Prefix60("g")).as("h"))
      .distinct()
      .persist()
    try {
      val n = Caching.persist(sh.groupBy("source").agg(count(lit(1)).as("n")))
      val sk = Caching.persist(
        graft.plans.GroupedTopK(sh, Seq("source"), Seq("h" -> true), k = OverlapK))
      // exact intersection counts via groupBy(h) + map-side pair
      // expansion: per-hash work is C(|sources sharing h|, 2), bounded by
      // C(#sources, 2) because sh is distinct on (source, h) — never a
      // corpus-sized self-join output. One exchange (on h) instead of a
      // two-sided shuffle join; still a full-corpus scan by nature (it IS
      // the exact side — production runs read est_jaccard and can skip it).
      val inter = Caching.persist(
        sh.groupBy("h").agg(sort_array(collect_set("source")).as("ss"))
          .filter(size(col("ss")) >= 2)
          .select(explode(expr(
            "flatten(transform(ss, (a, i) -> " +
              "transform(slice(ss, i + 2, size(ss)), b -> struct(a AS sa, b AS sb))))")).as("p"))
          .select(col("p.sa").as("sa"), col("p.sb").as("sb"))
          .groupBy("sa", "sb").agg(count(lit(1)).as("ic")))
      n.count(); sk.count(); inter.count() // drain the corpus cache NOW
      val pairs = n.select(col("source").as("sa"), col("n").as("na"))
        .join(n.select(col("source").as("sb"), col("n").as("nb")), col("sa") < col("sb"))
      val contrib = pairs.select("sa", "sb")
        .join(sk.withColumnRenamed("source", "sa"), "sa")
        .select(col("sa"), col("sb"), col("h"), lit(1).as("ina"), lit(0).as("inb"))
        .unionByName(pairs.select("sa", "sb")
          .join(sk.withColumnRenamed("source", "sb"), "sb")
          .select(col("sa"), col("sb"), col("h"), lit(0).as("ina"), lit(1).as("inb")))
      val merged = contrib.groupBy("sa", "sb", "h")
        .agg(max("ina").as("ina"), max("inb").as("inb"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("sa", "sb").orderBy("h")
      val est = merged.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= OverlapK)
        .groupBy("sa", "sb")
        .agg(sum(when(col("ina") === 1 && col("inb") === 1, 1L).otherwise(0L)).as("both"),
          count(lit(1)).as("denom"))
      pairs.join(est, Seq("sa", "sb"))
        .join(inter, Seq("sa", "sb"), "left_outer")
        .select(
          col("sa").as("source_a"), col("sb").as("source_b"),
          (col("both").cast("double") / col("denom")).as("est_jaccard"),
          (coalesce(col("ic"), lit(0L)).cast("double") /
            (col("na") + col("nb") - coalesce(col("ic"), lit(0L)))).as("exact_jaccard"),
          col("na").as("n_a"), col("nb").as("n_b"))
        .orderBy("source_a", "source_b")
    } finally sh.unpersist(blocking = false)
  }

  lazy val sourceOverlapOracle: String =
    s"""WITH d AS (SELECT source, string_split_regex(trim(text), '\\s+') w FROM documents),
      |sh AS (SELECT DISTINCT source, ('0x' || substring(md5(g), 1, 15))::BIGINT AS h FROM
      |  (SELECT source, unnest(list_transform(range(1, len(w) - 1),
      |     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g FROM d)),
      |n AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
      |sk AS (SELECT source, h FROM
      |  (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) rn FROM sh)
      |  WHERE rn <= $OverlapK),
      |pairs AS (SELECT a.source sa, a.n na, b.source sb, b.n nb
      |          FROM n a JOIN n b ON a.source < b.source),
      |contrib AS (
      |  SELECT p.sa, p.sb, s.h, 1 AS ina, 0 AS inb FROM pairs p JOIN sk s ON s.source = p.sa
      |  UNION ALL
      |  SELECT p.sa, p.sb, s.h, 0, 1 FROM pairs p JOIN sk s ON s.source = p.sb),
      |merged AS (SELECT sa, sb, h, max(ina) ina, max(inb) inb FROM contrib GROUP BY 1, 2, 3),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY sa, sb ORDER BY h) rn FROM merged),
      |est AS (SELECT sa, sb, sum(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END) AS both,
      |               count(*) AS denom
      |        FROM ranked WHERE rn <= $OverlapK GROUP BY 1, 2),
      |inter AS (SELECT a.source sa, b.source sb, count(*) ic
      |          FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source GROUP BY 1, 2)
      |SELECT p.sa AS source_a, p.sb AS source_b,
      |  CAST(est.both AS DOUBLE) / est.denom AS est_jaccard,
      |  CAST(coalesce(ic, 0) AS DOUBLE) / (p.na + p.nb - coalesce(ic, 0)) AS exact_jaccard,
      |  p.na AS n_a, p.nb AS n_b
      |FROM pairs p JOIN est ON est.sa = p.sa AND est.sb = p.sb
      |LEFT JOIN inter ON inter.sa = p.sa AND inter.sb = p.sb
      |ORDER BY source_a, source_b""".stripMargin

  /** dd13's expected chunk length: a token opens a new chunk when its
    * 60-bit hash ≡ 0 (mod 16) — boundaries every ~16 tokens. */
  val CdcMod = 16

  /** dd13: duplicate passages via CONTENT-DEFINED CHUNKING — the
    * storage-dedup technique (rolling-boundary CDC, at token grain)
    * brought to corpus hygiene. The cost/recall triangle it solves:
    * dd7's SLIDING windows are shift-robust (a window exists at every
    * offset) but emit [[PassageN]] copies of every token; DISJOINT
    * fixed blocks (`j div 16`) partition the doc — cheap — but one
    * prepended token shifts every block boundary and cross-doc
    * overlap vanishes. CDC chunks partition the doc at sliding-window
    * cost-per-token ≈ 1 AND re-synchronize: boundaries live where the
    * CONTENT says (token-hash ≡ 0 mod [[CdcMod]]), so after any
    * insertion the very next boundary re-aligns and the shared tail
    * dedups (DedupSpec pins the prepend case against the disjoint
    * baseline, which finds nothing).
    *
    * Shape: one posexplode, per-doc boundary cumsum (one doc_id
    * exchange + in-partition sort — tx8's cost class), chunk
    * fingerprints as md5 (chunks travel as 16-byte digests, never
    * text), cross-doc dup detection = count distinct docs ≥ 2 per
    * digest. Per-doc report mirrors dd7's keep-threshold contract. */
  def cdcChunkDedup(spark: SparkSession, dir: String): DataFrame =
    cdcChunkDedupOf(Tables(spark, dir).documents)

  /** [[cdcChunkDedup]] over any `(doc_id, text)` frame (spec entry). */
  private[graft] def cdcChunkDedupOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // fanScan by doc_id: parallelizes the tokenize/md5-per-token chain
    // out of the single-row-group scan task AND pre-satisfies the
    // boundary window's and the chunk agg's doc_id clustering — the
    // exchange that used to carry the full TOKEN stream now carries
    // doc-grain rows (~16× fewer bytes at CdcMod=16)
    val toks = graft.engine.Graft.fanScan(docs, col("doc_id"))
      .withColumn("w", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), posexplode(col("w")).as(Seq("j", "t")))
    val marked = toks.withColumn("is_b",
      (expr(graft.engine.PortableHash.md5Prefix60("t")) % CdcMod === 0).cast("long"))
    val chunked = marked.withColumn("chunk_id",
      sum("is_b").over(Window.partitionBy("doc_id").orderBy("j")))
    val chunks = Caching.persist(
      chunked.groupBy("doc_id", "chunk_id")
        .agg(
          md5(concat_ws(" ", transform(
            array_sort(collect_list(struct(col("j"), col("t")))),
            s => s.getField("t"))).cast("binary")).as("fp"),
          count(lit(1)).as("n_tok")))
    val dup = chunks.groupBy("fp")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select("fp")
    val flagged = chunks.join(dup.withColumn("is_dup", lit(1L)), Seq("fp"), "left_outer")
    flagged.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(coalesce(col("is_dup"), lit(0L))).as("dup_chunks"),
        sum(when(col("is_dup").isNotNull, col("n_tok")).otherwise(0L)).as("dup_tokens"))
      .withColumn("keep", col("dup_chunks") * 5 < col("n_chunks"))
      .orderBy("doc_id")
  }

  lazy val cdcChunkDedupOracle: String =
    s"""WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w FROM documents),
      |tok AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(w) + 1), j -> {'j': j - 1, 't': w[j]}),
      |      recursive := true)
      |  FROM d),
      |b AS (SELECT doc_id, j, t,
      |        CASE WHEN ('0x' || substring(md5(t), 1, 15))::BIGINT % $CdcMod = 0
      |             THEN 1 ELSE 0 END AS is_b
      |      FROM tok),
      |c AS (SELECT *, sum(is_b) OVER (PARTITION BY doc_id ORDER BY j) AS chunk_id FROM b),
      |ch AS (SELECT doc_id, chunk_id, md5(string_agg(t, ' ' ORDER BY j)) AS fp,
      |              count(*) AS n_tok
      |       FROM c GROUP BY 1, 2),
      |dup AS (SELECT fp FROM ch GROUP BY fp HAVING count(DISTINCT doc_id) >= 2)
      |SELECT ch.doc_id AS doc_id,
      |  count(*) AS n_chunks,
      |  CAST(sum(CASE WHEN dup.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
      |  CAST(sum(CASE WHEN dup.fp IS NOT NULL THEN n_tok ELSE 0 END) AS BIGINT) AS dup_tokens,
      |  (sum(CASE WHEN dup.fp IS NOT NULL THEN 1 ELSE 0 END) * 5 < count(*)) AS keep
      |FROM ch LEFT JOIN dup ON ch.fp = dup.fp
      |GROUP BY 1 ORDER BY doc_id""".stripMargin

  // -- dd14: asymmetric containment (doc-in-doc) via prefix filtering --

  /** dd14's stop-shingle document-frequency cap: shingles appearing in
    * more than this many documents are boilerplate (near-zero IDF) and
    * carry no containment signal — they are dropped BEFORE any pairing,
    * which is what bounds the per-shingle join fan-out. Containment is
    * therefore measured over the INFORMATIVE shingle space (the same
    * IDF-discipline CCNet applies to its hashes), not the raw one. */
  val ContainDfCap = 16

  /** dd14's containment threshold as an exact rational (4/5): report
    * pairs where one side shares ≥ Num/Den of its informative shingles.
    * Kept rational because the prefix length and the gate both need
    * INTEGER arithmetic — `1.0 - 0.8` is 0.19999999999999996 in IEEE,
    * so a `floor(n * (1-t))`-shaped prefix is one short whenever (1-t)·n
    * is an exact integer (n divisible by 5) and the exactness guarantee
    * silently breaks; `n - ceil(t·n) + 1` over integers cannot. */
  val ContainTNum = 4
  val ContainTDen = 5

  /** [[ContainTNum]]/[[ContainTDen]] as the display-only double. */
  val ContainT: Double = ContainTNum.toDouble / ContainTDen

  /** dd14: asymmetric containment detection — the doc-IN-doc case
    * (quoted article inside an aggregator page, README embedded in a
    * repo dump) that symmetric Jaccard misses by construction: a 50-token
    * doc fully contained in a 5000-token doc has Jaccard ≈ 0.01 but
    * containment 1.0. `cont_a = |S(A)∩S(B)| / |S(A)|` over the
    * [[ContainDfCap]]-survivor shingle space; a pair is emitted iff
    * either direction reaches [[ContainT]].
    *
    * Pairing is the df-capped hash self-join COUNT form (r18, VERDICT
    * #6 — the same shape as the oracle's `inter` CTE): survivor
    * occurrences self-join on the 60-bit shingle hash and n_common is a
    * per-pair count aggregate. [[ContainDfCap]] bounds the join fan-out
    * at df ≤ 16 per occurrence — linear in surviving corpus volume, no
    * all-pairs stage anywhere — and ONLY (doc_id, doc_id, count) rows
    * ever cross an exchange (guide §2.3 "shuffle keys and metadata
    * instead of payloads").
    *
    * History: r6–r17 used PPJoin prefix filtering (rarest-⌊(1−t)n⌋+1
    * candidate join) with an array_intersect verify. That shape needed a
    * per-doc sorted-ARRAY cache (collect_list + two sort_arrays — 1.3 s
    * of the 4.3 s warm pipeline, Dd14Probe), a candidate dropDuplicates
    * exchange, and two verify joins that ship ~50-element hash arrays
    * per candidate — the heaviest rows in the query once the per-doc
    * table outgrows a broadcast. Under the df cap BOTH forms are linear
    * with constant-factor fan-out ≤ df; the count form deletes the array
    * cache, the candidate stage and the array shuffles outright
    * (measured 1.9 → 1.0 s at sf0.1; receipts in plans/r18/). Prefix
    * filtering remains the right tool when df is UNCAPPED — here the cap
    * is the operator's own boilerplate-shingle contract.
    * Ref analog: none — corpus-hygiene extension (same family as dd2/dd3). */
  def containmentPairs(spark: SparkSession, dir: String): DataFrame =
    containmentPairsOf(shingleTable(spark, dir))

  /** [[containmentPairs]] over any `(doc_id, sh)` shingled frame. */
  private[graft] def containmentPairsOf(sh: DataFrame): DataFrame = {
    val occ = sh.select(col("doc_id"), explode(col("sh")).as("g"))
      .select(col("doc_id"), expr(graft.engine.PortableHash.md5Prefix60("g")).as("h"))
    // shingleExpr emits DISTINCT shingles per doc, so count(*) per hash
    // IS document frequency; survivors keep df for the rarity ordering
    val dfreq = occ.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") <= ContainDfCap)
    // ONE persisted artifact, pre-partitioned by the join key WHILE
    // caching (pr2's oriented-edge trick): the hash self-join then reads
    // both sides from the same h-clustered cache with ZERO extra
    // exchanges, and the per-doc size aggregate is the only other
    // consumer. Shingle-grained rows, but narrow (8-byte doc_id +
    // 8-byte hash) — a fraction of the per-doc ARRAY cache the r6–r17
    // prefix form kept (r12's spill incident was that array cache plus
    // a SECOND shingle-grained one; this form keeps exactly one).
    val surv = Caching.persist(
      occ.join(dfreq.select("h"), "h").select("doc_id", "h")
        .repartition(col("h")))
    // per-doc survivor counts: the denominator table for both ratios —
    // doc-grain, broadcastable at any SF where doc ids are
    val sz = surv.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // n_common per pair as a COUNT over the df-capped hash self-join —
    // identical to the oracle's `inter` CTE; `<` orders the pair so each
    // shared hash contributes exactly one row per unordered pair
    val pairs = surv.select(col("doc_id").as("doc_a"), col("h"))
      .join(surv.select(col("doc_id").as("doc_b"), col("h")), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
    pairs
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
      // gate on integers (inter·Den ≥ Num·n), not the double ratios —
      // the doubles are display columns only
      .filter(col("n_common") * ContainTDen >= col("n_a") * ContainTNum ||
        col("n_common") * ContainTDen >= col("n_b") * ContainTNum)
      .withColumn("cont_a", col("n_common").cast("double") / col("n_a"))
      .withColumn("cont_b", col("n_common").cast("double") / col("n_b"))
      .select("doc_a", "doc_b", "n_common", "n_a", "n_b", "cont_a", "cont_b")
      .orderBy("doc_a", "doc_b")
  }

  lazy val containmentPairsOracle: String =
    s"""WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
      |  FROM d WHERE len(w) >= 3),
      |h AS (SELECT doc_id, ('0x' || substring(md5(g), 1, 15))::BIGINT AS h FROM sh),
      |dfreq AS (SELECT h, count(*) AS df FROM h GROUP BY 1 HAVING count(*) <= $ContainDfCap),
      |surv AS (SELECT doc_id, h.h, df FROM h JOIN dfreq USING (h)),
      |sz AS (SELECT doc_id, count(*) AS n FROM surv GROUP BY 1),
      |pre AS (
      |  SELECT doc_id, h FROM (
      |    SELECT doc_id, h,
      |           row_number() OVER (PARTITION BY doc_id ORDER BY df, h) AS rk,
      |           count(*) OVER (PARTITION BY doc_id) AS n
      |    FROM surv)
      |  WHERE rk <= n - (n * $ContainTNum + ${ContainTDen - 1}) // $ContainTDen + 1),
      |cand AS (
      |  SELECT DISTINCT least(p.doc_id, s.doc_id) AS doc_a,
      |                  greatest(p.doc_id, s.doc_id) AS doc_b
      |  FROM pre p JOIN surv s ON p.h = s.h AND p.doc_id <> s.doc_id),
      |inter AS (
      |  SELECT c.doc_a, c.doc_b, count(*) AS n_common
      |  FROM cand c
      |  JOIN surv a ON a.doc_id = c.doc_a
      |  JOIN surv b ON b.doc_id = c.doc_b AND a.h = b.h
      |  GROUP BY 1, 2)
      |SELECT i.doc_a, i.doc_b, CAST(n_common AS BIGINT) AS n_common,
      |       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
      |       n_common::DOUBLE / sa.n AS cont_a,
      |       n_common::DOUBLE / sb.n AS cont_b
      |FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a
      |             JOIN sz sb ON sb.doc_id = i.doc_b
      |WHERE n_common * $ContainTDen >= sa.n * $ContainTNum
      |   OR n_common * $ContainTDen >= sb.n * $ContainTNum
      |ORDER BY doc_a, doc_b""".stripMargin

  /** dd15: INCREMENTAL MinHash-LSH dedup against a PERSISTENT index —
    * the production shape for a growing corpus: the already-ingested
    * corpus's band buckets live in a snapshot-lake table (built once,
    * clustered + string-stats'd on the band hash), and each NEW batch
    * computes signatures for ITS OWN documents only, probes the index
    * with a bucket equi-join, exact-verifies the candidates by Jaccard,
    * and APPENDS its buckets so the next batch dedups against
    * corpus+this-batch. Nothing ever re-signatures the corpus — the
    * per-batch cost is O(batch + collisions), which is what makes
    * dedup-on-arrival viable when the corpus is 100 TB and the batch is
    * a crawl increment (same family as dd9's bloom-prefilter and
    * ann3c's incremental IVF; this one carries the full LSH quality).
    *
    * Oracled end to end: the same md5-multiplicative MinHash/banding is
    * DuckDB-restatable, so per-batch-document decisions (match count,
    * best match, exact best Jaccard) hash-compare. Within-batch
    * duplicates are the NEXT batch's problem by design (the index is
    * probed before it absorbs the batch) — the oracle restates exactly
    * that semantics. */
  /** dd15's index probe: batch band buckets joined to the persistent
    * index, FILE-PRUNED on the index's `band_hash` string stats via
    * [[graft.ops.lake.DynamicFilter.prunedJoin]] — the prune keys on
    * `band_hash` alone (sound superset), the match is the full
    * `(band_id, band_hash)` bucket identity. Over the key cap the
    * prune degrades to the two-scalar string range (a crawl-scale
    * batch keeps more files, never a wrong answer). Pins the index
    * listing at CALL time — always probe BEFORE appending the batch's
    * own buckets. Split out so the spec can pin the probed-file
    * discipline directly. */
  private[graft] def probeIndex(spark: SparkSession, idx: String,
                                batchBuckets: DataFrame,
                                minFiles: Int =
                                  graft.ops.lake.DynamicFilter.DefaultMinFiles)
                                : DataFrame =
    graft.ops.lake.DynamicFilter.prunedJoin(spark, idx,
        batchBuckets.select(col("band_id"), col("band_hash"),
          col("doc_id").as("doc_b")),
        factKey = "band_hash", dimKey = "band_hash",
        extraJoinCols = Seq("band_id"),
        // the index is tag-partitioned on band: the per-partition prune
        // scopes each batch hash to ITS band's files — untagged, a hash
        // overlaps same-ranged files in every other band (cross-band
        // leakage; the Dd15Probe receipt quantifies it). Below
        // prunedJoin's cost gate (r14) the probe is a plain join — the
        // right arrival on a fixture-sized index (the Dd15Probe
        // crossover); at corpus scale the index clears the gate and the
        // probe opens O(batch) files.
        factTagCol = Some("band"), dimTagCol = Some("band_id"),
        minFiles = minFiles)
      .select(col("doc_id").as("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")

  /** dd16: LEAKAGE-SAFE train/eval split — the eval-hygiene step a
    * training pipeline runs AFTER dedup: near-duplicate documents must
    * never straddle the split, or "eval" measures memorization of a
    * train-set neighbor rather than generalization (the within-corpus
    * analog of tx13's external-benchmark decontamination). Whole
    * verified near-dup CLUSTERS (dd6's connected components) assign
    * atomically: every document inherits its cluster's canonical id
    * (the component's min doc id; a clusterless document is its own
    * singleton cluster), and that one id decides the split — so by
    * CONSTRUCTION no verified pair crosses it, and the assignment is
    * deterministic and restatable (the oracle re-derives the clusters
    * and the decile rule). ~90/10 by canonical-id decile; a production
    * corpus with non-uniform ids would hash the canonical id instead —
    * same atomicity, same proof.
    *
    * Scale: reuses the materialized [[dupClusterTable]] artifact (built
    * once per corpus snapshot), one broadcast-size left join over the
    * corpus, zero extra shuffles beyond it. */
  def leakageSafeSplit(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents.select("doc_id")
      .join(dupClusterTable(spark, dir), Seq("doc_id"), "left_outer")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split",
        when(col("cluster_id") % 10 < 9, "train").otherwise("eval"))
      .select("doc_id", "cluster_id", "split")
      .orderBy("doc_id")

  lazy val leakageSafeSplitOracle: String =
    s"""WITH RECURSIVE $minhashVerifiedCtes,
      |edges AS (
      |  SELECT doc_a AS u, doc_b AS v FROM verified
      |  UNION SELECT doc_b, doc_a FROM verified
      |),
      |reach(doc_id, r) AS (
      |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      |  UNION
      |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.doc_id = e.v
      |),
      |cl AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id)
      |SELECT d.doc_id,
      |       coalesce(cl.cluster_id, d.doc_id) AS cluster_id,
      |       CASE WHEN coalesce(cl.cluster_id, d.doc_id) % 10 < 9
      |            THEN 'train' ELSE 'eval' END AS split
      |FROM documents d LEFT JOIN cl USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** dd16b: [[leakageSafeSplit]] with the split decided by a HASH of
    * the canonical id, not its decile (r14, r13 verdict item 6) — the
    * decile rule assumes roughly uniform ids, so a corpus whose ids
    * cluster (timestamp-prefixed, shard-prefixed, re-ingested ranges)
    * would split far from the declared 90/10. The engine's portable
    * 60-bit md5-prefix kernel ([[graft.engine.PortableHash]] — the
    * same primitive minhash/sampling hash through, with a verbatim
    * DuckDB twin) decorrelates the split from any id structure while
    * keeping it deterministic and restatable. Cluster atomicity is
    * unchanged: ONE canonical id per near-dup cluster still decides,
    * so no verified pair straddles by construction. */
  def leakageSafeSplitHashed(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents.select("doc_id")
      .join(dupClusterTable(spark, dir), Seq("doc_id"), "left_outer")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split",
        when(expr(graft.engine.PortableHash.md5Prefix60(
          "cast(cluster_id as string)")) % 10 < 9, "train").otherwise("eval"))
      .select("doc_id", "cluster_id", "split")
      .orderBy("doc_id")

  lazy val leakageSafeSplitHashedOracle: String =
    s"""WITH RECURSIVE $minhashVerifiedCtes,
      |edges AS (
      |  SELECT doc_a AS u, doc_b AS v FROM verified
      |  UNION SELECT doc_b, doc_a FROM verified
      |),
      |reach(doc_id, r) AS (
      |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      |  UNION
      |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.doc_id = e.v
      |),
      |cl AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id)
      |SELECT d.doc_id,
      |       coalesce(cl.cluster_id, d.doc_id) AS cluster_id,
      |       CASE WHEN ('0x' || substring(md5(
      |              CAST(coalesce(cl.cluster_id, d.doc_id) AS VARCHAR)),
      |              1, 15))::BIGINT % 10 < 9
      |            THEN 'train' ELSE 'eval' END AS split
      |FROM documents d LEFT JOIN cl USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  def incrementalLsh(spark: SparkSession, dir: String): DataFrame =
    incrementalLshAt(spark, dir, graft.engine.Graft.freshDir(
      "dd15-idx-" + dir.replaceAll("[^A-Za-z0-9.]", "_")))

  /** [[incrementalLsh]] with an explicit index location (spec entry). */
  private[graft] def incrementalLshAt(spark: SparkSession, dir: String,
                                      idx: String): DataFrame = {
    val sh = shingleTable(spark, dir)
    val corpusSh = sh.filter(col("doc_id") % 10 < 8)
    val batchSh = Caching.persist(sh.filter(col("doc_id") % 10 >= 8))
    def tagged(b: DataFrame) =
      b.withColumn("band", col("band_id").cast("string"))
    // index build (once per corpus; band-hash stats make probes prunable)
    Snapshots.commitAll(idx, Snapshots.stageWithStats(
      tagged(bucketsFor(corpusSh)), idx, "band", "band_hash"))
    // batch probe: signatures for the BATCH only, candidates from the
    // index — routed through the DFP join (r13) so the probe OPENS only
    // index files whose band_hash string stats admit a batch hash; the
    // pre-r13 plain join scanned the full index despite the clustering,
    // making per-batch cost O(index), not the operator's documented
    // O(batch + collisions) (r12 verdict find)
    val batchBuckets = Caching.persist(bucketsFor(batchSh))
    val cand = probeIndex(spark, idx, batchBuckets)
    val verified = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(batchSh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.8)
    // maintenance: the batch's buckets join the index for the next batch
    Snapshots.commitAll(idx, Snapshots.restageLike(spark,
      tagged(batchBuckets), idx, "band"))
    val best = verified.groupBy(col("doc_b"))
      .agg(count(lit(1)).as("n_matches"),
        max(struct(col("jaccard"), col("doc_a"))).as("best"))
    batchSh.select(col("doc_id"))
      .join(best, col("doc_id") === col("doc_b"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("best.doc_a").as("best_match"),
        col("best.jaccard").as("best_jaccard"),
        (coalesce(col("n_matches"), lit(0L)) > 0).as("is_dup"))
      .orderBy("doc_id")
  }

  lazy val incrementalLshOracle: String =
    s"""WITH $shingleCtes,
      |csh AS (SELECT doc_id, s FROM sh WHERE doc_id % 10 < 8),
      |bsh AS (SELECT doc_id, s FROM sh WHERE doc_id % 10 >= 8),
      |${minhashBandCtes("csh", "c")},
      |${minhashBandCtes("bsh", "b")},
      |xcand AS (
      |  SELECT DISTINCT c.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM cbuckets c JOIN bbuckets b
      |    ON c.band_id = b.band_id AND c.band_key = b.band_key),
      |ver AS (
      |  SELECT doc_a, doc_b, jaccard FROM (
      |    SELECT doc_a, doc_b,
      |      len(list_intersect(x.s, y.s))::DOUBLE
      |        / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS jaccard
      |    FROM xcand JOIN sh x ON x.doc_id = xcand.doc_a
      |               JOIN sh y ON y.doc_id = xcand.doc_b
      |  ) WHERE jaccard >= 0.8),
      |best AS (
      |  SELECT doc_b, n_matches, doc_a, jaccard FROM (
      |    SELECT doc_b, doc_a, jaccard,
      |      count(*) OVER (PARTITION BY doc_b) AS n_matches,
      |      row_number() OVER (PARTITION BY doc_b
      |        ORDER BY jaccard DESC, doc_a DESC) AS rn
      |    FROM ver) WHERE rn = 1)
      |SELECT bsh.doc_id AS doc_id,
      |  CAST(coalesce(best.n_matches, 0) AS BIGINT) AS n_matches,
      |  best.doc_a AS best_match,
      |  best.jaccard AS best_jaccard,
      |  coalesce(best.n_matches, 0) > 0 AS is_dup
      |FROM bsh LEFT JOIN best ON best.doc_b = bsh.doc_id
      |ORDER BY doc_id""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("dd16_leakage_split", leakageSafeSplitOracle)(leakageSafeSplit),
    QueryDef.sql("dd16b_leakage_split_hashed",
      leakageSafeSplitHashedOracle)(leakageSafeSplitHashed),
    QueryDef.sql("dd15_incremental_lsh", incrementalLshOracle)(incrementalLsh),
    QueryDef.sql("dd1_exact_dedup", exactDedupOracle)(exactDedup),
    QueryDef.sql("dd2_ngram_jaccard", ngramJaccardBlockedOracle)(ngramJaccardBlocked),
    QueryDef.sql("dd2b_ngram_capped", ngramJaccardCappedOracle)(ngramJaccardCapped),
    QueryDef.sql("dd3_minhash_lsh", minhashLshOracle)(minhashLsh),
    QueryDef.sql("dd4_simhash", simhashOracle)((s, d) => simhashSignatures(s, d)),
    QueryDef.sql("dd4b_simhash_pairs", simhashPairsOracle(10))((s, d) => simhashPairs(s, d, maxHamming = 10)),
    QueryDef.sql("dd5_embedding_dup", embeddingTopPairsOracle)(embeddingTopPairs),
    QueryDef.sql("dd5b_embedding_dup_grid", embeddingTopPairsOracle)(embeddingTopPairsGrid),
    QueryDef.sql("dd5c_embedding_lsh_dup", embeddingLshDupOracle)(embeddingLshDup),
    QueryDef.sql("dd6_dup_clusters", dupClustersOracle)(dupClusters),
    QueryDef.sql("dd7_dup_passages", dupPassagesOracle)(dupPassages),
    QueryDef.sql("dd9_bloom_dedup", bloomDedupOracle)(bloomDedup),
    QueryDef.sql("dd10_dedup_weights", dedupWeightsOracle)(dedupWeights),
    QueryDef.sql("dd11_substring_scrub", substringScrubOracle)(substringScrub),
    QueryDef.sql("dd12_source_overlap", sourceOverlapOracle)(sourceOverlap),
    QueryDef.sql("dd13_cdc_chunks", cdcChunkDedupOracle)(cdcChunkDedup),
    QueryDef.sql("dd14_containment", containmentPairsOracle)(containmentPairs))
}
