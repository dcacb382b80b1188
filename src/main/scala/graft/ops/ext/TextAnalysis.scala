package graft.ops.ext

import graft.engine.Exact.{portableRound6, portableRound6Sql}
import graft.engine.{Caching, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token counting,
  * language-ID heuristic, quality scoring, document fingerprinting.
  * All pure narrow projections over builtin (codegen'd) expressions —
  * they stream through a 100 TB corpus with zero shuffle; ratios are
  * int/int divisions so the oracle agrees bit-for-bit.
  */
object TextAnalysis {

  /** Whitespace token array of a text column. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Engine-portable membership hash of doc_id: the 60-bit md5-prefix
    * (DuckDB twin: `('0x'||substring(md5(doc_id::VARCHAR),1,15))::BIGINT`).
    * Load-bearing for the hash-compare — one definition feeds every
    * mod-membership operator (tx6 sampling, tx8 sharding, tx13 eval
    * split) so the four sites cannot drift apart. */
  private val md5ModDocId: String =
    graft.engine.PortableHash.md5Prefix60("cast(doc_id as string)")

  /** Token counting: whitespace tokens plus a BPE-ish subword estimate
    * (word-chunks of ≤4 chars: ceil(len/4) per token ≅ subword count). */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .withColumn("w", tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("w")).cast("bigint").as("n_tokens"),
        expr("cast(aggregate(transform(w, x -> length(x)), 0L, (acc, x) -> acc + x) as double)" +
          " / size(w)").as("avg_token_len"),
        expr("cast(aggregate(transform(w, x -> cast(ceil(length(x) / 4.0) as long)), 0L," +
          " (acc, x) -> acc + x) as bigint)").as("n_subwords"),
        length(col("text")).cast("bigint").as("n_chars_measured"))
      .orderBy("doc_id")

  val tokenCountsOracle: String =
    """WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') w FROM documents)
      |SELECT doc_id,
      |  CAST(len(w) AS BIGINT) AS n_tokens,
      |  CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w) AS avg_token_len,
      |  CAST(list_sum(list_transform(w, x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS n_subwords,
      |  CAST(length(text) AS BIGINT) AS n_chars_measured
      |FROM t ORDER BY doc_id""".stripMargin

  private val stop = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "un"),
    "es" -> Seq("el", "la", "los", "y", "un"))

  private def ratioExpr(words: String, set: Seq[String]): String = {
    val inList = set.map(s => s"'$s'").mkString(", ")
    s"cast(size(filter($words, x -> x in ($inList))) as double) / size($words)"
  }

  /** Language-ID heuristic: stopword-hit ratios per candidate language,
    * argmax with a fixed priority tie-break. (A real system would use
    * char-n-gram profiles; the operator shape — per-doc scores + argmax —
    * is identical.) */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .withColumn("w", tokens(col("text")))
      .select(
        col("doc_id"),
        expr(ratioExpr("w", stop("en"))).as("r_en"),
        expr(ratioExpr("w", stop("de"))).as("r_de"),
        expr(ratioExpr("w", stop("fr"))).as("r_fr"),
        expr(ratioExpr("w", stop("es"))).as("r_es"))
      .withColumn("lang_guess",
        when(col("r_en") >= greatest(col("r_de"), col("r_fr"), col("r_es")), "en")
          .when(col("r_de") >= greatest(col("r_fr"), col("r_es")), "de")
          .when(col("r_fr") >= col("r_es"), "fr")
          .otherwise("es"))
      .orderBy("doc_id")

  val langIdOracle: String = {
    def r(set: Seq[String]) = {
      val inList = set.map(s => s"'$s'").mkString(", ")
      s"CAST(len(list_filter(w, x -> x IN ($inList))) AS DOUBLE) / len(w)"
    }
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w FROM documents),
       |s AS (SELECT doc_id, ${r(stop("en"))} AS r_en, ${r(stop("de"))} AS r_de,
       |             ${r(stop("fr"))} AS r_fr, ${r(stop("es"))} AS r_es FROM t)
       |SELECT doc_id, r_en, r_de, r_fr, r_es,
       |  CASE WHEN r_en >= greatest(r_de, r_fr, r_es) THEN 'en'
       |       WHEN r_de >= greatest(r_fr, r_es) THEN 'de'
       |       WHEN r_fr >= r_es THEN 'fr' ELSE 'es' END AS lang_guess
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** Quality scoring: punctuation/digit/whitespace ratios, vocabulary
    * diversity, and a composite score — the usual pre-training filters. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .withColumn("w", tokens(col("text")))
      .withColumn("len", length(col("text")))
      .select(
        col("doc_id"),
        col("len").cast("bigint").as("n_chars_measured"),
        ((col("len") - length(regexp_replace(col("text"), "[.!?,;:]", "")))
          .cast("double") / col("len")).as("punct_ratio"),
        ((col("len") - length(regexp_replace(col("text"), "[0-9]", "")))
          .cast("double") / col("len")).as("digit_ratio"),
        (size(array_distinct(col("w"))).cast("double") / size(col("w"))).as("uniq_ratio"),
        (size(col("w")) >= 5 && size(col("w")) <= 1000).as("len_ok"))
      .withColumn("quality_score",
        col("uniq_ratio") * (lit(1.0) - col("punct_ratio")) * (lit(1.0) - col("digit_ratio")))
      .orderBy("doc_id")

  val qualityScoreOracle: String =
    """WITH t AS (SELECT doc_id, text, length(text) AS len,
      |                  string_split_regex(trim(text), '\s+') w FROM documents),
      |s AS (
      |  SELECT doc_id, CAST(len AS BIGINT) AS n_chars_measured,
      |    CAST(len - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE) / len AS punct_ratio,
      |    CAST(len - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / len AS digit_ratio,
      |    CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS uniq_ratio,
      |    len(w) >= 5 AND len(w) <= 1000 AS len_ok
      |  FROM t)
      |SELECT doc_id, n_chars_measured, punct_ratio, digit_ratio, uniq_ratio, len_ok,
      |       uniq_ratio * (1.0 - punct_ratio) * (1.0 - digit_ratio) AS quality_score
      |FROM s ORDER BY doc_id""".stripMargin

  /** tx24: per-source CALIBRATED quality filtering. A single global
    * threshold over raw quality scores silently deletes whole domains —
    * score distributions differ by source (boilerplate-heavy domains
    * score uniformly lower), so the raw cut keeps 100% of one source
    * and 0% of another. The standard treatment (CCNet's per-language
    * perplexity buckets, DataComp's per-pool calibration) is
    * RANK-NORMALIZATION within the domain: `percent_rank` over
    * (source, score) converts every score to its within-source
    * quantile, and a uniform calibrated cut (bottom 20% of EACH
    * source) follows. Physical shape: ONE keyed window — hash
    * exchange on source + in-partition sort; no global sort, scales
    * with domain count. Ties break on doc_id; percent_rank is
    * (rank−1)/(n−1), integer arithmetic divided once — identical in
    * both engines. */
  def calibratedQuality(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = Tables(spark, dir).documents
      .withColumn("w", tokens(col("text")))
      .withColumn("len", length(col("text")))
      .select(col("doc_id"), col("source"),
        // zero-length guard: an empty document must score 0.0, never
        // NULL — Spark's window orders NULLS FIRST ascending where
        // DuckDB orders NULLS LAST, so a NULL here would silently skew
        // percent_rank between engines
        when(col("len") > 0 && size(col("w")) > 0,
          (size(array_distinct(col("w"))).cast("double") / size(col("w"))) *
            (lit(1.0) - (col("len") - length(regexp_replace(col("text"), "[.!?,;:]", "")))
              .cast("double") / col("len")) *
            (lit(1.0) - (col("len") - length(regexp_replace(col("text"), "[0-9]", "")))
              .cast("double") / col("len")))
          .otherwise(lit(0.0)).as("quality_score"))
    val w = Window.partitionBy("source").orderBy(col("quality_score"), col("doc_id"))
    scored.withColumn("pct", percent_rank().over(w))
      .select(
        col("doc_id"), col("source"),
        round(col("quality_score"), 6).as("quality_r"),
        round(col("pct"), 6).as("pct_r"),
        (col("pct") >= 0.2).as("keep"))
      .orderBy("doc_id")
  }

  val calibratedQualityOracle: String =
    """WITH t AS (SELECT doc_id, source, text, length(text) AS len,
      |                  string_split_regex(trim(text), '\s+') w FROM documents),
      |s AS (
      |  SELECT doc_id, source,
      |    CASE WHEN len > 0 AND len(w) > 0 THEN
      |      (CAST(len(list_distinct(w)) AS DOUBLE) / len(w)) *
      |      (1.0 - CAST(len - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE) / len) *
      |      (1.0 - CAST(len - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / len)
      |    ELSE 0.0 END AS quality_score
      |  FROM t),
      |r AS (
      |  SELECT doc_id, source, quality_score,
      |    percent_rank() OVER (PARTITION BY source ORDER BY quality_score, doc_id) AS pct
      |  FROM s)
      |SELECT doc_id, source, round(quality_score, 6) AS quality_r,
      |       round(pct, 6) AS pct_r, (pct >= 0.2) AS keep
      |FROM r ORDER BY doc_id""".stripMargin

  /** Document fingerprinting: md5 over whitespace-normalized lowercase
    * text — the exact-dedup key (see Dedup.exactDedup). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(
        col("doc_id"),
        md5(regexp_replace(lower(col("text")), "\\s+", " ").cast("binary")).as("fingerprint"),
        substring(md5(col("text").cast("binary")), 1, 8).as("raw_prefix"))
      .orderBy("doc_id")

  val fingerprintOracle: String =
    """SELECT doc_id,
      |  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint,
      |  substr(md5(text), 1, 8) AS raw_prefix
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Corpus n-gram profile: top-10 bigrams per language by document
    * frequency — explode + two-level aggregation + per-group top-k, the
    * canonical "what's in my corpus" report. Ties broken by bigram text
    * so cross-engine ranking is stable. The top-k tail runs through the
    * native [[graft.plans.GroupedTopK]] operator: the bigram vocabulary
    * scales with the corpus, and bounded per-group heaps + a
    * survivors-only exchange beat the window form's full-vocabulary
    * exchange + sort (ranks recomputed over the ≤ 10·|langs| survivors). */
  def bigramProfile(spark: SparkSession, dir: String): DataFrame = {
    // zip_with over two shifted slices, NOT transform(sequence(..),
    // i -> element_at(w, i)): an outer-column reference inside a lambda
    // gets inlined by CollapseProject when this lands in the Generate,
    // and the token split then re-runs PER ELEMENT — measured 10× slower
    // at sf0.1. The slice form references w a constant number of times
    // per row. (n = 1 ⇒ slice length 0 ⇒ empty array — no guard needed.)
    val docs = Tables(spark, dir).documents
      .withColumn("w", tokens(col("text")))
      .withColumn("bigrams", expr(
        "array_distinct(zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1)," +
          " (x, y) -> concat(x, ' ', y)))"))
    val counts = docs
      .select(col("lang"), explode(col("bigrams")).as("bigram"))
      .groupBy("lang", "bigram")
      .agg(count(lit(1)).as("doc_freq"))
    val survivors = graft.plans.GroupedTopK(
      counts, Seq("lang"),
      Seq("doc_freq" -> false, "bigram" -> true), k = 10)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("doc_freq").desc, col("bigram"))
    survivors
      .withColumn("rk", row_number().over(w))
      .select(col("lang"), col("rk").cast("bigint").as("rk"),
        col("bigram"), col("doc_freq"))
      .orderBy("lang", "rk")
  }

  val bigramProfileOracle: String =
    """WITH t AS (
      |  SELECT lang, list_distinct(list_transform(range(1, len(w)),
      |           i -> w[i] || ' ' || w[i+1])) AS bigrams
      |  FROM (SELECT lang, string_split_regex(trim(text), '\s+') w FROM documents)
      |), c AS (
      |  SELECT lang, unnest(bigrams) AS bigram FROM t
      |), f AS (
      |  SELECT lang, bigram, count(*) AS doc_freq FROM c GROUP BY 1, 2
      |)
      |SELECT lang, CAST(rk AS BIGINT) AS rk, bigram, doc_freq FROM (
      |  SELECT *, row_number() OVER (PARTITION BY lang
      |             ORDER BY doc_freq DESC, bigram) AS rk FROM f
      |) WHERE rk <= 10 ORDER BY lang, rk""".stripMargin

  /** Per-language training-mix quotas in basis points (of 10000) — the
    * config a pretraining data recipe expresses as "downsample the
    * over-represented languages". */
  val MixQuotaBps: Seq[(String, Int)] =
    Seq("en" -> 5000, "de" -> 10000, "es" -> 10000, "fr" -> 10000, "zh" -> 2500)

  /** tx6: stratified quota sampling — deterministic, replayable: a doc is
    * kept iff md5(doc_id) mod 10000 falls under its language's quota, so
    * the same corpus always yields the same sample (re-runs, retries and
    * incremental extensions see a consistent membership — `df.sample`'s
    * RNG-per-partition would not survive repartitioning). One broadcast
    * join against the quota dim + a narrow filter; no shuffle until the
    * oracle ordering. Unquoted languages default to keep-all. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val quotas = broadcast(MixQuotaBps.toDF("lang", "keep_bps"))
    Tables(spark, dir).documents
      .join(quotas, Seq("lang"), "left_outer")
      .withColumn("h", expr(s"$md5ModDocId % 10000"))
      .filter(col("h") < coalesce(col("keep_bps"), lit(10000)))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  val stratifiedSampleOracle: String = {
    val quotaValues = MixQuotaBps.map { case (l, q) => s"('$l', $q)" }.mkString(", ")
    s"""WITH quotas(lang, keep_bps) AS (VALUES $quotaValues)
      |SELECT doc_id, d.lang AS lang, source
      |FROM documents d LEFT JOIN quotas q ON d.lang = q.lang
      |WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000
      |      < coalesce(q.keep_bps, 10000)
      |ORDER BY doc_id""".stripMargin
  }

  /** tx7: deterministic corpus shuffle — the global randomized training
    * order, reproducible per seed (epoch N+1 = new seed literal).
    * Sorting by a seeded hash of the key IS the shuffle; the global row
    * index is computed the TeraSort way: range-partition on the hash,
    * count rows per partition (an O(#partitions) driver read, not a data
    * collect), broadcast the cumulative offsets back, and add a
    * per-partition row_number — every stage is parallel. The naive
    * `row_number() OVER (ORDER BY hash)` would move 100 TB into ONE
    * window partition, which is exactly what this avoids. */
  def corpusShuffle(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = Tables(spark, dir).documents
      .withColumn("shuffle_key",
        expr(graft.engine.PortableHash.md5Prefix60("concat('epoch1|', doc_id)")))
      .repartitionByRange(col("shuffle_key"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
    // offsets: pid ascends with the range order, so cumsum over pid order
    // gives each partition's global starting index
    val counts = keyed.groupBy("pid").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
      .tail.zip(counts).map { case ((pid, end), (_, n)) => (pid, end - n) }
    val offsetsDf = broadcast(
      keyed.sparkSession.createDataFrame(offsets.toSeq).toDF("pid", "offset"))
    keyed.join(offsetsDf, Seq("pid"))
      .withColumn("local_rn",
        row_number().over(Window.partitionBy("pid").orderBy("shuffle_key", "doc_id")))
      .withColumn("shuffle_pos", (col("offset") + col("local_rn")).cast("bigint"))
      .select("shuffle_pos", "doc_id", "shuffle_key")
      .orderBy("shuffle_pos")
  }

  val corpusShuffleOracle: String =
    """SELECT CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) AS BIGINT) AS shuffle_pos,
      |       doc_id, shuffle_key
      |FROM (
      |  SELECT doc_id,
      |    ('0x' || substring(md5('epoch1|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS shuffle_key
      |  FROM documents
      |)
      |ORDER BY shuffle_pos""".stripMargin

  /** Token budget per packed training sequence (tx8). */
  val PackBudget = 512L
  /** Packing shards (tx8) — sized so one shard's documents stream through
    * one task; at 100 TB this scales with the corpus (shard ≈ 100 MB). */
  val PackShards = 16L

  /** tx8: sequence packing — the pretraining step that concatenates
    * documents into fixed-token-budget training rows. Greedy first-fit in
    * deterministic doc_id order within md5-sharded groups: shard
    * assignment is a portable hash (not `spark_partition_id`, which would
    * change with cluster layout), and the scan is a streaming
    * `mapPartitions` over rows sorted (shard, doc_id) within their
    * shuffle partition — O(1) memory per task, no group materialization.
    * A document alone may exceed the budget (it gets its own bin); packs
    * never mix shards, so epochs are reproducible and shards re-packable
    * independently. The sequential greedy is per-shard, which is the
    * honest parallelism of packing: global first-fit is inherently
    * order-dependent, so the unit of determinism must be the shard. */
  def sequencePack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables(spark, dir).documents
      .select(
        expr(s"$md5ModDocId % $PackShards").as("pid"),
        col("doc_id"),
        size(tokens(col("text"))).cast("bigint").as("n_tokens"))
      .as[(Long, Long, Long)]
      .repartition(col("pid"))
      .sortWithinPartitions("pid", "doc_id")
    d.mapPartitions { it =>
      var curPid = Long.MinValue
      var bin = 0L
      var fill = 0L
      it.map { case (pid, docId, n) =>
        if (pid != curPid) { curPid = pid; bin = 0L; fill = 0L }
        if (fill > 0 && fill + n > PackBudget) { bin += 1; fill = 0L }
        fill += n
        (pid, bin, docId, n)
      }
    }.toDF("pid", "bin_id", "doc_id", "n_tokens")
      .orderBy("pid", "doc_id")
  }

  val sequencePackOracle: String =
    s"""WITH RECURSIVE d AS (
      |  SELECT ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % $PackShards AS pid,
      |         doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_tokens
      |  FROM documents
      |),
      |o AS (
      |  SELECT pid, doc_id, n_tokens,
      |         row_number() OVER (PARTITION BY pid ORDER BY doc_id) AS rn
      |  FROM d
      |),
      |pack(pid, rn, doc_id, n_tokens, bin_id, fill) AS (
      |  SELECT pid, rn, doc_id, n_tokens, 0, n_tokens FROM o WHERE rn = 1
      |  UNION ALL
      |  SELECT o.pid, o.rn, o.doc_id, o.n_tokens,
      |    CASE WHEN p.fill + o.n_tokens > $PackBudget THEN p.bin_id + 1 ELSE p.bin_id END,
      |    CASE WHEN p.fill + o.n_tokens > $PackBudget THEN o.n_tokens ELSE p.fill + o.n_tokens END
      |  FROM o JOIN pack p ON o.pid = p.pid AND o.rn = p.rn + 1
      |)
      |SELECT CAST(pid AS BIGINT) AS pid, CAST(bin_id AS BIGINT) AS bin_id,
      |       doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
      |FROM pack ORDER BY pid, doc_id""".stripMargin

  /** tx9: the end-to-end corpus-cleaning funnel (the C4/RefinedWeb
    * shape): cheap narrow filters first (length + quality score), then
    * the dedup joins — keep only exact-dedup canonical docs (min doc_id
    * per normalized fingerprint, semi-join) and drop non-canonical
    * members of near-dup clusters (dd6, anti-join). Funnel order matters
    * at 100 TB: the narrow predicates cut the corpus before anything
    * shuffles, and both dedup sides join on bare doc_ids. The cluster
    * edge list rides dd6's MinHash banding (bounded candidates), not
    * prefix blocking — no hot boilerplate prefix can sink the funnel. */
  def cleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val q = qualityScore(spark, dir).select("doc_id", "quality_score", "len_ok")
    val exactKeep = Dedup.exactDedup(spark, dir)
      .select(col("keep_doc_id").as("doc_id"))
    val nonCanonNear = Dedup.dupClusterTable(spark, dir)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    docs.join(q, Seq("doc_id"))
      .filter(col("len_ok") && col("quality_score") > 0.5)
      .join(exactKeep, Seq("doc_id"), "left_semi")
      .join(nonCanonNear, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("quality_score"))
      .orderBy("doc_id")
  }

  lazy val cleanCorpusOracle: String =
    s"""WITH RECURSIVE t AS (SELECT doc_id, text, length(text) AS len,
      |                  string_split_regex(trim(text), '\\s+') w FROM documents),
      |q AS (
      |  SELECT doc_id,
      |    CAST(len(list_distinct(w)) AS DOUBLE) / len(w)
      |      * (1.0 - CAST(len - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE) / len)
      |      * (1.0 - CAST(len - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / len)
      |      AS quality_score,
      |    len(w) >= 5 AND len(w) <= 1000 AS len_ok
      |  FROM t),
      |keep AS (
      |  SELECT min(doc_id) AS doc_id FROM documents
      |  GROUP BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))
      |),
      |${graft.ops.ext.Dedup.minhashVerifiedCtes},
      |edges AS (
      |  SELECT doc_a AS u, doc_b AS v FROM verified
      |  UNION SELECT doc_b, doc_a FROM verified
      |),
      |reach(doc_id, r) AS (
      |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      |  UNION
      |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.doc_id = e.v
      |),
      |noncanon AS (
      |  SELECT doc_id FROM (SELECT min(r) AS cluster_id, doc_id FROM reach GROUP BY doc_id)
      |  WHERE doc_id <> cluster_id
      |)
      |SELECT d.doc_id AS doc_id, d.lang AS lang, q.quality_score
      |FROM documents d JOIN q ON d.doc_id = q.doc_id
      |WHERE q.len_ok AND q.quality_score > 0.5
      |  AND d.doc_id IN (SELECT doc_id FROM keep)
      |  AND d.doc_id NOT IN (SELECT doc_id FROM noncanon)
      |ORDER BY doc_id""".stripMargin

  /** tx10: unigram LM scoring — the CCNet-style perplexity proxy: build
    * the corpus unigram table (one shuffle), score each document by the
    * mean negative log-likelihood of its tokens. Two-pass by design: the
    * frequency table is a reusable artifact (at 100 TB you build it once
    * per corpus snapshot and score many shards against it); the score
    * join is token→freq on the exploded stream with map-side combine on
    * (doc, token) first so the freq join sees one row per distinct token
    * per doc. The corpus token total is NOT a separate `count()` pass —
    * it is the one-row `sum(n_tok)` of the already-built freq table,
    * broadcast-crossed into the score stream; the freq exchange appears
    * twice in the plan and Spark's ReuseExchange collapses it, so the
    * whole query is one job with zero extra corpus scans. round(,6)
    * keeps the ln() arithmetic comparison-stable across engines. */
  def lmScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir).documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("n_tok"))
    val totalDf = freq.agg(sum(col("n_tok")).cast("double").as("total_tok"))
    val docToks = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("n_in_doc"))
    docToks.join(freq, Seq("tok"))
      .crossJoin(broadcast(totalDf))
      .groupBy("doc_id")
      .agg(
        sum(col("n_in_doc")).as("n_doc_tokens"),
        sum(col("n_in_doc").cast("double") * log(col("n_tok").cast("double") / col("total_tok")))
          .as("sum_ll"))
      .select(
        col("doc_id"), col("n_doc_tokens"),
        round(-col("sum_ll") / col("n_doc_tokens"), 6).as("nll"))
      .orderBy("doc_id")
  }

  /** tx10's CTE chain, factored so [[pplBucketsOracle]] can reuse the
    * per-doc score table verbatim. */
  private val lmScoreCtes: String =
    """toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents
      |),
      |freq AS (SELECT tok, count(*) AS n_tok FROM toks GROUP BY tok),
      |total AS (SELECT count(*)::DOUBLE AS n FROM toks),
      |dt AS (SELECT doc_id, tok, count(*) AS n_in_doc FROM toks GROUP BY 1, 2),
      |scores AS (
      |  SELECT doc_id, CAST(sum(n_in_doc) AS BIGINT) AS n_doc_tokens,
      |    round(-sum(n_in_doc::DOUBLE * ln(n_tok::DOUBLE / total.n)) / sum(n_in_doc), 6) AS nll
      |  FROM dt JOIN freq USING (tok), total
      |  GROUP BY doc_id, total.n)""".stripMargin

  val lmScoreOracle: String =
    s"""WITH $lmScoreCtes
      |SELECT doc_id, n_doc_tokens, nll FROM scores ORDER BY doc_id""".stripMargin

  /** tx21: perplexity-bucketed corpus partitioning — CCNet's
    * head/middle/tail split: score every document with the unigram LM
    * (tx10), cut the score distribution at its exact tertiles, and
    * label each document's bucket. The quantile runs over the per-doc
    * SCORE table (one row per doc, not per token), and the two cut
    * points travel back as a broadcast single-row frame — no collect,
    * no second scoring pass (the score table is persisted,
    * scope-released). Exact `percentile` interpolation matches DuckDB's
    * `quantile_cont` at the same explicitly-double positions (the a11
    * parity); scores are pre-rounded to 6 dp by tx10, so the boundary
    * comparisons see identical doubles in both engines. */
  def pplBuckets(spark: SparkSession, dir: String): DataFrame = {
    val scores = Caching.persist(lmScore(spark, dir).select("doc_id", "nll"))
    val bounds = scores.agg(
      expr("percentile(nll, array(0.3333333333333333D, 0.6666666666666666D))").as("q"))
      .select(element_at(col("q"), 1).as("t1"), element_at(col("q"), 2).as("t2"))
    scores.crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("nll"),
        when(col("nll") <= col("t1"), lit("head"))
          .when(col("nll") <= col("t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
      .orderBy("doc_id")
  }

  val pplBucketsOracle: String =
    s"""WITH $lmScoreCtes,
      |b AS (
      |  SELECT quantile_cont(nll, 0.3333333333333333::DOUBLE) AS t1,
      |         quantile_cont(nll, 0.6666666666666666::DOUBLE) AS t2
      |  FROM scores)
      |SELECT doc_id, nll,
      |  CASE WHEN nll <= t1 THEN 'head'
      |       WHEN nll <= t2 THEN 'middle'
      |       ELSE 'tail' END AS bucket
      |FROM scores, b ORDER BY doc_id""".stripMargin

  /** tx11: Gopher-style repetition filters — the pre-training quality
    * signals that catch degenerate/boilerplate text: fraction of
    * duplicated tokens (1 − distinct/total) and the fraction of the
    * document covered by its single most-repeated bigram. Narrow
    * per-doc metrics (array ops) plus one two-level aggregation for the
    * top-bigram count (map-side combine on (doc, bigram) first); no
    * driver round-trips, thresholds chosen to split the fixture corpus
    * non-trivially (dup median ≈ 0.54, top-bigram p90 ≈ 0.07). */
  def repetitionFilter(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir).documents
      .withColumn("w", tokens(col("text")))
    val base = t.select(
      col("doc_id"),
      size(col("w")).cast("bigint").as("n_tokens"),
      size(array_distinct(col("w"))).cast("bigint").as("n_distinct"))
    val bg = t.select(col("doc_id"), explode(expr(
      "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1)," +
        " (x, y) -> concat(x, ' ', y))")).as("bigram"))
    val top = bg.groupBy("doc_id", "bigram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_bigram_n"))
    base.join(top, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"), col("n_tokens"),
        (lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"))
          .as("dup_token_frac"),
        when(col("n_tokens") > 1,
          coalesce(col("top_bigram_n"), lit(0L)).cast("double") / (col("n_tokens") - 1))
          .otherwise(lit(0.0)).as("top_bigram_frac"))
      .withColumn("keep",
        col("dup_token_frac") < 0.5 && col("top_bigram_frac") < 0.05)
      .orderBy("doc_id")
  }

  val repetitionFilterOracle: String =
    """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents),
      |base AS (
      |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
      |         CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct
      |  FROM t),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
      |  FROM t),
      |bgc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
      |top AS (SELECT doc_id, max(c) AS top_bigram_n FROM bgc GROUP BY 1),
      |m AS (
      |  SELECT b.doc_id AS doc_id, b.n_tokens,
      |    1.0 - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_token_frac,
      |    CASE WHEN n_tokens > 1
      |         THEN CAST(coalesce(top_bigram_n, 0) AS DOUBLE) / (n_tokens - 1)
      |         ELSE 0.0 END AS top_bigram_frac
      |  FROM base b LEFT JOIN top USING (doc_id))
      |SELECT doc_id, n_tokens, dup_token_frac, top_bigram_frac,
      |       dup_token_frac < '0.5'::DOUBLE AND top_bigram_frac < '0.05'::DOUBLE AS keep
      |FROM m ORDER BY doc_id""".stripMargin

  /** Redaction patterns (tx12) — identical semantics in Java regex and
    * DuckDB's RE2. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+1-555-[0-9]{4}"

  /** tx12: PII scrub — regex redaction of emails/phone numbers with
    * per-doc redaction counts and a fingerprint of the scrubbed text.
    * The fixture corpus is synthetic word-soup, so PII is injected
    * deterministically first (every 7th doc gains a contact line built
    * from its doc_id) — the scrub operator itself is exactly what runs
    * over a real crawl. Pure narrow codegen'd projections; zero shuffle
    * before the oracle ordering. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .withColumn("text2",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(col("text")))
      .select(
        col("doc_id"),
        regexp_count(col("text2"), lit(EmailRe)).cast("bigint").as("n_emails"),
        regexp_count(col("text2"), lit(PhoneRe)).cast("bigint").as("n_phones"),
        md5(regexp_replace(regexp_replace(col("text2"), lit(EmailRe), lit("<EMAIL>")),
          lit(PhoneRe), lit("<PHONE>")).cast("binary")).as("scrubbed_fp"))
      .orderBy("doc_id")

  val piiScrubOracle: String =
    s"""WITH inj AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0
      |         THEN text || ' contact user' || doc_id || '@example.com or +1-555-' ||
      |              lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |         ELSE text END AS text2
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(text2, '$EmailRe')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(text2, '$PhoneRe')) AS BIGINT) AS n_phones,
      |  md5(regexp_replace(regexp_replace(text2, '$EmailRe', '<EMAIL>', 'g'),
      |      '$PhoneRe', '<PHONE>', 'g')) AS scrubbed_fp
      |FROM inj ORDER BY doc_id""".stripMargin

  /** tx19: Unicode + whitespace normalization — the cleanup every
    * published pipeline runs BEFORE fingerprints, shingles, or token
    * counts exist: NFC-compose the codepoint sequence (visually equal
    * strings must hash equal — `e`+U+0301 vs `é`), blank out control
    * characters, collapse whitespace runs, trim. NFC runs as the native
    * codegen'd [[graft.functions.NfcNormalize]] expression (Spark has
    * no builtin normalizer; a UDF would break whole-stage codegen) with
    * a quick-check fast path, so already-normal text — nearly all of a
    * real corpus — costs one scan and no allocation. The fixture is
    * ASCII word-soup, so (same device as tx12) a deterministic unicode
    * mess is injected on every 5th doc first: a decomposed `é`, a tab,
    * a double space. Pure narrow projections, zero shuffle; both
    * engines implement UAX #15, so the oracle compares md5 fingerprints
    * of the normalized text itself. */
  def normalizeText(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.NfcNormalize.register(spark)
    Tables(spark, dir).documents
      .withColumn("text2",
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" caf"), lit("é"), lit("\t"), lit("done  end")))
          .otherwise(col("text")))
      .withColumn("norm",
        trim(regexp_replace(regexp_replace(
          call_function("nfc", col("text2")), "[\\p{Cc}]", " "), "\\s+", " ")))
      .select(
        col("doc_id"),
        (col("norm") =!= col("text2")).as("changed"),
        length(col("text2")).cast("bigint").as("n_chars_raw"),
        length(col("norm")).cast("bigint").as("n_chars_norm"),
        md5(col("norm").cast("binary")).as("norm_fp"))
      .orderBy("doc_id")
  }

  val normalizeTextOracle: String =
    """WITH inj AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0
      |         THEN text || ' caf' || chr(101) || chr(769) || chr(9) || 'done  end'
      |         ELSE text END AS text2
      |  FROM documents),
      |n AS (
      |  SELECT doc_id, text2,
      |    trim(regexp_replace(regexp_replace(
      |      nfc_normalize(text2), '[\p{Cc}]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
      |  FROM inj)
      |SELECT doc_id, (norm <> text2) AS changed,
      |  CAST(length(text2) AS BIGINT) AS n_chars_raw,
      |  CAST(length(norm) AS BIGINT) AS n_chars_norm,
      |  md5(norm) AS norm_fp
      |FROM n ORDER BY doc_id""".stripMargin

  /** tx20: per-source quota cap — the per-domain document cap a crawl
    * pipeline applies so no host dominates the mix (the "no more than N
    * pages per domain" rule): keep the top-10 documents per `source`,
    * preferring longer documents, doc_id as the deterministic
    * tie-break. Runs through the native [[graft.plans.GroupedTopK]]
    * operator — bounded per-group heaps partial/final around a
    * survivors-only exchange, so a monster domain with millions of
    * pages ships 10 rows, not its whole posting, through the shuffle
    * (the window form exchanges and sorts EVERY row first). */
  def sourceCap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents.select("source", "doc_id", "n_chars")
    val survivors = graft.plans.GroupedTopK(docs, Seq("source"),
      Seq("n_chars" -> false, "doc_id" -> true), k = 10)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
    survivors.withColumn("rk", row_number().over(w).cast("bigint"))
      .select("source", "rk", "doc_id", "n_chars")
      .orderBy("source", "rk")
  }

  val sourceCapOracle: String =
    """SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, n_chars FROM (
      |  SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 10 ORDER BY source, rk""".stripMargin

  /** Decontamination n-gram width — long enough that natural text
    * collides only on true shared passages (published pipelines use
    * 8–13-gram overlap against benchmark text). */
  val DecontamN = 8
  /** Deterministic eval-split modulus: doc is "benchmark" iff
    * md5(doc_id) mod 10 = 0 — the fixture stand-in for a real eval
    * suite table (same portable hash as tx6's sampling membership). */
  val EvalMod = 10

  /** Distinct n-grams of token array `w` as a fold of zip_with over n
    * shifted slices — the same constant-reference shape as
    * [[graft.ops.ext.Dedup.shingleExpr]]; a `transform(sequence(..),
    * i -> slice(w, i, n))` form would inline the outer `w` per element
    * on project collapse and re-run the token split per n-gram. */
  private[ext] def ngramExpr(n: Int, distinct: Boolean = true): String = {
    val len = s"(size(w) - ${n - 1})"
    val zipped = (2 to n).foldLeft(s"slice(w, 1, $len)") { (acc, k) =>
      s"zip_with($acc, slice(w, $k, $len), (x, y) -> concat(x, ' ', y))"
    }
    val body = if (distinct) s"array_distinct($zipped)" else zipped
    s"CASE WHEN size(w) < $n THEN filter(w, x -> false) ELSE $body END"
  }

  /** tx13: benchmark decontamination — the train/eval hygiene step every
    * serious pretraining pipeline runs: a training document is
    * contaminated iff it shares ANY [[DecontamN]]-gram with the eval
    * set. Output is the per-train-doc report (overlapping-n-gram count +
    * keep flag); the filtered corpus is `WHERE keep`.
    *
    * The 100 TB shape: eval suites are tiny (MBs), so their distinct
    * n-gram set BROADCASTS — the corpus side is one narrow explode +
    * broadcast hash join with NO corpus shuffle; only matched rows (a
    * sliver) reach the per-doc count, and the final left join rides the
    * bare doc_id. Eval and train branches partition the scan, so the
    * n-gram work totals one corpus pass. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables(spark, dir).documents
      .withColumn("w", tokens(col("text")))
      .withColumn("is_eval", expr(s"$md5ModDocId % $EvalMod") === 0)
      .select(col("doc_id"), col("is_eval"), expr(ngramExpr(DecontamN)).as("gr"))
    val evalGrams = g.filter(col("is_eval"))
      .select(explode(col("gr")).as("ng")).distinct()
    val train = g.filter(!col("is_eval"))
    val hits = train.select(col("doc_id"), explode(col("gr")).as("ng"))
      .join(broadcast(evalGrams), Seq("ng"))
      .groupBy("doc_id").agg(count(lit(1)).as("c"))
    train.select("doc_id")
      .join(hits, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"),
        coalesce(col("c"), lit(0L)).as("n_contaminated"),
        (coalesce(col("c"), lit(0L)) === 0).as("keep"))
      .orderBy("doc_id")
  }

  lazy val decontaminateOracle: String = {
    val gram = (0 until DecontamN).map(j => s"w[i+$j]").mkString(" || ' ' || ")
    s"""WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % $EvalMod = 0 AS is_eval,
      |    list_distinct(list_transform(range(1, len(w) - ${DecontamN - 2}), i -> $gram)) AS gr
      |  FROM d),
      |ev AS (SELECT DISTINCT unnest(gr) AS ng FROM g WHERE is_eval),
      |tr AS (SELECT doc_id, unnest(gr) AS ng FROM g WHERE NOT is_eval),
      |hit AS (SELECT doc_id, count(*) AS c FROM tr JOIN ev USING (ng) GROUP BY 1)
      |SELECT t.doc_id AS doc_id,
      |       coalesce(hit.c, 0) AS n_contaminated,
      |       coalesce(hit.c, 0) = 0 AS keep
      |FROM (SELECT doc_id FROM g WHERE NOT is_eval) t LEFT JOIN hit USING (doc_id)
      |ORDER BY doc_id""".stripMargin
  }

  /** tx14: domain-mixture planning — the "how much of each source goes
    * into the training mix" step (Pile-style mixture tables, DoReMi's
    * input): per-source document/token tallies, the source's share of
    * corpus tokens, and the sampling rate + oversample-epoch count
    * needed to hit a UNIFORM target mixture (equal token budget per
    * source — the no-prior rebalance; a production run swaps in a
    * learned target-weight dim, same plan shape).
    *
    * Scale: one map-side-combinable agg to #sources rows; the corpus
    * total and source count ride a broadcast single-row cross join —
    * no second corpus pass, no wide shuffle. All shares/rates divide
    * exact BIGINTs as IEEE doubles, so the oracle agrees bit-for-bit. */
  def mixWeights(spark: SparkSession, dir: String): DataFrame = {
    // persisted: the #sources-row agg feeds both the output and the
    // grand-total branch — column pruning specializes the two subtrees,
    // so without it the corpus would be scanned and tokenized twice
    // (same exchange-reuse failure mode dd7 documents)
    val src = graft.engine.Caching.persist(Tables(spark, dir).documents
      .select(col("source"), size(tokens(col("text"))).cast("bigint").as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("src_tokens")))
    val tot = src.agg(
      sum("src_tokens").as("total_tokens"),
      count(lit(1)).as("n_sources"))
    src.crossJoin(broadcast(tot))
      .select(
        col("source"),
        col("n_docs"),
        col("src_tokens").as("n_tokens"),
        round(col("src_tokens").cast("double") / col("total_tokens"), 6).as("tok_share_r"),
        round(col("total_tokens").cast("double") / (col("n_sources") * col("src_tokens")), 6)
          .as("rate_r"),
        ceil(col("total_tokens").cast("double") / (col("n_sources") * col("src_tokens")))
          .cast("bigint").as("epochs"))
      .orderBy("source")
  }

  val mixWeightsOracle: String =
    """WITH s AS (
      |  SELECT source, count(*) AS n_docs,
      |         CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS src_tokens
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens,
      |             count(*) AS n_sources FROM s)
      |SELECT source, n_docs, src_tokens AS n_tokens,
      |  round(CAST(src_tokens AS DOUBLE) / total_tokens, 6) AS tok_share_r,
      |  round(CAST(total_tokens AS DOUBLE) / (n_sources * src_tokens), 6) AS rate_r,
      |  CAST(ceil(CAST(total_tokens AS DOUBLE) / (n_sources * src_tokens)) AS BIGINT) AS epochs
      |FROM s CROSS JOIN t ORDER BY source""".stripMargin

  /** Vocabulary cap for tx15 (generous vs the fixture's ~31-word
    * vocabulary; the cap is what keeps the rank window bounded on a
    * real corpus). */
  val VocabK = 5000

  /** tx15: vocabulary build — word frequencies with cumulative
    * coverage, the first pass of tokenizer training (BPE starts from
    * exactly this table) and the basis of coverage-targeted vocab
    * sizing ("how many types cover 99% of tokens?").
    *
    * Scale: the frequency table is ONE map-side-combined agg (the only
    * corpus-wide shuffle); the [[VocabK]] cap is applied as a
    * distributed top-K (`orderBy…limit` → `TakeOrderedAndProject`,
    * bounded per-partition heaps — the full vocabulary is never
    * collected into one partition), and only the ≤ [[VocabK]]
    * survivors reach the partition-less rank/coverage window. The
    * coverage denominator still sums the FULL table. */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    // persisted for the same both-branches reason as mixWeights' src agg
    val freq = graft.engine.Caching.persist(Tables(spark, dir).documents
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt")))
    val tot = freq.agg(sum("cnt").as("total_tokens"))
    // top-K FIRST (TakeOrderedAndProject): identical rows to ranking
    // then filtering rank <= K under the same total order
    val capped = freq.orderBy(col("cnt").desc, col("token")).limit(VocabK)
    val W = org.apache.spark.sql.expressions.Window
    val w = W.orderBy(col("cnt").desc, col("token"))
    capped.crossJoin(broadcast(tot))
      .select(
        row_number().over(w).cast("bigint").as("rank"),
        col("token"),
        col("cnt"),
        round(sum("cnt").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
          .cast("double") / col("total_tokens"), 6).as("cum_share_r"))
      .orderBy("rank")
  }

  val vocabCoverageOracle: String =
    s"""WITH f AS (
      |  SELECT w AS token, count(*) AS cnt
      |  FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) w FROM documents)
      |  GROUP BY 1),
      |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens FROM f),
      |r AS (
      |  SELECT token, cnt,
      |         row_number() OVER (ORDER BY cnt DESC, token) AS rank,
      |         sum(cnt) OVER (ORDER BY cnt DESC, token
      |                        ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM f)
      |SELECT CAST(rank AS BIGINT) AS rank, token, CAST(cnt AS BIGINT) AS cnt,
      |       round(CAST(cum AS DOUBLE) / total_tokens, 6) AS cum_share_r
      |FROM r CROSS JOIN t WHERE rank <= $VocabK ORDER BY rank""".stripMargin

  /** tx16 model weights (intercept, uniq_ratio, stop_ratio,
    * mean-token-len/10). A production pipeline loads trained fasttext/
    * logistic weights; deterministic literals keep the operator
    * hash-compared — the plan is identical either way (weights are a
    * broadcast scalar row or literals, never data). */
  val QcWeights: (String, String, String, String) = ("-2.2", "3.0", "6.0", "1.5")

  /** tx16: quality CLASSIFIER — the supervised filter stage (GPT-3/
    * LLaMA-style: a linear model scores each doc against a
    * high-quality reference distribution; docs below threshold drop).
    * Differs from tx3 (hand-crafted score) and tx10 (LM perplexity):
    * this is the trained-model shape — a weighted feature sum.
    *
    * Portability: the logit avoids transcendentals (sigmoid is
    * monotone, so `keep ⟺ logit > 0` decides identically) — it is a
    * FIXED-ORDER left-associated sum of products of int/int-division
    * doubles and string-cast literal weights, which both engines
    * evaluate bit-identically (the '1.234'::DOUBLE discipline). Zero
    * shuffle: one narrow codegen'd projection.
    *
    * Rounding: NOT `round(x, 6)` — the fixture's power-of-two token
    * counts make the logit a dyadic rational that lands EXACTLY on
    * decimal midpoints (e.g. 1.0015625), and the engines' tie
    * semantics differ there (Spark HALF_UP on the exact binary
    * expansion vs DuckDB's multiply-then-round; found as a real 1-row
    * hash mismatch at sf0.1). [[portableRound6]] makes both engines
    * run the IDENTICAL IEEE sequence — floor(x·1e6 + 0.5)/1e6 — so
    * ties break the same way by construction. */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val (b, w1, w2, w3) = QcWeights
    val stopList = stop("en").map(s => s"'$s'").mkString(", ")
    Tables(spark, dir).documents
      .withColumn("w", tokens(col("text")))
      .select(
        col("doc_id"),
        expr("cast(size(array_distinct(w)) as double) / size(w)").as("uniq_ratio"),
        expr(s"cast(size(filter(w, x -> x in ($stopList))) as double) / size(w)")
          .as("stop_ratio"),
        expr("cast(aggregate(transform(w, x -> length(x)), 0L, (acc, x) -> acc + x) as double)" +
          " / size(w) / 10.0D").as("len_feat"))
      .withColumn("logit", expr(
        s"cast('$b' as double) + cast('$w1' as double) * uniq_ratio" +
          s" + cast('$w2' as double) * stop_ratio + cast('$w3' as double) * len_feat"))
      .select(
        col("doc_id"),
        expr(portableRound6("uniq_ratio")).as("uniq_ratio_r"),
        expr(portableRound6("stop_ratio")).as("stop_ratio_r"),
        expr(portableRound6("logit")).as("logit_r"),
        (col("logit") > 0.0).as("keep"))
      .orderBy("doc_id")
  }

  lazy val qualityClassifierOracle: String = {
    val (b, w1, w2, w3) = QcWeights
    val stopList = stop("en").map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w FROM documents),
      |f AS (
      |  SELECT doc_id,
      |    CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS uniq_ratio,
      |    CAST(len(list_filter(w, x -> x IN ($stopList))) AS DOUBLE) / len(w) AS stop_ratio,
      |    CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w) / 10.0 AS len_feat
      |  FROM t),
      |s AS (
      |  SELECT doc_id, uniq_ratio, stop_ratio,
      |    '$b'::DOUBLE + '$w1'::DOUBLE * uniq_ratio
      |      + '$w2'::DOUBLE * stop_ratio + '$w3'::DOUBLE * len_feat AS logit
      |  FROM f)
      |SELECT doc_id, ${portableRound6Sql("uniq_ratio")} AS uniq_ratio_r,
      |       ${portableRound6Sql("stop_ratio")} AS stop_ratio_r,
      |       ${portableRound6Sql("logit")} AS logit_r, logit > 0.0 AS keep
      |FROM s ORDER BY doc_id""".stripMargin
  }

  /** Merge rounds for tx17 (2 exercises the genuinely iterative part —
    * round 2's pair statistics see round 1's merged symbol — while
    * keeping the unrolled oracle readable; production BPE runs ~30k
    * rounds of exactly this step). */
  val BpeRounds = 2

  /** The greedy left-to-right application of one BPE merge (`pa pb` →
    * `pm`) to a space-joined symbol string, as a string fold: matches
    * real BPE semantics incl. overlaps (`a a a` under `a a` → `aa a`,
    * and a just-formed merge never re-merges with the next symbol).
    * A plain string replace would be wrong twice over: it can match
    * ACROSS symbol boundaries (`ab c` contains `b c`), and bounded
    * variants need lookbehind, which DuckDB's RE2 lacks — the fold is
    * the portable form (DuckDB twin: `list_reduce`). */
  private[graft] def bpeApplyExpr(symsCol: String, pa: String, pb: String, pm: String): String =
    s"""aggregate(split($symsCol, ' '), '', (acc, x) -> CASE
       |  WHEN acc = '' THEN x
       |  WHEN x = $pb AND acc = $pa THEN $pm
       |  WHEN x = $pb AND endswith(acc, concat(' ', $pa))
       |    THEN concat(substring(acc, 1, length(acc) - length($pa) - 1), ' ', $pm)
       |  ELSE concat(acc, ' ', x) END)""".stripMargin

  /** tx17: BPE merge training — [[BpeRounds]] rounds of the byte-pair-
    * encoding loop (Sennrich et al. 2016) that turns tx15's vocabulary
    * table into a subword tokenizer: count adjacent symbol pairs
    * weighted by word frequency, adopt the most frequent pair as a new
    * symbol, re-encode, repeat.
    *
    * Scale: the corpus is touched ONCE — the map-side-combined word
    * frequency agg (tx15's table, capped to the top [[VocabK]] types
    * the same way) — and every merge round runs on the VOCABULARY, not
    * the corpus: pair stats are Σ word-length rows, the winning pair is
    * a 1-row broadcast, and re-encoding is a narrow per-word fold.
    * That per-round independence from corpus size is exactly why
    * production tokenizers train on a frequency table, and why 30k
    * rounds are tractable. Output pins the full encoding of every
    * vocab word plus each round's chosen pair and count. */
  /** The shared BPE training chain: returns the encoded vocabulary
    * (with every round's merge columns cross-joined on) AND the 1-row
    * merges frame — tx17 presents the former, tx22 broadcasts the
    * latter into corpus encoding. */
  private[graft] def bpeTrain(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val wf = Tables(spark, dir).documents
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(VocabK)
    var enc = graft.engine.Caching.persist(
      wf.withColumn("sym", expr("trim(regexp_replace(word, '(.)', '$1 '))")))
    var mergesRow: DataFrame = null
    (1 to BpeRounds).foreach { r =>
      val top = enc
        .select(col("n"), explode(expr(
          """zip_with(slice(split(sym, ' '), 1, size(split(sym, ' ')) - 1),
            |         slice(split(sym, ' '), 2, size(split(sym, ' ')) - 1),
            |         (a, b) -> concat(a, ' ', b))""".stripMargin)).as("pair"))
        .groupBy("pair").agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("pair")).limit(1)
        .select(
          col("pair").as(s"merge$r"),
          expr("element_at(split(pair, ' '), 1)").as(s"pa$r"),
          expr("element_at(split(pair, ' '), 2)").as(s"pb$r"),
          expr("replace(pair, ' ', '')").as(s"pm$r"),
          col("cnt").as(s"merge${r}_cnt"))
      mergesRow = if (mergesRow == null) top else mergesRow.crossJoin(top)
      enc = graft.engine.Caching.persist(enc.crossJoin(broadcast(top))
        .withColumn("sym", expr(bpeApplyExpr("sym", s"pa$r", s"pb$r", s"pm$r"))))
    }
    (enc, mergesRow)
  }

  def bpeMerges(spark: SparkSession, dir: String): DataFrame = {
    val (enc, _) = bpeTrain(spark, dir)
    val mergeCols = (1 to BpeRounds).flatMap(r => Seq(col(s"merge$r"), col(s"merge${r}_cnt")))
    enc.select(Seq(col("word"), col("n"), col("sym").as("encoded")) ++ mergeCols: _*)
      .orderBy("word")
  }

  /** The training chain (wf, enc0, p/t/enc per round) as a WITH-body
    * fragment both BPE oracles share. */
  private lazy val bpeCtes: String = {
    def pairCte(r: Int, src: String): String =
      s"""p$r AS (
        |  SELECT pr AS pair, sum(n) AS cnt FROM (
        |    SELECT n, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS pr
        |    FROM (SELECT n, string_split(sym, ' ') AS w FROM $src)
        |  ) GROUP BY 1
        |),
        |t$r AS (
        |  SELECT pair, string_split(pair, ' ')[1] AS pa, string_split(pair, ' ')[2] AS pb,
        |         replace(pair, ' ', '') AS pm, cnt
        |  FROM p$r ORDER BY cnt DESC, pair LIMIT 1
        |),
        |enc$r AS (
        |  SELECT word, n,
        |    list_reduce(string_split(sym, ' '), (acc, x) -> CASE
        |      WHEN x = t.pb AND acc = t.pa THEN t.pm
        |      WHEN x = t.pb AND ends_with(acc, ' ' || t.pa)
        |        THEN left(acc, length(acc) - length(t.pa) - 1) || ' ' || t.pm
        |      ELSE acc || ' ' || x END) AS sym
        |  FROM ${src}, t$r t
        |)""".stripMargin
    val rounds = (1 to BpeRounds)
      .map(r => pairCte(r, if (r == 1) "enc0" else s"enc${r - 1}"))
      .mkString(",\n")
    s"""wf AS (
      |  SELECT word, n FROM (
      |    SELECT w AS word, count(*) AS n,
      |           row_number() OVER (ORDER BY count(*) DESC, w) AS rank
      |    FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) w FROM documents)
      |    GROUP BY w
      |  ) WHERE rank <= $VocabK
      |),
      |enc0 AS (
      |  SELECT word, n, trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS sym FROM wf
      |),
      |$rounds""".stripMargin
  }

  lazy val bpeMergesOracle: String = {
    val mergeSelect = (1 to BpeRounds)
      .map(r => s"t$r.pair AS merge$r, CAST(t$r.cnt AS BIGINT) AS merge${r}_cnt")
      .mkString(", ")
    val mergeFrom = (1 to BpeRounds).map(r => s"t$r").mkString(", ")
    s"""WITH $bpeCtes
      |SELECT e.word AS word, CAST(e.n AS BIGINT) AS n, e.sym AS encoded, $mergeSelect
      |FROM enc$BpeRounds e, $mergeFrom ORDER BY e.word""".stripMargin
  }

  /** tx22: BPE tokenizer INFERENCE — encode the whole corpus with
    * tx17's trained merges (training builds the tokenizer once;
    * encoding is the pass every downstream token count, packing and
    * budget decision consumes). The Zipf structure is the scale story:
    * the fold runs once per DISTINCT word (≪ corpus tokens), the
    * merges travel as a 1-row broadcast, and the corpus-side work is
    * one narrow posexplode + a join on `word` + a per-doc aggregate —
    * at 100 TB the word dimension is the AQE-broadcastable side. The
    * per-doc md5 over the position-ordered subword stream pins
    * SEQUENCE fidelity, not just counts. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val (_, merges) = bpeTrain(spark, dir)
    val toks = Tables(spark, dir).documents
      .select(col("doc_id"), posexplode(tokens(col("text")))).toDF("doc_id", "pos", "word")
    var dw = toks.select("word").distinct()
      .withColumn("sym", expr("trim(regexp_replace(word, '(.)', '$1 '))"))
      .crossJoin(broadcast(merges))
    (1 to BpeRounds).foreach { r =>
      dw = dw.withColumn("sym", expr(bpeApplyExpr("sym", s"pa$r", s"pb$r", s"pm$r")))
    }
    toks.join(dw.select("word", "sym"), "word")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(size(split(col("sym"), " "))).cast("bigint").as("n_subwords"),
        expr("md5(array_join(transform(array_sort(collect_list(struct(pos, sym))), s -> s.sym), ' '))")
          .as("enc_md5"))
      .orderBy("doc_id")
  }

  lazy val bpeEncodeOracle: String = {
    def foldCte(r: Int, src: String): String =
      s"""dw$r AS (
        |  SELECT word, list_reduce(string_split(sym, ' '), (acc, x) -> CASE
        |      WHEN x = t.pb AND acc = t.pa THEN t.pm
        |      WHEN x = t.pb AND ends_with(acc, ' ' || t.pa)
        |        THEN left(acc, length(acc) - length(t.pa) - 1) || ' ' || t.pm
        |      ELSE acc || ' ' || x END) AS sym
        |  FROM dw${r - 1}, t$r t
        |)""".stripMargin
    val folds = (1 to BpeRounds).map(r => foldCte(r, s"dw${r - 1}")).mkString(",\n")
    s"""WITH $bpeCtes,
      |toks AS (
      |  SELECT doc_id, i AS pos, ws[i] AS word
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
      |       LATERAL unnest(range(1, len(ws) + 1)) t(i)
      |),
      |dw0 AS (
      |  SELECT word, trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS sym
      |  FROM (SELECT DISTINCT word FROM toks)
      |),
      |$folds
      |SELECT toks.doc_id AS doc_id, count(*) AS n_words,
      |       CAST(sum(len(string_split(d.sym, ' '))) AS BIGINT) AS n_subwords,
      |       md5(string_agg(d.sym, ' ' ORDER BY toks.pos)) AS enc_md5
      |FROM toks JOIN dw$BpeRounds d USING (word)
      |GROUP BY toks.doc_id ORDER BY doc_id""".stripMargin
  }

  /** Interpolation weight for tx18's bigram/unigram mix (string-cast to
    * DOUBLE on both engines per the literal-portability discipline). */
  val LmLambda = "0.7"

  /** tx18: interpolated bigram LM scoring — the strictly stronger form
    * of tx10's unigram perplexity proxy (CCNet ships a 5-gram KenLM;
    * a Jelinek-Mercer-interpolated bigram is the same estimator family
    * at fixture scale): token t after context p scores
    * `λ·n(p,t)/n(p) + (1−λ)·n(t)/T`, the document's first token scores
    * unigram-only, and the doc score is mean negative log-likelihood.
    *
    * Scale shape mirrors tx10: corpus-wide work is building the unigram
    * and bigram frequency tables (two map-side-combined aggs — at
    * 100 TB they are once-per-snapshot artifacts many scoring shards
    * reuse); scoring pre-aggregates per (doc, prev, cur) so each freq
    * join sees one row per distinct bigram per doc, and the corpus
    * total is the 1-row sum OF the unigram table (no extra corpus
    * pass), broadcast-crossed. n(p) as the conditional denominator is
    * the plain MLE count (the standard table; end-of-doc contexts are
    * not discounted). log() reassociation noise is absorbed by the
    * round(,6) on the final mean, as in tx10. */
  def bigramLmScore(spark: SparkSession, dir: String): DataFrame = {
    val lam = s"cast('$LmLambda' as double)"
    // fanScan + persist (r17): `docs` feeds THREE consumers (uni via
    // toks, the bigram explode, firstLl) — unpersisted, the corpus was
    // read and regex-tokenized three times, each pass inside the
    // single-row-group scan task; now tokenization runs once, 32-way
    val docs = graft.engine.Caching.persist(
      graft.engine.Graft.fanScan(Tables(spark, dir).documents, col("doc_id"))
        .select(col("doc_id"), tokens(col("text")).as("w"))
        .filter(size(col("w")) >= 1))
    val toks = docs.select(col("doc_id"), explode(col("w")).as("tok"))
    val uni = graft.engine.Caching.persist(
      toks.groupBy("tok").agg(count(lit(1)).as("n_uni")))
    val totalDf = uni.agg(sum(col("n_uni")).cast("double").as("total_tok"))
    val pairs = docs.select(col("doc_id"), explode(expr(
      """zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),
        |         (a, b) -> struct(a AS prev, b AS cur))""".stripMargin)).as("pc"))
      .select(col("doc_id"), col("pc.prev").as("prev"), col("pc.cur").as("cur"))
    // one explode pass: the corpus bigram table is the SUM of the
    // per-doc pre-agg (cached — it feeds both the freq derivation and
    // the score join), never a second pass over the exploded stream
    val docPairs = graft.engine.Caching.persist(
      pairs.groupBy("doc_id", "prev", "cur").agg(count(lit(1)).as("n_in_doc")))
    val bi = docPairs.groupBy("prev", "cur").agg(sum("n_in_doc").as("n_bi"))
    val pairLl = docPairs
      .join(bi, Seq("prev", "cur"))
      .join(uni.select(col("tok").as("prev"), col("n_uni").as("n_prev")), Seq("prev"))
      .join(uni.select(col("tok").as("cur"), col("n_uni").as("n_cur")), Seq("cur"))
      .crossJoin(broadcast(totalDf))
      .groupBy("doc_id")
      .agg(sum(col("n_in_doc").cast("double") * log(expr(
        s"$lam * (cast(n_bi as double) / cast(n_prev as double))" +
          s" + (cast('1' as double) - $lam) * (cast(n_cur as double) / total_tok)")))
        .as("pair_ll"))
    val firstLl = docs
      .select(col("doc_id"), expr("element_at(w, 1)").as("tok"), size(col("w")).as("n_tokens"))
      .join(uni, Seq("tok"))
      .crossJoin(broadcast(totalDf))
      .select(col("doc_id"), col("n_tokens").cast("bigint").as("n_tokens"),
        log(col("n_uni").cast("double") / col("total_tok")).as("first_ll"))
    firstLl.join(pairLl, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        round(-(col("first_ll") + coalesce(col("pair_ll"), lit(0.0))) / col("n_tokens"), 6)
          .as("nll_r"))
      .orderBy("doc_id")
  }

  lazy val bigramLmScoreOracle: String =
    s"""WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
      |  WHERE len(string_split_regex(trim(text), '\\s+')) >= 1
      |),
      |toks AS (SELECT doc_id, unnest(w) AS tok FROM d),
      |uni AS (SELECT tok, count(*) AS n_uni FROM toks GROUP BY tok),
      |tot AS (SELECT CAST(CAST(sum(n_uni) AS BIGINT) AS DOUBLE) AS total_tok FROM uni),
      |pairs AS (
      |  SELECT doc_id, pc['prev'] AS prev, pc['cur'] AS cur FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(1, len(w)), i -> {'prev': w[i], 'cur': w[i+1]})) AS pc
      |    FROM d)
      |),
      |dp AS (SELECT doc_id, prev, cur, count(*) AS n_in_doc FROM pairs GROUP BY 1, 2, 3),
      |bi AS (SELECT prev, cur, CAST(sum(n_in_doc) AS BIGINT) AS n_bi FROM dp GROUP BY prev, cur),
      |pll AS (
      |  SELECT dp.doc_id,
      |    sum(CAST(n_in_doc AS DOUBLE) * ln(
      |      '$LmLambda'::DOUBLE * (CAST(n_bi AS DOUBLE) / CAST(up.n_uni AS DOUBLE))
      |      + ('1'::DOUBLE - '$LmLambda'::DOUBLE) * (CAST(uc.n_uni AS DOUBLE) / total_tok)
      |    )) AS pair_ll
      |  FROM dp
      |  JOIN bi ON bi.prev = dp.prev AND bi.cur = dp.cur
      |  JOIN uni up ON up.tok = dp.prev
      |  JOIN uni uc ON uc.tok = dp.cur
      |  CROSS JOIN tot
      |  GROUP BY dp.doc_id
      |),
      |fll AS (
      |  SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_tokens,
      |         ln(CAST(u.n_uni AS DOUBLE) / total_tok) AS first_ll
      |  FROM d JOIN uni u ON u.tok = d.w[1] CROSS JOIN tot
      |)
      |SELECT f.doc_id AS doc_id, f.n_tokens AS n_tokens,
      |       round(-(f.first_ll + coalesce(p.pair_ll, '0'::DOUBLE)) / f.n_tokens, 6) AS nll_r
      |FROM fll f LEFT JOIN pll p ON p.doc_id = f.doc_id
      |ORDER BY f.doc_id""".stripMargin

  // -- tx25: sliding-window chunking with overlap (RAG/index prep) -----

  /** tx25's chunk window (tokens) and stride; overlap = W − S = 8. Sized
    * to the fixture's 10–99-token documents so every doc yields 1–4
    * chunks; production would use model-context-sized windows (512/1024)
    * with the same arithmetic. */
  val ChunkW = 32
  val ChunkStride = 24

  /** tx25: sliding-window document chunking with overlap — the
    * RAG-indexing / context-window prep every retrieval pipeline runs:
    * each document becomes ⌈max(n−W,0)/S⌉+1 chunks of ≤ [[ChunkW]]
    * tokens starting every [[ChunkStride]] tokens (trailing chunk may be
    * short; a doc shorter than one window is its own single chunk).
    * Pure narrow projection — sequence + slice over the token array,
    * zero shuffle at any corpus size; chunk boundaries are deterministic
    * functions of (doc_id, chunk_id) so re-indexing is idempotent.
    * Ref analog: none — retrieval-prep extension. */
  def chunkOverlap(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .withColumn("w", tokens(col("text")))
      .withColumn("n", size(col("w")))
      .select(col("doc_id"), col("w"), col("n"),
        explode(expr(
          s"sequence(0, greatest(cast(ceil((n - $ChunkW) / cast($ChunkStride as double)) as int), 0))"
        )).as("chunk_id"))
      .select(
        col("doc_id"),
        col("chunk_id").cast("bigint").as("chunk_id"),
        least(col("n") - col("chunk_id") * ChunkStride, lit(ChunkW))
          .cast("bigint").as("n_chunk_tokens"),
        concat_ws(" ",
          slice(col("w"), col("chunk_id") * ChunkStride + 1, lit(ChunkW))).as("chunk_text"))
      .orderBy("doc_id", "chunk_id")

  val chunkOverlapOracle: String =
    s"""WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w FROM documents),
      |c AS (
      |  SELECT doc_id, w, len(w) AS n,
      |         unnest(range(0, greatest(CAST(ceil((len(w) - $ChunkW) / $ChunkStride.0) AS BIGINT), 0) + 1)) AS chunk_id
      |  FROM d)
      |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
      |       CAST(least(n - chunk_id * $ChunkStride, $ChunkW) AS BIGINT) AS n_chunk_tokens,
      |       array_to_string(list_slice(w, chunk_id * $ChunkStride + 1,
      |                                  chunk_id * $ChunkStride + $ChunkW), ' ') AS chunk_text
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  // -- tx26: per-document TF-IDF top terms ----------------------------

  /** tx26: per-document top-3 TF-IDF terms — the classic keyword/topic
    * fingerprint (retrieval indexing, near-dup triage, corpus topic
    * drift). tf is the in-doc term count, idf = ln(N/df) over exact
    * document frequency; the ranking funnels through the native
    * [[graft.plans.GroupedTopK]] operator so only ≤ 3·|docs| survivors
    * reach the rank window — the scored (doc, term) table never
    * exchange-sorts. N rides a broadcast 1-row frame; df is one
    * map-combinable aggregation. ln(): both engines call libm natural
    * log; [[portableRound6]] absorbs the last-ulp difference before the
    * hash compare. Ref analog: none — text-pipeline extension. */
  def tfidfTerms(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfq = toks.groupBy("term").agg(countDistinct("doc_id").as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        expr(portableRound6("tf * ln(cast(n_docs as double) / df)")))
      .select("doc_id", "term", "tfidf")
    val survivors = graft.plans.GroupedTopK(
      scored, Seq("doc_id"), Seq("tfidf" -> false, "term" -> true), k = 3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    survivors
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .select("doc_id", "rank", "term", "tfidf")
      .orderBy("doc_id", "rank")
  }

  lazy val tfidfTermsOracle: String =
    s"""WITH t AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
      |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
      |nd AS (SELECT count(*) AS n_docs FROM documents),
      |s AS (
      |  SELECT doc_id, term,
      |         ${portableRound6Sql("tf * ln(n_docs::DOUBLE / df)")} AS tfidf
      |  FROM tf JOIN dfq USING (term) CROSS JOIN nd)
      |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tfidf FROM (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |                               ORDER BY tfidf DESC, term) AS rank
      |  FROM s)
      |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("tx17_bpe_merges", bpeMergesOracle)(bpeMerges),
    QueryDef.sql("tx22_bpe_encode", bpeEncodeOracle)(bpeEncode),
    QueryDef.sql("tx18_bigram_lm", bigramLmScoreOracle)(bigramLmScore),
    QueryDef.sql("tx5_bigram_profile", bigramProfileOracle)(bigramProfile),
    QueryDef.sql("tx1_token_counts", tokenCountsOracle)(tokenCounts),
    QueryDef.sql("tx2_lang_id", langIdOracle)(langId),
    QueryDef.sql("tx3_quality_score", qualityScoreOracle)(qualityScore),
    QueryDef.sql("tx4_fingerprint", fingerprintOracle)(fingerprint),
    QueryDef.sql("tx6_stratified_sample", stratifiedSampleOracle)(stratifiedSample),
    QueryDef.sql("tx7_corpus_shuffle", corpusShuffleOracle)(corpusShuffle),
    QueryDef.sql("tx8_sequence_pack", sequencePackOracle)(sequencePack),
    QueryDef.sql("tx9_clean_corpus", cleanCorpusOracle)(cleanCorpus),
    QueryDef.sql("tx10_lm_score", lmScoreOracle)(lmScore),
    QueryDef.sql("tx11_repetition_filter", repetitionFilterOracle)(repetitionFilter),
    QueryDef.sql("tx12_pii_scrub", piiScrubOracle)(piiScrub),
    QueryDef.sql("tx13_decontaminate", decontaminateOracle)(decontaminate),
    QueryDef.sql("tx14_mix_weights", mixWeightsOracle)(mixWeights),
    QueryDef.sql("tx15_vocab_coverage", vocabCoverageOracle)(vocabCoverage),
    QueryDef.sql("tx16_quality_classifier", qualityClassifierOracle)(qualityClassifier),
    QueryDef.sql("tx19_normalize", normalizeTextOracle)(normalizeText),
    QueryDef.sql("tx20_source_cap", sourceCapOracle)(sourceCap),
    QueryDef.sql("tx21_ppl_buckets", pplBucketsOracle)(pplBuckets),
    QueryDef.sql("tx24_calibrated_quality", calibratedQualityOracle)(calibratedQuality),
    QueryDef.sql("tx25_chunk_overlap", chunkOverlapOracle)(chunkOverlap),
    QueryDef.sql("tx26_tfidf_terms", tfidfTermsOracle)(tfidfTerms))
}
