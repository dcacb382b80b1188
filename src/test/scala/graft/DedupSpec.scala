package graft

import graft.ops.ext.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  /** Brute-force all-pairs jaccard > 0.8 on sf0.001 — ground truth. */
  lazy val bruteForcePairs: Set[(Long, Long)] = {
    val sh = Dedup.shingled(spark, Sf).select("doc_id", "sh")
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("j", col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("j") > 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
  }

  test("fixtures contain planted near-duplicates") {
    assert(bruteForcePairs.nonEmpty)
  }

  test("minhash LSH recalls all brute-force near-dup pairs") {
    val lsh = Dedup.minhashLsh(spark, Sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val missed = bruteForcePairs -- lsh
    assert(missed.isEmpty, s"LSH missed ${missed.size}/${bruteForcePairs.size} pairs: $missed")
    // and no false positives survive the exact-jaccard verify stage
    assert((lsh -- bruteForcePairs).isEmpty)
  }

  test("exact dedup flags identical normalized text") {
    val docs = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "something else"))
      .toDF("doc_id", "text")
    val groups = docs
      .groupBy(md5(regexp_replace(lower(col("text")), "\\s+", " ").cast("binary")).as("fp"))
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep"))
    val dup = groups.filter(col("n_docs") > 1).collect()
    assert(dup.length == 1 && dup(0).getAs[Long]("keep") == 1L)
  }

  test("dd5b triangle-grid top-pairs is row-identical to dd5 all-pairs") {
    val exact = Dedup.embeddingTopPairs(spark, Sf).collect().toSeq
    val grid = Dedup.embeddingTopPairsGrid(spark, Sf).collect().toSeq
    assert(exact == grid)
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / math.sqrt(na) / math.sqrt(nb)
  }

  /** 60 random 64-dim vectors + near-dup copies (cos ≈ 0.98) of the first
    * 15, sharing the base's label — the regime dd5c targets. */
  lazy val plantedDir: (String, Seq[(Long, Array[Float], Int)]) = {
    val rnd = new scala.util.Random(7)
    def gauss(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0 until 60).map(i => (i.toLong, gauss(), i % 3))
    val dups = base.take(15).map { case (id, v, lab) =>
      (1000L + id, v.map(x => x + (rnd.nextGaussian() * 0.2).toFloat), lab)
    }
    val all = base ++ dups
    val dir = tmp("dd5c")
    all.toDF("vec_id", "embedding", "label").write.parquet(s"$dir/embeddings.parquet")
    (dir, all)
  }

  test("dd5c LSH near-dup: full recall on planted cos≈0.98 dups, no false positives") {
    val (dir, all) = plantedDir
    val truth = (for {
      x <- all; y <- all
      if x._3 == y._3 && x._1 < y._1 && cosine(x._2, y._2) >= Dedup.NearDupTau
    } yield (x._1, y._1)).toSet
    assert(truth.size >= 15, s"expected every planted pair to qualify, got ${truth.size}")
    val found = Dedup.embeddingLshDup(spark, dir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(found == truth, s"missed=${truth -- found} extra=${found -- truth}")
  }

  test("dd5c candidate set is a small fraction of all within-label pairs") {
    def allPairs(dir: String): Long =
      graft.engine.Tables(spark, dir).embeddings.groupBy("label").count()
        .collect().map(r => { val n = r.getLong(1); n * (n - 1) / 2 }).sum
    val (dir, _) = plantedDir
    val planted = Dedup.embeddingLshCandidates(spark, dir).count()
    assert(planted < allPairs(dir) / 2, s"planted fixture: $planted candidates")
    val fixture = Dedup.embeddingLshCandidates(spark, Sf).count()
    assert(fixture < allPairs(Sf) / 4, s"driver fixture: $fixture candidates")
  }

  test("dd6 clusters transitive near-dup chains into one component") {
    // Five docs with CUMULATIVE 7-word edit runs: adjacent pairs share
    // jaccard ~0.83 (> 0.8) but any pair ≥2 hops apart drops to ≤0.69
    // (< 0.8) — the chain has graph diameter 4, so only the transitive
    // closure (several propagation rounds) puts all five in one cluster.
    // F≈G is a second, separate cluster; H is a singleton (no pair → not
    // in the output).
    val w = (0 until 100).map(i => s"w$i")
    val runs = Seq(10 to 16, 80 to 86, 40 to 46, 60 to 66)
    def doc(nRuns: Int) = {
      val repl = runs.take(nRuns).zipWithIndex
        .flatMap { case (r, tag) => r.map(i => i -> s"e$tag$i") }.toMap
      w.indices.map(i => repl.getOrElse(i, w(i))).mkString(" ")
    }
    val chain = (0 to 4).map(n => ((n + 1).toLong, doc(n)))
    val f = ("p0" +: "p1" +: "p2" +: (0 until 60).map(i => s"f$i")).mkString(" ")
    val g = ("p0" +: "p1" +: "p2" +: (0 until 60).map(i => if (i == 30) "edit" else s"f$i")).mkString(" ")
    val h = (0 until 50).map(i => s"h$i").mkString(" ")
    val dir = tmp("dd6")
    (chain ++ Seq((10L, f), (11L, g), (20L, h)))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val clusters = Dedup.dupClusters(spark, dir)
      .as[(Long, Long)].collect().toSeq.groupMap(_._1)(_._2)
    assert(clusters == Map(1L -> Seq(1L, 2L, 3L, 4L, 5L), 10L -> Seq(10L, 11L)))
  }

  test("hot shared-prefix block: banding keeps candidates far below B²") {
    // 100 docs all opening with the same boilerplate ("terms of service
    // for") but otherwise pairwise-disjoint word soup — the crawl shape
    // that makes prefix blocking quadratic: dd2 generates B(B-1)/2 = 4950
    // candidate pairs (and as many Jaccard verifications) from this ONE
    // block. MinHash banding proposes candidates only on signature
    // collision, so the same corpus yields (near-)zero candidates — the
    // reason dd6/tx9 consume minhashPairs, not the prefix blocking.
    val B = 100
    val docs = (0 until B).map { i =>
      (i.toLong,
        "terms of service for " + (0 until 40).map(j => s"u${i}w$j").mkString(" "))
    }
    val dir = tmp("hotprefix")
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val quadratic = B.toLong * (B - 1) / 2
    // sanity: the prefix blocking really does go quadratic here
    val sh = Dedup.shingled(spark, dir)
      .select(col("doc_id"), element_at(col("sh"), 1).as("first_sh"))
    val blocked = sh.select(col("doc_id").as("a"), col("first_sh"))
      .join(sh.select(col("doc_id").as("b"), col("first_sh")), Seq("first_sh"))
      .filter(col("a") < col("b")).count()
    assert(blocked == quadratic, s"expected a full quadratic block, got $blocked")
    val banded = Dedup.minhashCandidates(spark, dir).count()
    assert(banded <= quadratic / 50, s"banding produced $banded of $quadratic pairs")
    // and the cluster op built on banding sees no dup clusters at all
    assert(Dedup.dupClusters(spark, dir).isEmpty)
  }

  test("dd2b capped blocking recalls the planted pairs and survives a hot prefix") {
    // fixture: cap-2 blocking + banded residual must still find every
    // brute-force pair (planted dups sit in size-2..4 prefix blocks, so
    // both branches participate at cap 2)
    val got = Dedup.ngramJaccardCapped(spark, Sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(bruteForcePairs.subsetOf(got),
      s"missed ${(bruteForcePairs -- got).size}/${bruteForcePairs.size}")
    // hot prefix: one 100-doc block, zero true dups — the capped form
    // routes the whole block to banding and returns empty instead of
    // verifying 4950 quadratic pairs
    val B = 100
    val docs = (0 until B).map { i =>
      (i.toLong,
        "terms of service for " + (0 until 40).map(j => s"u${i}w$j").mkString(" "))
    }
    val dir = tmp("hotprefix-capped")
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    assert(Dedup.ngramJaccardCapped(spark, dir).isEmpty)
  }

  test("dup clusters from banding match clusters from exhaustive pairs") {
    // On the driver fixture the banded edge list must reproduce the
    // brute-force ground truth (recall test above), so the components
    // must match a closure computed from bruteForcePairs directly.
    val got = Dedup.dupClusters(spark, Sf)
      .as[(Long, Long)].collect().toSeq.groupMap(_._1)(_._2)
    val (labels, _) = Dedup.connectedComponents(
      bruteForcePairs.toSeq.toDF("doc_a", "doc_b"))
    val want = labels.as[(Long, Long)].collect().toSeq
      .groupMap(_._2)(_._1).map { case (l, ds) => l -> ds.sorted }
    assert(got == want)
  }

  test("connected components converge logarithmically on deep chains") {
    // A 33-vertex path (diameter 32) plus a separate 17-vertex path —
    // plain min-label propagation needs O(diameter) = 32 rounds; the
    // large-star/small-star contraction must collapse it in O(log) —
    // we assert ⌈log₂ 32⌉ + 1 = 6 rounds (incl. the fixed-point
    // confirmation round).
    val chainA = (0L until 32L).map(i => (i, i + 1))
    val chainB = (100L until 116L).map(i => (i, i + 1))
    val pairs = (chainA ++ chainB).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.connectedComponents(pairs)
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got == ((0L to 32L).map(_ -> 0L) ++ (100L to 116L).map(_ -> 100L)).toMap)
    assert(rounds <= 6, s"expected ≤ ⌈log₂ diameter⌉+1 = 6 rounds, took $rounds")
  }

  test("dd7 counts cross-document duplicate passages, not within-doc repeats") {
    def run(tokens: Seq[String]): String = tokens.mkString(" ")
    val shared = (1 to 10).map(i => s"s$i")
    val e30 = (1 to 30).map(i => s"e$i")
    val docs = Seq(
      // 1 & 2: a 10-token passage shared between otherwise-unique docs
      // → exactly 10-8+1 = 3 fully-contained duplicated windows each
      (1L, run((1 to 20).map(i => s"a$i") ++ shared ++ (1 to 20).map(i => s"b$i"))),
      (2L, run((1 to 20).map(i => s"c$i") ++ shared ++ (1 to 20).map(i => s"d$i"))),
      // 3: an 8-gram repeated WITHIN one doc only — must not count
      (3L, run((1 to 8).map(i => s"r$i") ++ Seq("x") ++ (1 to 8).map(i => s"r$i") ++ Seq("y"))),
      // 4: shorter than one window
      (4L, run(Seq("t1", "t2", "t3", "t4", "t5"))),
      // 5 & 6: near-identical docs — over the 20% threshold, keep=false
      (5L, run(e30)),
      (6L, run(e30 :+ "f1"))).toDF("doc_id", "text")
    val got = Dedup.dupPassagesOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_windows"), r.getAs[Long]("dup_windows"), r.getAs[Boolean]("keep"))))
      .toMap
    assert(got(1L) == ((43L, 3L, true)))
    assert(got(2L) == ((43L, 3L, true)))
    assert(got(3L) == ((11L, 0L, true)), "within-doc repetition is tx11's job, not dd7's")
    assert(got(4L) == ((0L, 0L, true)))
    assert(got(5L) == ((23L, 23L, false)))
    assert(got(6L) == ((24L, 23L, false)))
  }

  test("dd11 substring scrub cuts recurring spans, keeps unique text intact") {
    def run(tokens: Seq[String]): String = tokens.mkString(" ")
    val shared = (1 to 10).map(i => s"s$i")
    val e30 = (1 to 30).map(i => s"e$i")
    val docs = Seq(
      // 1 & 2: a 10-token shared passage inside otherwise-unique text —
      // dup windows start at positions 20..22, covering exactly the 10
      // shared tokens (boundary windows mix in unique tokens, so stay
      // unique); each doc loses precisely the shared span
      (1L, run((1 to 20).map(i => s"a$i") ++ shared ++ (1 to 20).map(i => s"b$i"))),
      (2L, run((1 to 20).map(i => s"c$i") ++ shared ++ (1 to 20).map(i => s"d$i"))),
      // 3: an 8-gram repeated WITHIN one doc — total occurrences >= 2, so
      // unlike dd7 both copies are scrubbed (Lee et al. count any
      // recurrence); the separator tokens survive
      (3L, run((1 to 8).map(i => s"r$i") ++ Seq("x") ++ (1 to 8).map(i => s"r$i") ++ Seq("y"))),
      // 4: shorter than one window — passes through untouched
      (4L, run(Seq("t1", "t2", "t3", "t4", "t5"))),
      // 5 & 6: identical docs — every window duplicated, fully scrubbed
      (5L, run(e30)),
      (6L, run(e30))).toDF("doc_id", "text")
    val got = Dedup.substringScrubOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_kept"), r.getAs[Long]("n_removed"))))
      .toMap
    val d1 = run((1 to 20).map(i => s"a$i") ++ (1 to 20).map(i => s"b$i"))
    val d2 = run((1 to 20).map(i => s"c$i") ++ (1 to 20).map(i => s"d$i"))
    assert(got(1L) == ((d1, 40L, 10L)))
    assert(got(2L) == ((d2, 40L, 10L)))
    assert(got(3L) == (("x y", 2L, 16L)))
    assert(got(4L) == ((run(Seq("t1", "t2", "t3", "t4", "t5")), 5L, 0L)))
    assert(got(5L) == (("", 0L, 30L)))
    assert(got(6L) == (("", 0L, 30L)))
  }

  test("dd13 CDC chunks survive a prepend that breaks fixed-offset windows") {
    val tail = (1 to 60).map(i => s"x$i")
    val docs = Seq(
      (1L, tail.mkString(" ")),
      (2L, ("zzz" +: tail).mkString(" ")), // one-token prepend
      (3L, (1 to 40).map(i => s"u$i").mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.cdcChunkDedupOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("dup_chunks"), r.getAs[Long]("dup_tokens"))))
      .toMap
    // content-defined boundaries re-sync after the first boundary inside
    // the shared tail, so the bulk of it dedups despite the shift
    assert(got(1L)._2 >= 1 && got(2L)._2 >= 1, s"CDC must recover shared chunks: $got")
    assert(got(1L)._3 >= 30, s"most of the 60-token tail should dedup, got ${got(1L)._3}")
    assert(got(3L)._2 == 0 && got(3L)._3 == 0, "unique doc must not be flagged")
    // contrast: DISJOINT fixed blocks (the equally-cheap alternative —
    // same partition-the-doc cost as CDC) find NOTHING on this pair:
    // the prepend shifts every block boundary of doc 2
    val blocks = docs
      .withColumn("w", graft.ops.ext.TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), posexplode(col("w")).as(Seq("j", "t")))
      .withColumn("blk", expr(s"j div ${Dedup.CdcMod}"))
      .groupBy("doc_id", "blk")
      .agg(md5(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("j"), col("t")))),
        s => s.getField("t"))).cast("binary")).as("fp"))
    val crossDoc = blocks.as("a").join(blocks.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .count()
    assert(crossDoc == 0L,
      "precondition: disjoint fixed blocks are defeated by the prepend " +
        "(else CDC's re-sync property is not what this test demonstrates)")
  }

  test("dd12 sketch overlap estimates land within the bottom-k error bound") {
    val rows = Dedup.sourceOverlap(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      val exact = r.getAs[Double]("exact_jaccard")
      assert(est >= 0.0 && est <= 1.0)
      // bottom-k (k=64) standard error ≈ sqrt(J(1-J)/k) ≤ 0.0625; allow
      // 4 sigma — a violation here means the estimator is wrong, not noisy
      assert(math.abs(est - exact) <= 0.25,
        s"${r.getAs[String]("source_a")}×${r.getAs[String]("source_b")}: est $est vs exact $exact")
    }
    // identical sets must estimate exactly 1: feed one source against
    // itself through the same sketch pipeline via a relabeled frame
    val mean = rows.map(r => math.abs(
      r.getAs[Double]("est_jaccard") - r.getAs[Double]("exact_jaccard"))).sum / rows.length
    assert(mean <= 0.08, s"mean |est-exact| $mean exceeds the k=64 error budget")
  }

  test("simhash signatures are deterministic and banding finds near-dups") {
    val s1 = Dedup.simhashSignatures(spark, Sf).collect()
    val s2 = Dedup.simhashSignatures(spark, Sf).collect()
    assert(s1.sameElements(s2))
    // near-dup docs (jaccard ~0.99) should be hamming-close; banded pairs
    // must include at least half of the planted pairs (simhash is a
    // weaker signal than minhash on shingles)
    val pairs = Dedup.simhashPairs(spark, Sf, maxHamming = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val recall = bruteForcePairs.count(pairs.contains).toDouble / bruteForcePairs.size
    assert(recall >= 0.5, s"simhash recall $recall")
  }

  test("dd10 soft dedup conserves the token budget and keeps only exemplars") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val n = docs.count()
    val w = Dedup.dedupWeights(spark, Sf)
      .as[(Long, Long)].collect().toMap
    assert(w.values.map(_.toLong).sum == n, "sum(weight) must equal corpus size")
    // ground truth clusters from the exhaustive pair set
    val clusters = Dedup.dupClusters(spark, Sf)
      .as[(Long, Long)].collect().groupBy(_._1)
    clusters.foreach { case (label, members) =>
      assert(w.get(label).contains(members.length.toLong),
        s"exemplar $label weight")
      members.map(_._2).filter(_ != label).foreach(m =>
        assert(!w.contains(m), s"non-exemplar $m must be dropped"))
    }
    // everything not in a cluster carries weight 1
    val memberSet = clusters.values.flatten.map(_._2).toSet
    w.foreach { case (id, wt) =>
      if (!memberSet.contains(id)) assert(wt == 1L, s"singleton $id weight $wt") }
  }

  test("dd9 bloom verdicts are exact: parity with brute-force join, no false negatives") {
    // re-delivery corpus: ids 0..99; history = %10<8, incoming = %10>=6.
    // Residues 6,7 are re-delivered content (same text as their history
    // copy — here literally the same row); 8,9 are genuinely new.
    val docs = (0L until 100L).map(i => (i, s"document body number ${i % 80}"))
      .toDF("doc_id", "text")
    val (result, probed) = Dedup.bloomDedupOf(spark, docs, Dedup.BloomNumBits)
    val got = result.as[(Long, Boolean)].collect().toMap
    assert(got.size == 40)
    got.foreach { case (id, dup) =>
      assert(dup == (id % 10 < 8), s"doc $id classified $dup") }
    // one-sided error: every true dup must be bloom-positive
    val falseNeg = probed.filter(col("maybe_dup") === false)
      .filter(col("doc_id") % 10 < 8).count()
    assert(falseNeg == 0L)
  }

  test("dd6 cluster artifact rebuilds only when the corpus manifest changes") {
    // a private corpus dir the test owns (the artifact path is keyed to
    // it, so this exercises the real build-once lifecycle end to end)
    val corpus = tmp("dd6-artifact-corpus")
    java.nio.file.Files.copy(
      new java.io.File(s"$Sf/documents.parquet").toPath,
      new java.io.File(s"$corpus/documents.parquet").toPath)
    val first = Dedup.dupClusterTable(spark, corpus)
    val files1 = first.inputFiles.toSet
    // unchanged corpus: a second call must READ, not rebuild (same files)
    assert(Dedup.dupClusterTable(spark, corpus).inputFiles.toSet == files1)
    // corpus content change (size flips the manifest even if mtime is
    // preserved): artifact must rebuild
    val docs = spark.read.parquet(s"$corpus/documents.parquet")
    val bigger = docs.unionByName(docs.limit(7))
    val tmpOut = tmp("dd6-artifact-newdocs")
    bigger.coalesce(1).write.mode("overwrite").parquet(tmpOut)
    val part = new java.io.File(tmpOut).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      new java.io.File(s"$corpus/documents.parquet").toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val rebuilt = Dedup.dupClusterTable(spark, corpus)
    assert(rebuilt.inputFiles.toSet != files1, "changed corpus must rebuild")
  }

  test("dd14 prefix filtering is exact: parity with all-shared-shingle pairs") {
    // ground truth: EVERY pair sharing >=1 surviving shingle, containment
    // computed over the same df-capped space — a pair with zero shared
    // survivors has containment 0, so this join is complete for t > 0
    val occ = Dedup.shingled(spark, Sf)
      .select(col("doc_id"), explode(col("sh")).as("g"))
    val dfreq = occ.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") <= Dedup.ContainDfCap)
    val surv = occ.join(dfreq, "g").select("doc_id", "g")
    val sz = surv.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val expected = surv.select(col("doc_id").as("doc_a"), col("g"))
      .join(surv.select(col("doc_id").as("doc_b"), col("g")), Seq("g"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
      .filter(col("inter") * Dedup.ContainTDen >= col("n_a") * Dedup.ContainTNum ||
        col("inter") * Dedup.ContainTDen >= col("n_b") * Dedup.ContainTNum)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val got = Dedup.containmentPairs(spark, Sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == expected,
      s"missed=${(expected -- got).size} extra=${(got -- expected).size}")
    assert(expected.nonEmpty, "fixture should contain containment pairs")
  }

  test("dd14 catches doc-in-doc containment that Jaccard misses by construction") {
    // a 20-token excerpt of a 100-token doc: containment 1.0, but
    // Jaccard ≈ 18/98 ≈ 0.18 — far below any near-dup threshold
    val big = (0 until 100).map(i => s"tok$i").mkString(" ")
    val small = (40 until 60).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, big), (2L, small)).toDF("doc_id", "text")
    val sh = docs.withColumn("w", split(trim(col("text")), "\\s+"))
      .filter(size(col("w")) >= 3)
      .withColumn("sh", expr(Dedup.shingleExpr)).select("doc_id", "sh")
    val pairs = Dedup.containmentPairsOf(sh).collect()
    assert(pairs.length == 1)
    val r = pairs.head
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Double]("cont_b") == 1.0, "excerpt fully contained")
    // the symmetric-Jaccard view of the same pair stays far below 0.8
    val j = sh.as("a").crossJoin(sh.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select((size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
        (size(col("a.sh")) + size(col("b.sh")) -
          size(array_intersect(col("a.sh"), col("b.sh"))))).as("j"))
      .head().getDouble(0)
    assert(j < 0.3, s"jaccard unexpectedly high: $j")
  }

  test("dd14 df-cap drops a hot shingle before pairing: no candidate explosion") {
    // B docs sharing ONE boilerplate shingle, otherwise disjoint — the
    // dd2 hot-prefix shape. The shared shingle's df = B > ContainDfCap,
    // so it is dropped before any join and the corpus yields ZERO
    // containment pairs (disjoint survivor sets), instead of B(B−1)/2
    // candidates through the hot hash.
    val B = Dedup.ContainDfCap * 4
    val docs = (0 until B).map { i =>
      (i.toLong, "terms of service " + (0 until 10).map(j => s"u${i}w$j").mkString(" "))
    }
    val sh = docs.toDF("doc_id", "text")
      .withColumn("w", split(trim(col("text")), "\\s+"))
      .filter(size(col("w")) >= 3)
      .withColumn("sh", expr(Dedup.shingleExpr)).select("doc_id", "sh")
    assert(Dedup.containmentPairsOf(sh).isEmpty,
      "hot boilerplate shingle must not generate candidate pairs")
  }

  test("dd14 prefix length survives the (1−t)·n-integer boundary (n multiple of 5)") {
    // A has exactly 5 surviving shingles, 4 shared with B (cont_a = 4/5
    // = t exactly) and its UNIQUE shingle is its rarest (df 1 vs df 2) —
    // a float prefix length floor(n·(1.0−0.8))+1 = floor(0.9999…)+1 = 1
    // selects only the unique shingle and never generates the pair
    // (B can't rescue it: B's two rarest are its own unique df-1
    // shingles and cont_b = 4/6 < t). The integer form n−⌈t·n⌉+1 = 2
    // must reach the first shared shingle.
    val docs = Seq(
      (1L, "a b c d e f g"),      // shingles: abc bcd cde def efg (5)
      (2L, "q r b c d e f g"))    // qrb rbc + the 4 shared (6)
    val sh = docs.toDF("doc_id", "text")
      .withColumn("w", split(trim(col("text")), "\\s+"))
      .withColumn("sh", expr(Dedup.shingleExpr)).select("doc_id", "sh")
    val pairs = Dedup.containmentPairsOf(sh)
      .select("doc_a", "doc_b", "n_common", "n_a", "n_b")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 4L, 5L, 6L)),
      s"boundary pair missed or wrong: ${pairs.toSeq}")
  }

  test("dd9 stays exact when a tiny sketch forces bloom false positives") {
    // 64 bits for 800 distinct history fingerprints: the sketch
    // saturates, the genuinely-new rows (residues 8,9) go bloom-positive
    // anyway, and the verify join must clear every one of them
    val docs = (0L until 1000L).map(i => (i, s"unique payload $i"))
      .toDF("doc_id", "text")
    val (result, probed) = Dedup.bloomDedupOf(spark, docs, numBits = 64L)
    val got = result.as[(Long, Boolean)].collect().toMap
    got.foreach { case (id, dup) =>
      assert(dup == (id % 10 < 8), s"doc $id classified $dup") }
    val falsePos = probed
      .filter(col("maybe_dup") && col("doc_id") % 10 >= 8).count()
    assert(falsePos > 0L, "sketch this small must produce false positives")
  }

  test("dd15: the incrementally-maintained index equals a full rebuild") {
    import graft.ops.lake.Snapshots
    // the operator builds the corpus index, probes it with the batch,
    // then APPENDS the batch's buckets — afterwards the index table
    // must hold exactly the buckets a from-scratch build over the WHOLE
    // corpus would produce (the ann3c-style convergence claim), or the
    // next batch dedups against a drifted index
    val idx = tmp("dd15-idx")
    Dedup.incrementalLshAt(spark, Sf, idx).collect() // build + probe + append
    val stored = Snapshots.read(spark, idx)
      .select("doc_id", "band_id", "band_hash")
      .as[(Long, Int, String)].collect().toSet
    val full = Dedup.bucketsFor(Dedup.shingled(spark, Sf).select("doc_id", "sh"))
      .as[(Long, Int, String)].collect().toSet
    assert(stored == full,
      s"index drifted: missing=${(full -- stored).take(3)} extra=${(stored -- full).take(3)}")
    // and the index is a REAL lake table: versioned (build + append)
    assert(Snapshots.currentVersion(idx) == 2L)
  }

  test("dd15 index probe opens only band-hash-admitted files (DFP discipline)") {
    import graft.ops.lake.{DynamicFilter, Snapshots}
    import spark.implicits._
    // a band_hash-clustered index laid out like the operator builds it:
    // the probe must OPEN a strict file subset (pre-r13 it joined the
    // full index scan — O(index) per batch, r12 verdict find)
    val idx = tmp("dd15-probe-idx")
    val corpus = (0L until 64L)
      .map(d => (d, (d % 2).toInt, f"h$d%04d"))
      .toDF("doc_id", "band_id", "band_hash")
      .withColumn("band", col("band_id").cast("string"))
    Snapshots.commitAll(idx, Snapshots.stageWithStats(
      corpus, idx, "band", "band_hash", buckets = 8))
    val all = Snapshots.entriesAll(idx)
    assert(all.size >= 6, s"fixture needs several index files, got ${all.size}")
    val batch = Seq((100L, 0, "h0002"), (101L, 1, "h0061"))
      .toDF("doc_id", "band_id", "band_hash")
    // the probe's own file predicate, re-derived with probeIndex's args
    val (pred, keys) = DynamicFilter.taggedKeyPrune(spark, idx, "band_hash",
      batch.select(col("band_id"), col("band_hash"), col("doc_id").as("doc_b")),
      "band_hash", dimTagCol = "band_id", factTagCol = "band",
      maxKeys = 10000)
    assert(keys.exists(_.toSet == Set("h0002", "h0061")))
    val kept = all.filter(pred)
    assert(kept.size < all.size,
      s"probe must not open the whole index: ${kept.size}/${all.size}")
    // correctness: pruned probe equals the full bucket-identity match
    val got = Dedup.probeIndex(spark, idx, batch)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 100L), (61L, 101L)), s"got $got")
    // same band_hash, WRONG band_id: bucket identity must not match
    val cross = Seq((200L, 1, "h0002")).toDF("doc_id", "band_id", "band_hash")
    assert(Dedup.probeIndex(spark, idx, cross).isEmpty,
      "a band_hash collision across bands is not a bucket match")
    // over the pair cap: the per-tag RANGE fallback (one grouped agg,
    // no dim re-scan) still prunes, and admits a SUPERSET of what the
    // exact in-list admits (sound degradation)
    val batch4 = Seq((100L, 0, "h0002"), (101L, 0, "h0004"),
        (102L, 1, "h0061"), (103L, 1, "h0063"))
      .toDF("doc_id", "band_id", "band_hash")
      .select(col("band_id"), col("band_hash"), col("doc_id").as("doc_b"))
    val (predRange, keysRange) = DynamicFilter.taggedKeyPrune(spark, idx,
      "band_hash", batch4, "band_hash", dimTagCol = "band_id",
      factTagCol = "band", maxKeys = 3)
    assert(keysRange.isEmpty, "over the cap must not keep a key list")
    val keptRange = all.filter(predRange)
    assert(keptRange.size < all.size,
      s"per-tag range fallback must still prune: ${keptRange.size}/${all.size}")
    val (predIn, _) = DynamicFilter.taggedKeyPrune(spark, idx,
      "band_hash", batch4, "band_hash", dimTagCol = "band_id",
      factTagCol = "band", maxKeys = 10000)
    assert(all.filter(predIn).forall(predRange),
      "the range fallback must admit every file the exact in-list admits")
  }

  test("dd16: no verified near-dup pair straddles the train/eval split") {
    import spark.implicits._
    val split = Dedup.leakageSafeSplit(spark, Sf)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // every document is assigned, both sides non-empty
    assert(split.values.toSet == Set("train", "eval"),
      s"both splits must be non-empty: ${split.values.toSet}")
    // the leakage claim itself: every verified near-dup pair lands on
    // ONE side — the whole reason the split is cluster-atomic
    val pairs = Dedup.minhashPairs(spark, Sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture must contain verified near-dup pairs")
    val straddling = pairs.filter { case (a, b) => split(a) != split(b) }
    assert(straddling.isEmpty,
      s"near-dup pairs straddle the split: ${straddling.take(3).mkString(", ")}")
    // dd16b: the hashed-canonical-id form keeps the same atomicity —
    // no verified pair straddles — while the split no longer depends on
    // id structure (a skewed-id corpus still lands ~90/10)
    val hashed = Dedup.leakageSafeSplitHashed(spark, Sf)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(hashed.values.toSet == Set("train", "eval"),
      s"hashed split: both sides must be non-empty: ${hashed.values.toSet}")
    val hStraddling = pairs.filter { case (a, b) => hashed(a) != hashed(b) }
    assert(hStraddling.isEmpty,
      s"hashed split straddles: ${hStraddling.take(3).mkString(", ")}")
    // cluster members agree with their canonical id's assignment
    val clusters = Dedup.leakageSafeSplitHashed(spark, Sf)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b),
        s"near-dup pair ($a,$b) must share a cluster id")
    }
  }
}
