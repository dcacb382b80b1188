package graft

import graft.ops.ext.Multimodal.StubCodec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY §5d) using raw ScalaCheck generators (the
  * scalatest-scalacheck bridge isn't in the offline cache): cast-coerce
  * NULL semantics, dedup idempotence, codec determinism/bounds. */
class PropertiesSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("try_cast never throws and agrees with Scala parsing where defined") {
    val gen = Gen.oneOf(
      Gen.alphaNumStr, Gen.numStr,
      Gen.chooseNum(-1e9, 1e9).map(_.toString),
      Gen.const(""), Gen.const("  12.5  "), Gen.const("1e3"), Gen.const("NaN"))
    val ss = samples(gen, 120)
    val out = ss.toDF("s")
      .select(expr("try_cast(s AS double)").as("d"), col("s"))
      .collect()
    out.foreach { r =>
      val viaScala = scala.util.Try(r.getAs[String]("s").trim.toDouble).toOption
      val viaSpark = if (r.isNullAt(0)) None else Some(r.getDouble(0))
      // Spark may parse a superset; agreement required where Scala parses:
      viaScala.foreach { d =>
        assert(viaSpark.isDefined && (viaSpark.get == d ||
          (viaSpark.get.isNaN && d.isNaN)), s"input '${r.getAs[String]("s")}'")
      }
    }
  }

  test("last-write-wins dedup is idempotent") {
    import graft.ops.silver.Staging
    val once = Staging.dedupLww(spark, Sf)
    val keyCount = once.select("user_id", "event_type").distinct().count()
    assert(once.count() == keyCount)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy(col("last_event_id").desc)
    val twice = once.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(twice.count() == once.count())
  }

  test("portable HLL sketch estimates within theoretical error bound") {
    // standard error for m=256 registers is 1.04/√256 ≈ 6.5%; allow 3σ
    val rows = graft.ops.gold.Aggregates.hllSketchDistinct(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_parts").toDouble
      val est = r.getAs[Double]("hll_est")
      assert(math.abs(est - exact) / exact < 0.20,
        s"${r.getAs[String]("l_returnflag")}: est $est vs exact $exact")
    }
  }

  test("approx quantile profile lands within the rank-error bound of the exact profile") {
    import graft.ops.gold.Aggregates
    val o = spark.read.parquet(s"$Sf/orders.parquet")
      .select(col("o_orderpriority").as("p"), col("o_totalprice").cast("double").as("v"))
      .as[(String, Double)].collect().toSeq.groupBy(_._1)
      .map { case (p, vs) => p -> vs.map(_._2).sorted }
    val approx = Aggregates.approxQuantileProfile(spark, Sf).collect()
    assert(approx.nonEmpty)
    // approx_percentile guarantees rank error ≤ N / accuracy per group:
    // the returned value must sit between the values at the error-shifted
    // ranks of the exact sorted sequence
    approx.foreach { r =>
      val vs = o(r.getAs[String]("o_orderpriority"))
      val eps = math.max(1, vs.length / Aggregates.ApproxQuantileAccuracy)
      Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p95" -> 0.95).foreach {
        case (cn, q) =>
          val rank = (q * (vs.length - 1)).round.toInt
          val lo = vs(math.max(0, rank - 2 * eps))
          val hi = vs(math.min(vs.length - 1, rank + 2 * eps))
          val got = r.getAs[Double](cn)
          assert(got >= lo && got <= hi,
            s"${r.getAs[String]("o_orderpriority")}/$cn: $got outside [$lo, $hi]")
      }
    }
  }

  test("stratified sample hits each language's quota within sampling noise") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val totals = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val kept = graft.ops.ext.TextAnalysis.stratifiedSample(spark, Sf)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    graft.ops.ext.TextAnalysis.MixQuotaBps.foreach { case (lang, bps) =>
      val n = totals.getOrElse(lang, 0L)
      if (n >= 40) { // enough mass for a meaningful rate check
        val rate = kept.getOrElse(lang, 0L).toDouble / n
        val want = bps / 10000.0
        // md5-uniform membership: 3σ binomial tolerance
        val tol = 3 * math.sqrt(want * (1 - want) / n)
        assert(math.abs(rate - want) <= tol + 1e-9,
          s"$lang: rate $rate vs quota $want (n=$n, tol $tol)")
      }
    }
  }

  test("corpus shuffle is a deterministic permutation") {
    val a = graft.ops.ext.TextAnalysis.corpusShuffle(spark, Sf)
      .as[(Long, Long, Long)].collect().toSeq
    val total = spark.read.parquet(s"$Sf/documents.parquet").count()
    assert(a.map(_._1) == (1L to total))          // contiguous global index
    assert(a.map(_._2).distinct.length.toLong == total) // every doc exactly once
    val b = graft.ops.ext.TextAnalysis.corpusShuffle(spark, Sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(a == b)                                 // replayable per seed
  }

  test("sequence packing covers every doc once; bins respect the budget") {
    val rows = graft.ops.ext.TextAnalysis.sequencePack(spark, Sf)
      .as[(Long, Long, Long, Long)].collect()
    val total = spark.read.parquet(s"$Sf/documents.parquet").count()
    assert(rows.length.toLong == total)
    assert(rows.map(_._3).distinct.length.toLong == total)
    rows.groupBy(r => (r._1, r._2)).foreach { case ((pid, bin), members) =>
      val toks = members.map(_._4).sum
      assert(toks <= graft.ops.ext.TextAnalysis.PackBudget || members.length == 1,
        s"shard $pid bin $bin holds $toks tokens across ${members.length} docs")
    }
  }

  test("decontamination flags exactly the train docs sharing an eval 8-gram") {
    // doc_id 20 lands on the eval side of the md5-mod split (md5("20")
    // prefix % 10 == 0); 1 and 2 land on the train side. Train doc 1
    // embeds an 8-token passage from the eval doc mid-soup; train doc 2
    // is fully disjoint.
    val passage = (0 until 8).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (20L, s"eval prefix words $passage and an eval tail here"),
      (1L, (0 until 10).map(i => s"a$i").mkString(" ") + s" $passage " +
        (0 until 10).map(i => s"b$i").mkString(" ")),
      (2L, (0 until 30).map(i => s"c$i").mkString(" ")))
    val dir = tmp("decontam")
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = graft.ops.ext.TextAnalysis.decontaminate(spark, dir)
      .as[(Long, Long, Boolean)].collect()
      .map { case (k, v, keep) => k -> ((v, keep)) }.toMap
    assert(out.keySet == Set(1L, 2L), s"train report rows: ${out.keySet}")
    assert(out(1L)._1 == 1L && !out(1L)._2, s"doc 1: ${out(1L)}")
    assert(out(2L) == ((0L, true)), s"doc 2: ${out(2L)}")
  }

  test("mixture plan: shares sum to 1 and rates rebalance to the uniform target") {
    val rows = graft.ops.ext.TextAnalysis.mixWeights(spark, Sf).collect()
    val n = rows.length
    assert(math.abs(rows.map(_.getAs[Double]("tok_share_r")).sum - 1.0) < 1e-3)
    rows.foreach { r =>
      // rate × share = 1/n_sources (the uniform target), up to rounding
      val got = r.getAs[Double]("rate_r") * r.getAs[Double]("tok_share_r")
      assert(math.abs(got - 1.0 / n) < 1e-4, s"$r")
      assert(r.getAs[Long]("epochs") >= 1L)
    }
  }

  test("vocab coverage is monotone and ends at exactly 1") {
    val rows = graft.ops.ext.TextAnalysis.vocabCoverage(spark, Sf).collect()
    val shares = rows.map(_.getAs[Double]("cum_share_r"))
    assert(shares.sliding(2).forall { case Array(a, b) => b >= a })
    // the fixture vocabulary is far below the cap, so coverage completes
    assert(math.abs(shares.last - 1.0) < 1e-6)
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.sliding(2).forall { case Array(a, b) => b <= a }, "ranked by frequency")
  }

  test("calibrated quality keeps ~80% of EVERY source; a global cut would not") {
    import graft.ops.ext.TextAnalysis
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.calibratedQuality(spark, Sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Double]("quality_r"), r.getAs[Boolean]("keep")))
    val bySource = rows.groupBy(_._1)
    bySource.foreach { case (src, rs) =>
      val kept = rs.count(_._3).toDouble / rs.length
      assert(kept >= 0.7 && kept <= 0.9,
        s"$src keeps ${kept * 100}% — calibration must cut ~20% per source")
    }
    // the calibrated threshold is per-source by construction: the global
    // score value at each source's cut differs across sources (if they
    // were all equal, a raw global threshold would do the same job and
    // this operator would be pointless)
    val cutScores = bySource.values.map { rs =>
      rs.filter(_._3).map(_._2).min // lowest KEPT score per source
    }.toSeq
    assert(cutScores.distinct.size > 1, "per-source cut points must differ")
  }

  test("dd11 substring scrub matches a brute-force reference on random corpora") {
    import graft.ops.ext.Dedup
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (trial <- 1 to 5) {
      val docs = (1L to 25L).map { id =>
        id -> Vector.fill(rnd.nextInt(21))(vocab(rnd.nextInt(vocab.size)))
      }
      // brute-force reference in plain Scala: count every 8-gram
      // occurrence, cover, rewrite
      val n = Dedup.PassageN
      val gramCounts = docs.flatMap { case (_, w) => w.sliding(n).filter(_.length == n) }
        .groupBy(identity).view.mapValues(_.size).toMap
      val want = docs.map { case (id, w) =>
        val covered = w.sliding(n).zipWithIndex
          .filter { case (g, _) => g.length == n && gramCounts(g) >= 2 }
          .flatMap { case (_, i) => i until (i + n) }.toSet
        val kept = w.zipWithIndex.collect { case (t, j) if !covered(j) => t }
        id -> ((kept.mkString(" "), kept.size.toLong, (w.size - kept.size).toLong))
      }.toMap
      val got = Dedup.substringScrubOf(
        docs.map { case (id, w) => (id, w.mkString(" ")) }.toDF("doc_id", "text"))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("clean_text"), r.getAs[Long]("n_kept"), r.getAs[Long]("n_removed"))))
        .toMap
      // empty token array edge: split("") yields [""], one pseudo-token —
      // mirror the reference for those docs the same way the oracle does
      val wantAdj = want.map { case (id, (txt, k, r)) =>
        if (docs.toMap.apply(id).isEmpty) id -> (("", 1L, 0L)) else id -> ((txt, k, r))
      }
      assert(got == wantAdj, s"trial $trial diverged")
    }
  }

  test("misra-gries guarantee holds on random streams: candidates cover all true HHs") {
    import graft.ops.gold.Aggregates
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val k = 8 + rnd.nextInt(56) // 8..63 counters
      // zipfian-ish stream over a vocab larger than k
      val vocab = (1 to k * 4).map(i => s"t$i")
      val stream = (1 to 4000).map { _ =>
        val r = rnd.nextDouble()
        if (r < 0.5) vocab(rnd.nextInt(3)) // 3 hot tokens share half the mass
        else vocab(rnd.nextInt(vocab.size))
      }
      val mg = stream.foldLeft(Aggregates.MgSummary(Map.empty, 0L)) {
        new Aggregates.MisraGries(k).reduce
      }
      assert(mg.counts.size <= k && mg.n == stream.size)
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = stream.size.toLong / (k + 1)
      val mustSurvive = exact.collect { case (t, f) if f > bound => t }
      assert(mustSurvive.forall(mg.counts.contains),
        s"trial $trial: item over N/(k+1)=$bound missing from the $k-counter summary")
      // merged two-way split must satisfy the same guarantee
      val (s1, s2) = stream.splitAt(stream.size / 3)
      val agg = new Aggregates.MisraGries(k)
      val merged = agg.merge(
        s1.foldLeft(Aggregates.MgSummary(Map.empty, 0L))(agg.reduce),
        s2.foldLeft(Aggregates.MgSummary(Map.empty, 0L))(agg.reduce))
      assert(merged.n == stream.size && merged.counts.size <= k)
      assert(mustSurvive.forall(merged.counts.contains),
        s"trial $trial: merge broke the mergeable-summaries guarantee")
    }
  }

  test("misra-gries two-pass heavy hitters are exact when vocab far exceeds k") {
    import graft.ops.gold.Aggregates
    import org.apache.spark.sql.functions._
    // 5000 distinct rare tokens (1 occurrence each) + 3 planted heavy
    // tokens at ~6% apiece — vocab 5003 >> k=64 counters, so pass 1
    // genuinely sketches (decrements fire); threshold frac=20 < k+1
    // keeps the recall guarantee
    val rare = (1 to 5000).map(i => s"r$i")
    val heavy = Seq.fill(320)("h1") ++ Seq.fill(310)("h2") ++ Seq.fill(300)("h3")
    val toks = spark.createDataFrame(
      new scala.util.Random(42).shuffle(rare ++ heavy).zipWithIndex.map { case (t, i) => (i, t) })
      .toDF("i", "token").repartition(8).select("token")
    val n = (rare ++ heavy).size.toLong
    val threshold = (n + 19) / 20 // ceil(N/20) = 297 < 300
    val sketch = toks.as[String](org.apache.spark.sql.Encoders.STRING)
      .select(new Aggregates.MisraGries(64).toColumn).head()
    assert(sketch.n == n)
    assert(sketch.counts.size <= 64, "summary must stay within the counter budget")
    assert(Set("h1", "h2", "h3").subsetOf(sketch.counts.keySet),
      "every true heavy hitter must survive pass 1")
    val exact = toks.groupBy("token").agg(count(lit(1)).as("c"))
      .filter(col("c") >= threshold)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val twoPass = toks.filter(col("token").isin(sketch.counts.keys.toSeq: _*))
      .groupBy("token").agg(count(lit(1)).as("c"))
      .filter(col("c") >= threshold)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact == Map("h1" -> 320L, "h2" -> 310L, "h3" -> 300L))
    assert(twoPass == exact, "exact second pass must kill sketch false positives")
  }

  test("stub codec is pure and bounded") {
    val gen = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    samples(gen, 100).foreach { bytes =>
      val arr = bytes.toArray
      val (w1, h1, f1, m1) = StubCodec.decode("image/x", arr)
      val (w2, h2, f2, m2) = StubCodec.decode("image/x", arr)
      assert((w1, h1, f1, m1) == (w2, h2, f2, m2))
      assert(w1 >= 64 && h1 >= 64 && f1 >= 1)
      assert(m1 >= 0.0 && m1 <= 1.0)
    }
  }

  test("interpolated bigram LM fits the training corpus at least as well as unigram") {
    import graft.ops.ext.TextAnalysis
    // Gibbs: the MLE bigram term dominates in corpus total, and the
    // lambda-mixture is concave-bounded below by the unigram model, so
    // the token-weighted corpus NLL must not increase (equality only if
    // bigrams carry no information). Per-doc it CAN go either way.
    val bi = TextAnalysis.bigramLmScore(spark, Sf)
      .select("doc_id", "n_tokens", "nll_r").as[(Long, Long, Double)].collect()
    val uniByDoc = TextAnalysis.lmScore(spark, Sf)
      .select("doc_id", "nll")
      .as[(Long, Double)].collect().toMap
    val totTok = bi.map(_._2).sum.toDouble
    val wBi = bi.map { case (_, n, s) => n * s }.sum / totTok
    val wUni = bi.map { case (d, n, _) => n * uniByDoc(d) }.sum / totTok
    info(s"corpus NLL: bigram $wBi vs unigram $wUni")
    assert(wBi <= wUni + 1e-9, s"bigram NLL $wBi worse than unigram $wUni")
    assert(wBi > 0.0)
  }

  test("z-order layout prunes more files than a time-sorted layout for a user-range predicate") {
    import graft.ops.bronze.Sinks
    val manifest = Sinks.zorderLayout(spark, Sf)
      .select("file_id", "min_u", "max_u", "min_h", "max_h")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(manifest.size == Sinks.ZorderFiles)
    // baseline layout: same rows packed into the same file count in
    // TIME order (the default ingest layout) — u bounds computed
    // driver-side from the same inputs
    val rows = graft.engine.Tables(spark, Sf).events
      .select(col("user_id").cast("long"),
        expr("(unix_millis(cast(ts as timestamp)) div 3600000) % 1024"))
      .as[(Long, Long)].collect().toSeq
    val perFile = math.ceil(rows.size.toDouble / Sinks.ZorderFiles).toInt
    val timeFiles = rows.sortBy { case (u, h) => (h, u) }.grouped(perFile)
      .map(g => (g.map(_._1).min, g.map(_._1).max)).toSeq
    // user-range point-ish predicate: 1/16 of the u domain
    val us = rows.map(_._1)
    val (lo, hi) = (us.min, us.max)
    val w = math.max((hi - lo) / 16, 1)
    val (r0, r1) = (lo + 7 * w, lo + 8 * w)
    def pruned(files: Seq[(Long, Long)]): Int =
      files.count { case (mn, mx) => mx < r0 || mn > r1 }
    val zPruned = pruned(manifest.map(m => (m._2, m._3)))
    val tPruned = pruned(timeFiles)
    info(s"files=${Sinks.ZorderFiles} zPruned=$zPruned timeSortPruned=$tPruned")
    assert(zPruned > tPruned,
      s"z-order layout ($zPruned) did not out-prune time layout ($tPruned)")
    assert(zPruned >= Sinks.ZorderFiles / 2,
      s"z-order pruned only $zPruned/${Sinks.ZorderFiles} for a 1/16-width predicate")
  }

  test("BPE merge fold: greedy left-to-right, overlap-correct, boundary-safe") {
    // (symbols, pair a, pair b) -> expected merged symbol string; the
    // reference outcomes are hand-derived BPE-greedy applications
    val cases = Seq(
      ("a b c", "a", "b", "ab c"),            // plain merge
      ("a a a", "a", "a", "aa a"),            // overlap: leftmost wins, no re-merge
      ("a a a a", "a", "a", "aa aa"),         // two disjoint merges
      ("ab c d", "b", "c", "ab c d"),         // 'b' inside symbol "ab" must NOT match
      ("a b a b a", "a", "b", "ab ab a"),     // repeated pair, zero-width boundary
      ("x a b y", "a", "b", "x ab y"),        // interior merge
      ("q", "a", "b", "q"))                   // single symbol untouched
    val df = cases.map { case (s, a, b, _) => (s, a, b, a + b) }
      .toDF("sym", "pa", "pb", "pm")
    val got = df.select(expr(
      graft.ops.ext.TextAnalysis.bpeApplyExpr("sym", "pa", "pb", "pm")))
      .as[String].collect().toSeq
    got.zip(cases).foreach { case (g, (s, a, b, want)) =>
      assert(g == want, s"fold('$s', '$a $b') = '$g', want '$want'")
    }
  }

  test("nfc expression composes canonically (codegen and interpreted)") {
    graft.functions.NfcNormalize.register(spark)
    val decomposed = "café"          // e + combining acute
    val composed = "café"             // precomposed é
    val cases = Seq(decomposed, composed, "plain ascii", "", "ḍ̇")
    def run(): Seq[(String, String)] = cases.toDF("s")
      .select(col("s"), expr("nfc(s)").as("n")).as[(String, String)].collect().toSeq
    val viaCodegen = run()
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val viaInterp = try run()
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    assert(viaCodegen == viaInterp)
    val m = viaCodegen.toMap
    assert(m(decomposed) == composed, "NFC must compose e+U+0301 to é")
    assert(m(composed) == composed, "already-normal text unchanged")
    assert(m("plain ascii") == "plain ascii" && m("") == "")
    // UAX #15 ordering case: ḋ + dot-below must reorder+compose to ḍ+dot-above
    assert(m("ḍ̇") == "ḍ̇")
    // null propagates
    val nul = Seq[(java.lang.Long, String)]((1L, null)).toDF("i", "s")
      .select(expr("nfc(s)")).collect()
    assert(nul.head.isNullAt(0))
  }

  test("perplexity buckets split the corpus into near-equal ordered tertiles") {
    val rows = graft.engine.Caching.scoped {
      graft.ops.ext.TextAnalysis.pplBuckets(spark, Sf)
        .select("bucket", "nll").as[(String, Double)].collect().toSeq
    }
    val byBucket = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    val n = rows.size
    byBucket.foreach { case (b, xs) =>
      assert(math.abs(xs.size - n / 3.0) <= n / 10.0, s"$b size ${xs.size} of $n") }
    assert(byBucket("head").max <= byBucket("middle").min)
    assert(byBucket("middle").max <= byBucket("tail").min)
  }

  test("table profile: keys unique, no nulls, extremes match direct aggregates") {
    val prof = graft.ops.gold.Assertions.tableProfile(spark, Sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val o = spark.read.parquet(s"$Sf/orders.parquet")
    val n = o.count()
    val keyRow = prof("o_orderkey")
    assert(keyRow.getAs[Long]("n_nulls") == 0L)
    assert(keyRow.getAs[Long]("n_distinct") == n, "o_orderkey must be unique")
    assert(keyRow.getAs[Double]("max_num") ==
      o.agg(max("o_orderkey")).head.getLong(0).toDouble)
    assert(prof("o_orderstatus").getAs[String]("min_str") != null)
    assert(prof.values.forall(r => r.getAs[Long]("n_nulls") == 0L))
  }

  test("funnel honors stage ORDER: pre-view clicks and pre-click purchases don't count") {
    import graft.ops.gold.Windows
    import org.apache.spark.sql.functions._
    val fixture = graft.engine.Graft.tmpDir("w6-fixture")
    // nanos timestamps; event ids unique. user 1: full ordered funnel.
    // user 2: click BEFORE its only view, purchase after — reaches view
    // only (the out-of-order click must not open the click stage).
    // user 3: view then purchase but no click — purchase must not count.
    // user 4: second click after the view rescues the funnel.
    val rows = Seq(
      (1L, "view", 100L, 1L), (1L, "click", 200L, 2L), (1L, "purchase", 300L, 3L),
      (2L, "click", 100L, 4L), (2L, "view", 200L, 5L), (2L, "purchase", 300L, 6L),
      (3L, "view", 100L, 7L), (3L, "purchase", 200L, 8L),
      (4L, "click", 100L, 9L), (4L, "view", 200L, 10L), (4L, "click", 300L, 11L),
      (4L, "purchase", 400L, 12L))
    rows.toDF("user_id", "event_type", "ts", "event_id")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$fixture/events.parquet")
    val got = Windows.funnel(spark, fixture).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Boolean]("reached_view"), r.getAs[Boolean]("reached_click"),
          r.getAs[Boolean]("reached_purchase"))))
      .toMap
    assert(got(1L) == ((true, true, true)))
    assert(got(2L) == ((true, false, false)), "out-of-order click must not count")
    assert(got(3L) == ((true, false, false)), "purchase without a click must not count")
    assert(got(4L) == ((true, true, true)), "a later in-order click rescues the funnel")
  }

  test("SCD2 point-in-time join: every purchase matched exactly once, as-of parity") {
    import graft.engine.Tables
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = graft.ops.silver.Staging.scd2PitJoin(spark, Sf).collect()
      .map(r => r.getAs[Long]("purchase_event_id") ->
        Option(r.getAs[String]("segment_at_purchase")))
    val nPurchases = Tables(spark, Sf).eventsRaw
      .filter(col("event_type") === "purchase").count()
    assert(got.length == nPurchases, "interval join must match each fact exactly once")
    assert(got.map(_._1).distinct.length == got.length)
    assert(got.exists(_._2.isDefined), "some purchases must land in a segment")
    // independent reference: the segment at a purchase is the event_type
    // of the user's latest NON-purchase event at-or-before it — an as-of
    // window over the union, computed with none of the SCD2 machinery
    val ev = Tables(spark, Sf).eventsRaw
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val asof = ev
      .withColumn("seg_now",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("seg_now"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    got.foreach { case (id, seg) =>
      assert(asof(id) == seg, s"purchase $id: PIT join says $seg, as-of reference says ${asof(id)}")
    }
  }

  test("SCD2 history: contiguous versions, abutting intervals, one open row per key") {
    val rows = graft.ops.silver.Staging.scd2Build(spark, Sf)
      .select("user_id", "version", "segment", "valid_from_ms", "valid_to_ms", "is_current")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("version"),
        r.getAs[String]("segment"),
        r.getAs[Long]("valid_from_ms"),
        if (r.isNullAt(4)) None else Some(r.getAs[Long]("valid_to_ms")),
        r.getAs[Boolean]("is_current")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (uid, hist) =>
      val h = hist.sortBy(_._2)
      assert(h.map(_._2).toSeq == (1L to h.length).toSeq, s"user $uid versions not contiguous")
      assert(h.count(_._6) == 1 && h.last._6, s"user $uid open-row count")
      h.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(a._5.contains(b._4), s"user $uid intervals must abut exactly")
        assert(a._3 != b._3, s"user $uid consecutive versions share a segment (no-op row)")
      }
      assert(h.last._5.isEmpty, s"user $uid last interval must be open")
    }
  }

  test("tx25 chunks tile every document: stride-spaced starts, full coverage, overlap W−S") {
    import graft.ops.ext.TextAnalysis.{ChunkStride, ChunkW}
    val nTok = graft.engine.Tables(spark, Sf).documents
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n"))
      .as[(Long, Int)].collect().toMap
    val chunks = graft.ops.ext.TextAnalysis.chunkOverlap(spark, Sf)
      .select("doc_id", "chunk_id", "n_chunk_tokens")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    assert(chunks.keySet == nTok.keySet, "every doc must chunk")
    chunks.foreach { case (doc, cs) =>
      val n = nTok(doc)
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until sorted.length).toSeq, "chunk_ids contiguous from 0")
      sorted.foreach { case (_, cid, len) =>
        val start = cid * ChunkStride
        assert(len == math.min(n - start, ChunkW.toLong), s"doc $doc chunk $cid length")
        assert(len > 0, s"doc $doc emitted an empty chunk")
      }
      val last = sorted.last
      assert(last._2 * ChunkStride + last._3 == n, s"doc $doc last chunk must reach the end")
      if (sorted.length > 1)
        assert(sorted.init.forall(_._3 == ChunkW), "only the trailing chunk may be short")
    }
  }

  test("tx26 tf-idf: ranks are dense, scores non-increasing, corpus-wide terms score 0") {
    val rows = graft.ops.ext.TextAnalysis.tfidfTerms(spark, Sf)
      .as[(Long, Long, String, Double)].collect()
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"doc $doc ranks not dense")
      assert(sorted.toSeq.sliding(2).forall {
        case Seq(a, b) => a._4 >= b._4
        case _ => true
      }, s"doc $doc tfidf not non-increasing")
    }
    // a term present in EVERY document has idf = ln(1) = 0 — it can top a
    // ranking only at score 0; verify tfidf of such terms is exactly 0
    val docs = graft.engine.Tables(spark, Sf).documents
    val nDocs = docs.count()
    val universal = docs
      .select(explode(array_distinct(split(trim(col("text")), "\\s+"))).as("term"), col("doc_id"))
      .groupBy("term").agg(countDistinct("doc_id").as("df"))
      .filter(col("df") === nDocs).select("term").as[String].collect().toSet
    rows.filter(r => universal(r._3)).foreach { r =>
      assert(r._4 == 0.0, s"universal term ${r._3} must score 0, got ${r._4}")
    }
  }

  test("q10 k-anonymity reports only sub-k groups; a16 cohort diagonal equals cohort size") {
    import graft.ops.gold.{Aggregates, Assertions}
    val viol = Assertions.kAnonymity(spark, Sf)
      .select("n", "n_users").as[(Long, Long)].collect()
    assert(viol.nonEmpty, "fixture should contain sub-k QI groups")
    viol.foreach { case (n, nu) =>
      assert(n < Assertions.AnonK && nu <= n, s"group ($n, $nu)")
    }
    val ret = Aggregates.retentionCohorts(spark, Sf)
      .as[(java.sql.Date, Long, Long)].collect()
    val byCohort = ret.groupBy(_._1)
    byCohort.foreach { case (c, rows) =>
      val age0 = rows.find(_._2 == 0L).map(_._3)
      assert(age0.isDefined, s"cohort $c missing its age-0 row")
      // every user is active on their first-seen day, so the age-0 count
      // IS the cohort size and upper-bounds every later age
      assert(rows.forall(_._3 <= age0.get), s"cohort $c exceeds its size")
    }
    val totalUsers = spark.read.parquet(s"$Sf/events.parquet")
      .select("user_id").distinct().count()
    assert(byCohort.values.map(_.find(_._2 == 0L).get._3).sum == totalUsers,
      "cohort sizes must partition the user base")
  }

  test("q9 key discovery returns the generator's true verdicts, including the composite negative") {
    val rows = graft.ops.gold.Assertions.keyDiscovery(spark, Sf)
      .select("candidate", "is_key", "screened", "n_distinct").collect()
    val verdicts = rows.map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(verdicts("events.event_id"))
    assert(verdicts("orders.o_orderkey"))
    assert(!verdicts("lineitem.l_orderkey"))
    assert(!verdicts("lineitem.l_orderkey+l_linenumber"),
      "this generator's lineitem is NOT (orderkey, linenumber)-unique")
    // sketch-first composition: both lineitem candidates are rejected
    // by the HLL screen (ratios ~0.25 / ~0.76, nowhere near the 0.9
    // gate), so the exact pass never rescans lineitem — their exact
    // distinct count is absent by design
    val screened = rows.map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(screened("events.event_id") && screened("orders.o_orderkey"))
    assert(!screened("lineitem.l_orderkey") &&
      !screened("lineitem.l_orderkey+l_linenumber"))
    rows.foreach { r =>
      assert(r.isNullAt(3) == !r.getBoolean(2),
        s"${r.getString(0)}: exact n_distinct present iff screened")
    }
  }

  test("gap fill: dense grid, zero bars in gaps, close carried forward") {
    import org.apache.spark.sql.functions._
    // type A trades hours 0 and 3 (gap at 1-2); type B only hour 2 —
    // the grid still spans the GLOBAL range 0..3 for both series
    val ev = Seq(
      (1L, "2024-01-01 00:15:00", "A", 10.0),
      (2L, "2024-01-01 00:45:00", "A", 12.0),
      (3L, "2024-01-01 03:30:00", "A", 7.0),
      (4L, "2024-01-01 02:10:00", "B", 5.0))
      .toDF("event_id", "ts0", "event_type", "value")
      .withColumn("ts", col("ts0").cast("timestamp")).drop("ts0")
    val out = graft.streaming.EventTime.gapFillHourlyOf(ev)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // 4 hours x 2 series, no hole in the grid
    assert(out.length == 8)
    val byKey = out.map(t => (t._1, t._2) -> (t._3, t._4, t._5)).toMap
    val h0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def h(i: Int): Long = h0 + i * 3600000L
    // A: bar at h0 (close = max-event_id value 12.0), zero bars at
    // h1/h2 carrying 12.0 forward, trade again at h3
    assert(byKey(("A", h(0))) == ((2L, 22.0, 12.0)))
    assert(byKey(("A", h(1))) == ((0L, 0.0, 12.0)))
    assert(byKey(("A", h(2))) == ((0L, 0.0, 12.0)))
    assert(byKey(("A", h(3))) == ((1L, 7.0, 7.0)))
    // B: zero bars BEFORE its first trade fill 0.0, not a foreign close
    assert(byKey(("B", h(0))) == ((0L, 0.0, 0.0)))
    assert(byKey(("B", h(1))) == ((0L, 0.0, 0.0)))
    assert(byKey(("B", h(2))) == ((1L, 5.0, 5.0)))
    assert(byKey(("B", h(3))) == ((0L, 0.0, 5.0)))
  }

  test("gap fill SQL twin answers like the API path; guards fire loudly") {
    import org.apache.spark.sql.functions._
    import graft.ops.lake.Snapshots
    val ev = Seq(
      (1L, "2024-01-01 00:15:00", "A", 10.0),
      (2L, "2024-01-01 00:45:00", "A", 12.0),
      (3L, "2024-01-01 03:30:00", "A", 7.0),
      (4L, "2024-01-01 02:10:00", "B", 5.0))
      .toDF("event_id", "ts0", "event_type", "value")
      .withColumn("ts", col("ts0").cast("timestamp")).drop("ts0")
    val t = tmp("gapfill-sql")
    Snapshots.commit(t, Snapshots.stage(
      ev.withColumn("day", lit("d")), t, "day"))
    graft.sql.LakeSql.register(spark, "gfspec_ev", t, "day")
    val sqlRows = spark.sql(
      "SELECT * FROM gap_fill('gfspec_ev', 'ts', 'event_type', " +
        "'value', 'event_id')")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    val api = graft.streaming.EventTime
      .gapFill(ev, "ts", "event_type", "value", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(sqlRows == api, "the TVF must answer like the API path")
    assert(sqlRows.size == 8)
    val e1 = intercept[Exception](spark.sql(
      "SELECT * FROM gap_fill('nope', 'ts', 'event_type', 'value', 'event_id')")
      .collect())
    assert(e1.getMessage.contains("registered graft table"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM gap_fill('gfspec_ev', 'ts')").collect())
    assert(e2.getMessage.contains("gap_fill expects"), e2.getMessage)
    val e3 = intercept[Exception](spark.sql(
      "SELECT * FROM gap_fill('gfspec_ev', 'ts', 'nope', 'value', 'event_id')")
      .collect())
    assert(e3.getMessage.contains("no column 'nope'"), e3.getMessage)
    // a series column named like a rewrite output is rejected up front
    val e4 = intercept[IllegalArgumentException] {
      graft.streaming.EventTime.gapFill(
        ev.withColumnRenamed("event_type", "close"),
        "ts", "close", "value", "event_id")
    }
    assert(e4.getMessage.contains("reserved"), e4.getMessage)
  }

  test("gap fill keeps a NULL series whole (null-safe grid join)") {
    import org.apache.spark.sql.functions._
    // the NULL series trades at hour 1; an equi-join would never match
    // it back from the grid and its bars would read all-zero (r15
    // review find)
    val ev = Seq(
      (1L, "2024-01-01 00:15:00", Option("A"), 10.0),
      (2L, "2024-01-01 01:20:00", Option.empty[String], 3.0),
      (3L, "2024-01-01 01:40:00", Option.empty[String], 4.0))
      .toDF("event_id", "ts0", "event_type", "value")
      .withColumn("ts", col("ts0").cast("timestamp")).drop("ts0")
    val out = graft.streaming.EventTime
      .gapFill(ev, "ts", "event_type", "value", "event_id")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.length == 4, s"2 hours x 2 series (incl. NULL): $out")
    val h0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val byKey = out.map(t => (t._1, t._2) -> (t._3, t._4, t._5)).toMap
    assert(byKey((None, h0)) == ((0L, 0.0, 0.0)))
    assert(byKey((None, h0 + 3600000L)) == ((2L, 7.0, 4.0)),
      "the NULL series' real bars must survive the grid join")
    assert(byKey((Some("A"), h0)) == ((1L, 10.0, 10.0)))
    assert(byKey((Some("A"), h0 + 3600000L)) == ((0L, 0.0, 10.0)))
  }

  test("ohlcv bars: open/close deterministic on timestamp ties via event_id") {
    import org.apache.spark.sql.functions._
    // three trades in one bar; the first TWO share a timestamp — the
    // tuple (ts, event_id) must decide open (lowest id at min ts) and
    // a same-instant close tie would pick the greatest id
    val ev = Seq(
      (2L, "2024-01-01 10:00:00", "A", 5.0), // same instant, higher id
      (1L, "2024-01-01 10:00:00", "A", 9.0), // same instant, lower id -> open
      (3L, "2024-01-01 10:30:00", "A", 7.0)  // latest -> close
    ).toDF("event_id", "ts0", "event_type", "value")
      .withColumn("ts", col("ts0").cast("timestamp")).drop("ts0")
    val r = graft.streaming.EventTime.ohlcvBarsOf(ev).collect().head
    assert(r.getString(0) == "A")
    assert(r.getDouble(2) == 9.0, "open = value of (min ts, min id)")
    assert(r.getDouble(3) == 9.0 && r.getDouble(4) == 5.0, "high/low")
    assert(r.getDouble(5) == 7.0, "close = value of (max ts, max id)")
    assert(r.getDouble(6) == 21.0 && r.getLong(7) == 3L)
    // a pure same-instant bar: close picks the GREATEST id
    val tie = graft.streaming.EventTime.ohlcvBarsOf(
        ev.filter(col("event_id") < 3L)).collect().head
    assert(tie.getDouble(2) == 9.0 && tie.getDouble(5) == 5.0,
      "same-instant open/close break on event_id, never arbitrarily")
  }

  test("gap fill grain: day grid steps by calendar days, bad grains loud") {
    import org.apache.spark.sql.functions._
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", "A", 10.0),
      (2L, "2024-01-03 09:00:00", "A", 7.0))
      .toDF("event_id", "ts0", "event_type", "value")
      .withColumn("ts", col("ts0").cast("timestamp")).drop("ts0")
    val out = graft.streaming.EventTime
      .gapFill(ev, "ts", "event_type", "value", "event_id", grain = "day")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.map(_._1).forall(_ == "A") && out.length == 3,
      s"3 calendar days: $out")
    // the bar column names itself after the grain
    assert(graft.streaming.EventTime
      .gapFill(ev, "ts", "event_type", "value", "event_id", grain = "day")
      .columns.toSeq ==
      Seq("event_type", "day_start_ms", "n", "sum_value", "close_ffill"))
    val d0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val byDay = out.map(t => t._2 -> (t._3, t._4, t._5)).toMap
    assert(byDay(d0) == ((1L, 10.0, 10.0)))
    assert(byDay(d0 + 86400000L) == ((0L, 0.0, 10.0)), "gap day carries close")
    assert(byDay(d0 + 2 * 86400000L) == ((1L, 7.0, 7.0)))
    val e = intercept[IllegalArgumentException] {
      graft.streaming.EventTime.gapFill(
        ev, "ts", "event_type", "value", "event_id", grain = "fortnight")
    }
    assert(e.getMessage.contains("minute/hour/day/week/month"), e.getMessage)
    // the minute grain rides the day-chunked grid (no whole-span array)
    // and must cross day boundaries seamlessly: 23:58 -> 00:01 = 4 bars
    val evM = Seq(
      (1L, "2024-01-01 23:58:30", "A", 1.0),
      (2L, "2024-01-02 00:01:10", "A", 2.0))
      .toDF("event_id", "ts0", "event_type", "value")
      .withColumn("ts", col("ts0").cast("timestamp")).drop("ts0")
    val mins = graft.streaming.EventTime
      .gapFill(evM, "ts", "event_type", "value", "event_id", grain = "minute")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(mins.length == 4, s"4 minute bars across midnight: ${mins.toSeq}")
    val m0 = java.sql.Timestamp.valueOf("2024-01-01 23:58:00").getTime
    assert(mins.map(_._1).toSeq == Seq(m0, m0 + 60000L, m0 + 120000L, m0 + 180000L))
    assert(mins.map(_._2).toSeq == Seq(1L, 0L, 0L, 1L))
    assert(mins.map(_._3).toSeq == Seq(1.0, 1.0, 1.0, 2.0), "close carries over midnight")
  }

  test("asOfBroadcast ≡ asOfBy on randomized fixtures (property)") {
    import org.apache.spark.sql.functions._
    // the two rewrites share one resolver but entirely different
    // execution shapes (keyed window scan vs broadcast array probe) —
    // random small fixtures with NULL keys/timestamps, same-instant
    // ties, and unmatched keys must agree row-for-row in every
    // direction, with and without a tolerance (r16)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val keyGen = Gen.oneOf(Some("u1"), Some("u2"), Some("u3"), None)
    // coarse minute grid => frequent exact ties, the hard case
    val tsGen = Gen.oneOf(
      Gen.choose(0, 10).map(m => Some(new java.sql.Timestamp(base + m * 60000L))),
      Gen.const(Option.empty[java.sql.Timestamp]))
    val leftGen = Gen.listOfN(8, Gen.zip(keyGen, tsGen))
    val rightGen = Gen.listOfN(10, Gen.zip(keyGen, tsGen,
      Gen.oneOf(Some("a"), Some("b"), None)))
    (0 until 12).foreach { seed =>
      val lRows = leftGen.apply(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(Nil).zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
      val rRows = rightGen.apply(Gen.Parameters.default, Seed(1000L + seed))
        .getOrElse(Nil).zipWithIndex
        .map { case ((k, t, v), i) => (k, t, i.toLong, v) }
      if (lRows.nonEmpty && rRows.nonEmpty) {
        val l = lRows.toDF("lid", "user", "lts")
        val r = rRows.toDF("user", "rts", "rid", "rv")
        for {
          dir <- Seq("backward", "forward", "nearest")
          tol <- Seq(None, Some(3L * 60000L))
        } {
          def rows(df: org.apache.spark.sql.DataFrame) = df
            .select(col("lid"), col("rid"), col("rv"))
            .as[(Long, Option[Long], Option[String])]
            .collect().sortBy(_._1).toSeq
          val a = rows(graft.ops.gold.Joins.asOfBy(l, r, Seq("user"),
            "lts", "rts", "rid", toleranceMs = tol, direction = dir))
          val b = rows(graft.ops.gold.Joins.asOfBroadcast(l, r, Seq("user"),
            "lts", "rts", "rid", toleranceMs = tol, direction = dir))
          assert(a == b, s"seed=$seed dir=$dir tol=$tol:\n  stream=$a\n  bcast=$b")
        }
      }
    }
  }

  test("gap fill rejects DST-observing session timezones (r15 advisor)") {
    import org.apache.spark.sql.functions._
    // the dense grid's day-chunked minute expansion assumes 1440-minute
    // days; on a DST zone a spring-forward day would duplicate grid
    // rows and a fall-back day would drop its repeated hour — the
    // operator must refuse rather than silently fabricate/drop bars
    val ev = Seq((1L, "2024-03-10 01:30:00", "A", 1.0))
      .toDF("event_id", "ts0", "event_type", "value")
      .withColumn("ts", col("ts0").cast("timestamp")).drop("ts0")
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      val e = intercept[IllegalArgumentException] {
        graft.streaming.EventTime.gapFill(
          ev, "ts", "event_type", "value", "event_id", grain = "minute")
      }
      assert(e.getMessage.contains("fixed-offset"), e.getMessage)
      // fixed-offset zones other than UTC stay allowed: every day is
      // 1440 minutes there too
      spark.conf.set(tzKey, "UTC+05:30")
      assert(graft.streaming.EventTime.gapFill(
        ev, "ts", "event_type", "value", "event_id").collect().nonEmpty)
      // Spark resolves three-letter ids via ZoneId.SHORT_IDS: "EST" is
      // a fixed -05:00 — the guard must grade it, not crash on it
      // (r16 review find)
      spark.conf.set(tzKey, "EST")
      assert(graft.streaming.EventTime.gapFill(
        ev, "ts", "event_type", "value", "event_id").collect().nonEmpty)
    } finally spark.conf.set(tzKey, saved)
  }
}
