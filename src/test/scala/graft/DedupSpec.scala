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
}
