package graft.tools

import graft.engine.Graft
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Derives a 10× scale fixture (≈ sf1) from the driver's sf0.1 tables
  * for the LOCAL scale sweep (BENCH_NOTES) — the driver ships
  * sf{0.001,0.01,0.1} only, and the sweep's red flag (super-linear
  * growth) needs one more decade to be decidable.
  *
  * Replication is KEY-SHIFTED so the derived corpus scales the way a
  * real one grows — by new content, not by duplicating old content:
  *   - every key column shifts by `replica × 10^ceil(log10(max+1))`,
  *     so replicas are disjoint (graphs become 10 disconnected copies:
  *     triangles/wedges/components scale exactly linearly, which is
  *     the property the sweep checks);
  *   - document TEXT gets a per-replica token suffix — without it,
  *     every replica pair would be a cross-replica near-dup and the
  *     dedup ops would benchmark a 100× pair-density pathology instead
  *     of 10× data (the r5 supplier-graph lesson, generalized).
  *
  * Each table lands as ONE file named `<table>.parquet`, matching the
  * driver fixture layout (the streaming benches glob exactly that
  * name). Output goes under target/ — derived, never committed.
  */
object ScaleUp {

  /** Replication factor (3rd CLI arg overrides; 10 ⇒ sf1 from sf0.1,
    * 20 ⇒ sf2 — the third point of a scaling curve). */
  var K = 10

  private def shift(c: String, off: Long, k: Int) = (col(c) + lit(off * k)).as(c)

  /** Smallest power of 10 above the column's max — keeps shifted ids
    * compact so downstream id-space offsets (pr1's +10^9 supplier
    * offset) stay collision-free. */
  private def offsetFor(df: DataFrame, c: String): Long = {
    val mx = df.agg(max(col(c).cast("long"))).head().getLong(0)
    var p = 1L
    while (p <= mx) p *= 10
    p
  }

  /** Shift each replica's keys by the EXPLICIT per-column offsets. The
    * offset for an FK/PK pair must be ONE value computed from the
    * referenced table (see [[main]]): deriving it per table from that
    * table's own max silently breaks referential integrity whenever the
    * pair's maxima straddle a power-of-10 boundary (max o_custkey
    * 99_999 → offset 10^5 vs max c_custkey 100_000 → offset 10^6 would
    * point every replica's orders at customers that don't exist). */
  private def replicate(df: DataFrame, offs: Map[String, Long],
                        extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
    (0 until K).map { k =>
      val shifted = df.select(df.columns.toSeq.map { c =>
        if (offs.contains(c)) shift(c, offs(c), k) else col(c)
      }: _*)
      extra(shifted, k)
    }.reduce(_ unionByName _)

  /** Self-keyed tables (no cross-table references): offsets from the
    * table's own columns. */
  private def replicateSelf(df: DataFrame, keys: Seq[String],
                            extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
    replicate(df, keys.map(c => c -> offsetFor(df, c)).toMap, extra)

  /** Write as a single file named `<name>.parquet` (driver layout). */
  private def writeOne(df: DataFrame, outDir: String, name: String): Unit = {
    val staging = s"$outDir/.stage-$name"
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no parquet part for $name"))
    val dst = new java.io.File(outDir, s"$name.parquet")
    dst.delete()
    java.nio.file.Files.move(part.toPath, dst.toPath)
    new java.io.File(staging).listFiles().foreach(_.delete())
    new java.io.File(staging).delete()
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/testdata-sf1")
    args.lift(2).foreach(k => K = k.toInt)
    new java.io.File(out).mkdirs()
    val spark = Graft.configure(
      SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def rd(t: String) = spark.read.parquet(s"$src/$t.parquet")

    // ONE offset per KEY DOMAIN, computed from the REFERENCED (PK)
    // table and reused by every referencing column — FK values are a
    // subset of the PK domain, so the PK table's max bounds both sides
    // and all replicas shift consistently (see [[replicate]]).
    val domain = Map(
      "orderkey" -> offsetFor(rd("orders"), "o_orderkey"),
      "custkey" -> offsetFor(rd("customer"), "c_custkey"),
      "partkey" -> offsetFor(rd("part"), "p_partkey"),
      "suppkey" -> offsetFor(rd("supplier"), "s_suppkey"))
    writeOne(replicate(rd("lineitem"), Map(
      "l_orderkey" -> domain("orderkey"),
      "l_partkey" -> domain("partkey"),
      "l_suppkey" -> domain("suppkey"))), out, "lineitem")
    writeOne(replicate(rd("orders"), Map(
      "o_orderkey" -> domain("orderkey"),
      "o_custkey" -> domain("custkey"))), out, "orders")
    writeOne(replicate(rd("customer"), Map("c_custkey" -> domain("custkey"))),
      out, "customer")
    writeOne(replicate(rd("supplier"), Map("s_suppkey" -> domain("suppkey"))),
      out, "supplier")
    writeOne(replicate(rd("part"), Map("p_partkey" -> domain("partkey"))), out, "part")
    // events: raw int64-nanos ts rides through untouched; user space
    // scales with the corpus so per-key streaming state scales too
    writeOne(replicateSelf(rd("events"), Seq("event_id", "user_id")), out, "events")
    // documents: per-replica token suffix — replicas must NOT collide
    // in n-gram/fingerprint space (see scaladoc)
    writeOne(replicateSelf(rd("documents"), Seq("doc_id"),
      extra = (d, k) => d.withColumn("text",
        regexp_replace(col("text"), "(\\S+)", "$1r" + k))), out, "documents")
    // embeddings: vec_id/label shift + per-replica CIRCULAR COMPONENT
    // ROTATION — an orthogonal transform, so within-replica geometry
    // (distances, cosines, planted near-dups) is preserved exactly
    // while cross-replica vectors decorrelate: no planted cross-replica
    // dup pairs, the same pathology rule as the document suffixes.
    // Replica 0 is untouched, so the ann centroid/query conventions
    // (vec_id < 16 / < 10) keep their original vectors.
    writeOne(replicateSelf(rd("embeddings"), Seq("vec_id", "label"),
      extra = (d, k) =>
        if (k == 0) d
        else d.withColumn("embedding", expr(
          s"concat(slice(embedding, ${k + 1}, size(embedding) - $k), " +
            s"slice(embedding, 1, $k))"))), out, "embeddings")
    // small dims pass through unchanged
    Seq("nation", "region").foreach(t => writeOne(rd(t), out, t))
    spark.stop()
    println(s"[scaleup] wrote ${K}x fixture from $src to $out")
  }
}
