package graft.tools
import graft.engine.{Caching, Graft, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for pr2's closing-edge probe (r18, guide §3.2): the
  * wedge stream is the kernel's largest intermediate (410M rows at sf1)
  * and most wedges do NOT close into a triangle — a Bloom filter over
  * the oriented edge keys applied BEFORE the wedge exchange drops the
  * non-closing majority at generation time, so the shuffle_hash join
  * shuffles survivors only. No false negatives ⇒ identical results.
  * Interleaved baseline/bloom pairs in one JVM; only warm pairs are the
  * controlled comparison. Usage: runMain graft.tools.Pr2BloomProbe [sfDir] [n]
  */
object Pr2BloomProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Graft.configure(SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Long): Long = {
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[pr2bloom] $label: $dt%.2f s (n=$r)"); r
    }
    def timeD(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[pr2bloom] $label: $dt%.2f s (n=$r)"); dt
    }

    // stage split first (one scoped run, cache retained inside)
    Caching.scoped {
      val edges = graft.ops.ext.GraphRank.coPurchaseEdges(Tables(spark, dir))
      val e = Caching.persist(edges)
      time("edges count")(e.count())
      val deg = e.select(col("u").as("n")).unionByName(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      val uFirst = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val oriented = Caching.persist(e
        .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
        .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
        .select(
          when(uFirst, col("u")).otherwise(col("v")).as("x"),
          when(uFirst, col("v")).otherwise(col("u")).as("y"),
          when(uFirst, col("dv")).otherwise(col("du")).as("dy"))
        .repartition(col("x")))
      time("oriented build+count")(oriented.count())
      val o1 = oriented.select(col("x"), col("y").as("y1"), col("dy").as("dy1"))
      val o2 = oriented.select(col("x"), col("y").as("y2"), col("dy").as("dy2"))
      val wedges = o1.join(o2, Seq("x")).filter(
        col("dy1") < col("dy2") || (col("dy1") === col("dy2") && col("y1") < col("y2")))
        .select("x", "y1", "y2")
      val nw = time("wedges count (cached oriented)")(wedges.count())
      val closing = oriented.select(col("x").as("y1"), col("y").as("y2")).hint("shuffle_hash")
      val tri = wedges.join(closing, Seq("y1", "y2"))
      val nt = time("closed wedges (tri) count")(tri.count())
      println(f"[pr2bloom] selectivity: $nt of $nw wedges close (${100.0 * nt / math.max(1, nw)}%.2f%%)")
      // bloom variant inside the same cache scope: marginal cost of the
      // filter build + the filtered join, cache already warm
      val ne = oriented.count()
      val tB0 = System.nanoTime()
      val bf = oriented.select(xxhash64(col("x"), col("y")).as("h"))
        .stat.bloomFilter("h", ne, 0.01)
      println(f"[pr2bloom] bloom build: ${(System.nanoTime() - tB0) / 1e9}%.2f s (bits=${bf.bitSize()})")
      val bfB = spark.sparkContext.broadcast(bf)
      val might = udf((h: Long) => bfB.value.mightContainLong(h))
      val wedgesF = wedges.filter(might(xxhash64(col("y1"), col("y2"))))
      val nwf = time("wedges surviving bloom")(wedgesF.count())
      println(f"[pr2bloom] bloom keeps $nwf of $nw (${100.0 * nwf / math.max(1, nw)}%.2f%%)")
      time("closing join baseline (warm cache)")(tri.count())
      time("closing join bloomed  (warm cache)")(wedgesF.join(closing, Seq("y1", "y2")).count())
      0L
    }

    // full-query interleaved A/B, fresh cache scope per run. The BLOOM
    // arm is the PRODUCTION path (GraphRank.triangles carries the filter
    // since r18); the baseline arm inlines the pre-r18 unfiltered form.
    def fullBloom(): Long = Caching.scoped {
      graft.ops.ext.GraphRank.triangles(spark, dir).queryExecution.toRdd.count()
    }
    def fullBaseline(): Long = Caching.scoped {
      val edges = graft.ops.ext.GraphRank.coPurchaseEdges(Tables(spark, dir))
      val e = Caching.persist(edges)
      val deg = e.select(col("u").as("n")).unionByName(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      val uFirst = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val oriented = Caching.persist(e
        .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
        .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
        .select(
          when(uFirst, col("u")).otherwise(col("v")).as("x"),
          when(uFirst, col("v")).otherwise(col("u")).as("y"),
          when(uFirst, col("dv")).otherwise(col("du")).as("dy"))
        .repartition(col("x")))
      val o1 = oriented.select(col("x"), col("y").as("y1"), col("dy").as("dy1"))
      val o2 = oriented.select(col("x"), col("y").as("y2"), col("dy").as("dy2"))
      val wedges = o1.join(o2, Seq("x")).filter(
        col("dy1") < col("dy2") || (col("dy1") === col("dy2") && col("y1") < col("y2")))
        .select("x", "y1", "y2")
      val tri = wedges.join(
        oriented.select(col("x").as("y1"), col("y").as("y2")).hint("shuffle_hash"),
        Seq("y1", "y2"))
        .select(col("x").as("a"), col("y1").as("b"), col("y2").as("c"))
      tri.select(explode(array(col("a"), col("b"), col("c"))).as("node_id"))
        .groupBy("node_id").agg(count(lit(1)).as("n_triangles"))
        .orderBy("node_id").queryExecution.toRdd.count()
    }
    // interleave: B A B A ... so ambient drift hits both arms
    val base = Array.fill(n)(0.0); val bloom = Array.fill(n)(0.0)
    for (i <- 0 until n) {
      bloom(i) = timeD(s"FULL bloom    #$i")(fullBloom())
      base(i) = timeD(s"FULL baseline #$i")(fullBaseline())
    }
    def med(a: Array[Double]) = a.sorted.apply(a.length / 2)
    println(f"[pr2bloom] medians: baseline ${med(base)}%.2f s vs bloom ${med(bloom)}%.2f s")
    spark.stop()
  }
}
