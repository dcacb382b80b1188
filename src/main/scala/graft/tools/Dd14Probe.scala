package graft.tools
import graft.engine.{Caching, Graft, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for dd14 (r18, VERDICT #6): times the containment
  * pipeline's pieces — shingle cache build, the shingle-occurrence
  * hash/df table, the per-doc sorted-array aggregate, the prefix
  * candidate join, and the verify join-back — so the optimization
  * targets the measured stage, not a guess. Rebuilds the same frames
  * as [[graft.ops.ext.Dedup.containmentPairsOf]] stage by stage.
  * Usage: `runMain graft.tools.Dd14Probe [sfDir]`. */
object Dd14Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.configure(SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.ext.Dedup._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dd14probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 2) Caching.scoped {
      println(s"--- pass $round (${if (round == 1) "cold" else "warm"}) ---")
      // the same shingle frame shape containmentPairs consumes (the
      // shared shingleTable is object-private; this rebuilds its plan)
      val sh = Caching.persist(
        Tables(spark, dir).documents
          .withColumn("w", split(trim(col("text")), "\\s+"))
          .filter(size(col("w")) >= 3)
          .withColumn("sh", expr(shingleExpr))
          .select("doc_id", "sh"))
      time("shingle cache build")(sh.queryExecution.toRdd.count())
      val occ = sh.select(col("doc_id"), explode(col("sh")).as("g"))
        .select(col("doc_id"), expr(graft.engine.PortableHash.md5Prefix60("g")).as("h"))
      time("occ explode+md5 (noop)")(occ.queryExecution.toRdd.count())
      val dfreq = occ.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") <= ContainDfCap)
      time("dfreq agg (noop)")(dfreq.queryExecution.toRdd.count())
      val surv = occ.join(dfreq, "h").select("doc_id", "h", "df")
      time("surv join (noop)")(surv.queryExecution.toRdd.count())
      val arr = Caching.persist(surv.groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("dh"),
          count(lit(1)).as("n"))
        .withColumn("plen",
          col("n") - expr(s"(n * $ContainTNum + ${ContainTDen - 1}) div $ContainTDen") + 1)
        .select(col("doc_id"), col("n"),
          expr("transform(slice(dh, 1, int(plen)), x -> x.h)").as("pre"),
          sort_array(expr("transform(dh, x -> x.h)")).as("hs")))
      time("arr cache build")(arr.queryExecution.toRdd.count())
      val cand = arr.select(col("doc_id").as("p_doc"), explode(col("pre")).as("h"))
        .join(arr.select(col("doc_id").as("s_doc"), explode(col("hs")).as("h")),
          Seq("h"))
        .filter(col("p_doc") =!= col("s_doc"))
        .select(least(col("p_doc"), col("s_doc")).as("doc_a"),
          greatest(col("p_doc"), col("s_doc")).as("doc_b"))
        .dropDuplicates("doc_a", "doc_b")
      time("cand prefix join (noop)")(cand.queryExecution.toRdd.count())
      val full = arr.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"), col("n").as("n_a"))
        .join(cand, Seq("doc_a"))
        .join(arr.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"), col("n").as("n_b")),
          Seq("doc_b"))
        .withColumn("n_common", size(array_intersect(col("hs_a"), col("hs_b"))).cast("bigint"))
        .filter(col("n_common") * ContainTDen >= col("n_a") * ContainTNum ||
          col("n_common") * ContainTDen >= col("n_b") * ContainTNum)
      time("verify join-back (noop)")(full.queryExecution.toRdd.count())
      time("full query fresh")(graft.SparkEntry.queries("dd14_containment")(spark, dir)
        .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}

/** One-off cardinality stats for dd14's candidate/verify stages. */
object Dd14Stats {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.configure(SparkSession.builder().master(s"local[${Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.ext.Dedup._
    Caching.scoped {
      val sh = Caching.persist(
        Tables(spark, dir).documents
          .withColumn("w", split(trim(col("text")), "\\s+"))
          .filter(size(col("w")) >= 3)
          .withColumn("sh", expr(shingleExpr))
          .select("doc_id", "sh"))
      val occ = sh.select(col("doc_id"), explode(col("sh")).as("g"))
        .select(col("doc_id"), expr(graft.engine.PortableHash.md5Prefix60("g")).as("h"))
      val dfreq = occ.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") <= ContainDfCap)
      val surv = occ.join(dfreq, "h").select("doc_id", "h", "df")
      val arr = Caching.persist(surv.groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("dh"),
          count(lit(1)).as("n"))
        .withColumn("plen",
          col("n") - expr(s"(n * $ContainTNum + ${ContainTDen - 1}) div $ContainTDen") + 1)
        .select(col("doc_id"), col("n"),
          expr("transform(slice(dh, 1, int(plen)), x -> x.h)").as("pre"),
          sort_array(expr("transform(dh, x -> x.h)")).as("hs")))
      println("[dd14stats] docs=" + arr.count())
      arr.select(avg("n").as("avg_hs"), max("n").as("max_hs"),
        avg(expr("size(pre)")).as("avg_pre")).show()
      val candRaw = arr.select(col("doc_id").as("p_doc"), explode(col("pre")).as("h"))
        .join(arr.select(col("doc_id").as("s_doc"), explode(col("hs")).as("h")), Seq("h"))
        .filter(col("p_doc") =!= col("s_doc"))
      println("[dd14stats] cand raw=" + candRaw.count())
      val cand = candRaw
        .select(least(col("p_doc"), col("s_doc")).as("doc_a"),
          greatest(col("p_doc"), col("s_doc")).as("doc_b"))
        .dropDuplicates("doc_a", "doc_b")
      println("[dd14stats] cand distinct=" + cand.count())
    }
    spark.stop()
  }
}
