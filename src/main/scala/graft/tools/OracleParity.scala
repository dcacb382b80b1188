package graft.tools

import org.apache.spark.sql.SparkSession

/** Builder-side oracle parity probe: run a named SparkEntry query AND
  * its declared oracle SQL — both through Spark, the oracle against
  * temp views over the same parquet tables — and diff the collected,
  * column-sorted results. Approximates the driver's DuckDB gate for
  * dialect-shared SQL (every oracle in this repo is ANSI by contract),
  * so a new query's restatement can be validated before the round's
  * driver run instead of discovered broken in CORRECTNESS_r{N}.json.
  *
  * Usage: runMain graft.tools.OracleParity <sfDir> <query> [query…] */
object OracleParity {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = graft.engine.Graft.configure(
      SparkSession.builder().master(s"local[${graft.engine.Graft.cpus}]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tableNames = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tableNames.foreach { t =>
      val f = new java.io.File(s"$sfDir/$t.parquet")
      if (f.exists()) spark.read.parquet(f.getPath).createOrReplaceTempView(t)
    }
    var failed = 0
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val oracle = graft.SparkEntry.oracleSql.get(name)
      val got = graft.engine.Caching.scoped { fn(spark, sfDir) }
      oracle match {
        case None => println(s"[parity] $name: no oracle (rows-only), " +
          s"rows=${got.count()}")
        case Some(sql) =>
          // the driver sorts columns BY NAME before hashing — mirror that
          val g = got.select(got.columns.sorted.map(org.apache.spark.sql.functions.col): _*)
          val o0 = spark.sql(sql)
          val o = o0.select(o0.columns.sorted.map(org.apache.spark.sql.functions.col): _*)
          val (gs, os) = (g.collect().map(_.toString).sorted.toSeq,
                          o.collect().map(_.toString).sorted.toSeq)
          val schemaOk = g.columns.toSeq == o.columns.toSeq
          if (gs == os && schemaOk) println(s"[parity] $name: OK (${gs.size} rows)")
          else {
            failed += 1
            println(s"[parity] $name: MISMATCH rows ${gs.size} vs ${os.size} " +
              s"schema $schemaOk (${g.columns.mkString(",")} vs ${o.columns.mkString(",")})")
            gs.diff(os).take(3).foreach(r => println(s"  spark-only: $r"))
            os.diff(gs).take(3).foreach(r => println(s"  oracle-only: $r"))
          }
      }
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
