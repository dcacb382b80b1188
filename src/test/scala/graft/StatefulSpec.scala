package graft

import graft.streaming.{Pipelines, StatefulSessions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatefulSpec extends AnyFunSuite with SparkFixture {

  test("flatMapGroupsWithState sessionization matches batch islands") {
    val out = StatefulSessions.sessionStream(spark, Pipelines.eventsStream(spark, Sf))
    val q = out.writeStream.format("memory").queryName("fmgws_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("fmgws_out")
      .select("user_id", "session_start_us", "n")

    // batch ground truth: gaps-and-islands with the same 30-min gap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us")
    val batchRaw = spark.read.parquet(s"$Sf/events.parquet")
    val batch = batchRaw
      .select(col("user_id"),
        graft.engine.Tables.tsUs(batchRaw).as("ts_us"), col("value"))
      .withColumn("prev", lag(col("ts_us"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("ts_us") >= col("prev") + StatefulSessions.GapUs, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min(col("ts_us")).as("session_start_us"), count(lit(1)).as("n"))
      .select("user_id", "session_start_us", "n")

    // every emitted session must be a true island; with AvailableNow the
    // final open sessions may not flush, so streamed ⊆ batch and covers
    // most of it
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty,
      "stream emitted a session not present in batch ground truth")
    val coverage = streamed.count().toDouble / batch.count()
    info(s"session coverage: $coverage")
    assert(coverage > 0.8, s"coverage $coverage")
  }

  test("transformWithState running totals match batch aggregation") {
    // ISOLATED session: the RocksDB provider class is read at query
    // start, so a global window would flip the state store under every
    // concurrently-starting streaming spec (r14 flake find)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val out = graft.streaming.StatefulTotals.totalsStream(
      s2, Pipelines.eventsStream(s2, Sf))
    val q = out.writeStream.format("memory").queryName("tws_out")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // update mode emits one row per touched key per micro-batch; the
    // final totals are the row with the highest n per user
    val finals = s2.table("tws_out")
      .groupBy("user_id").agg(max_by(struct(col("n"), col("sum_value")), col("n")).as("t"))
      .select(col("user_id"), col("t.n").as("n"), col("t.sum_value").as("sum_value"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val batch = s2.read.parquet(s"$Sf/events.parquet")
      .groupBy("user_id").agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(finals.keySet == batch.keySet)
    finals.foreach { case (u, (n, s)) =>
      assert(n == batch(u)._1, s"user $u count $n vs ${batch(u)._1}")
      assert(math.abs(s - batch(u)._2) < 1e-6, s"user $u sum $s vs ${batch(u)._2}")
    }
  }
}
