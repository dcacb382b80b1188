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
    val batch = spark.read.parquet(s"$Sf/events.parquet")
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("value"))
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
}
