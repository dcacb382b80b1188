package graft.ops.silver

import graft.engine.{Exact, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** A4 last-write-wins as a typed `Aggregator` over a `Dataset[TradeEv]` —
  * the type-safe form of the MERGE-keep-latest semantics (same result as
  * Staging.dedupLww, same oracle). The aggregator's merge is associative
  * and commutative, so Catalyst runs it as partial + final aggregation:
  * one row per (key, partition) crosses the exchange — the property that
  * matters at 100 TB.
  */
object TypedDedup {

  final case class TradeEv(
      event_id: Long, ts_us: Long, user_id: Long,
      event_type: String, value: Double)

  /** Keep the event with the greatest (ts_us, event_id). */
  object LastWriteWins extends Aggregator[TradeEv, TradeEv, TradeEv] {
    private val sentinel = TradeEv(Long.MinValue, Long.MinValue, 0L, "", 0.0)
    override def zero: TradeEv = sentinel
    private def later(a: TradeEv, b: TradeEv): TradeEv =
      if (a.ts_us > b.ts_us || (a.ts_us == b.ts_us && a.event_id >= b.event_id)) a else b
    override def reduce(b: TradeEv, e: TradeEv): TradeEv = later(b, e)
    override def merge(a: TradeEv, b: TradeEv): TradeEv = later(a, b)
    override def finish(r: TradeEv): TradeEv = r
    override def bufferEncoder: Encoder[TradeEv] = Encoders.product[TradeEv]
    override def outputEncoder: Encoder[TradeEv] = Encoders.product[TradeEv]
  }

  def dedupTyped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds = Tables(spark, dir).events
      .select(
        col("event_id"), Exact.epochUs(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .as[TradeEv]
    ds.groupByKey(e => (e.user_id, e.event_type))
      .agg(LastWriteWins.toColumn.name("last"))
      .map { case (_, last) => last }
      .toDF()
      .select(col("user_id"), col("event_type"),
        col("event_id").as("last_event_id"), col("value").as("last_value"))
      .orderBy("user_id", "event_type")
  }

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("a4_dedup_typed", Staging.dedupLwwOracle)(dedupTyped))
}
