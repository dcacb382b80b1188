package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Spark 4 `transformWithState` — the successor API to
  * `flatMapGroupsWithState` (which [[StatefulSessions]] exercises):
  * typed named state handles backed by the RocksDB state store, per-key
  * timers, TTL on state. Demonstrated as per-user running totals — the
  * canonical "lifetime counters" shape (feature-store style) where state
  * must live forever but stay O(1) per key, which is exactly what the
  * ValueState handle gives: each micro-batch reads/writes one row per
  * touched key; untouched keys cost nothing.
  *
  * Requires `spark.sql.streaming.stateStore.providerClass =
  * RocksDBStateStoreProvider` (transformWithState is RocksDB-only) —
  * which Graft.configure now sets as the session default for ALL
  * stateful streaming (heap-resident state is the first OOM at
  * 100 TB/day; RocksDB is disk-backed with bounded memtables). */
object StatefulTotals {

  final case class Ev(user_id: Long, value: Double)
  final case class Totals(user_id: Long, n: Long, sum_value: Double)

  class RunningTotals extends StatefulProcessor[Long, Ev, Totals] {
    @transient private var state: ValueState[Totals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Totals](
        "totals", Encoders.product[Totals], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Ev], tv: TimerValues): Iterator[Totals] = {
      var t = Option(state.get()).getOrElse(Totals(key, 0L, 0.0))
      rows.foreach(e => t = Totals(key, t.n + 1, t.sum_value + e.value))
      state.update(t)
      Iterator.single(t)
    }
  }

  /** Per-user lifetime totals over the event stream, one updated row per
    * touched user per micro-batch (Update output mode). */
  def totalsStream(spark: SparkSession, stream: DataFrame): Dataset[Totals] = {
    import spark.implicits._
    stream.select(col("user_id"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotals, TimeMode.None(), OutputMode.Update())
  }
}
