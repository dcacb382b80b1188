package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming via `flatMapGroupsWithState` (SURVEY §2.8's
  * "absent" capability row): per-user sessionization with an explicit
  * state machine — the shape for any custom state Spark's built-in
  * `session_window` can't express (e.g. value-dependent gaps, session
  * caps, early emission).
  *
  * State is one open session per user (bounded memory per key), closed
  * sessions are emitted either when a new event arrives past the gap or
  * when the event-time timeout fires after the watermark passes the
  * session's horizon — exactly-once output under checkpointing.
  */
object StatefulSessions {

  final case class Ev(user_id: Long, ts: java.time.Instant, value: Double) {
    def ts_us: Long = ts.getEpochSecond * 1000000L + ts.getNano / 1000L
  }
  final case class OpenSession(start_us: Long, last_us: Long, n: Long, sum_value: Double)
  final case class SessionOut(
      user_id: Long, session_start_us: Long, session_end_us: Long,
      n: Long, sum_value: Double)

  val GapUs: Long = 30L * 60 * 1000000

  def sessionize(
      key: Long, events: Iterator[Ev],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.value))
    var open = state.getOption
    val closed = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.ts_us >= s.last_us + GapUs =>
          closed += SessionOut(key, s.start_us, s.last_us, s.n, s.sum_value)
          open = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
        case Some(s) =>
          open = Some(s.copy(
            last_us = math.max(s.last_us, e.ts_us),
            n = s.n + 1, sum_value = s.sum_value + e.value))
        case None =>
          open = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
      }
    }
    if (sorted.isEmpty && state.hasTimedOut) {
      // watermark passed the open session's horizon: finalize it
      state.getOption.foreach(s =>
        closed += SessionOut(key, s.start_us, s.last_us, s.n, s.sum_value))
      state.remove()
    } else {
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp((s.last_us + GapUs) / 1000)
      }
    }
    closed.result().iterator
  }

  /** Wire the state machine over a watermarked event stream (the
    * watermarked `ts` column must survive into the typed Dataset for
    * event-time timeouts to be allowed). */
  def sessionStream(spark: SparkSession, stream: DataFrame): Dataset[SessionOut] = {
    import spark.implicits._
    stream
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("ts"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionize)
  }
}
