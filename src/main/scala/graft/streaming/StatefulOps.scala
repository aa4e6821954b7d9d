package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom arbitrary-state streaming operators via
  * `flatMapGroupsWithState` (SURVEY.md §2.9 capability row) — for
  * semantics the built-in window/dedup operators can't express.
  *
  * State lives per key in the state store (RocksDB/HDFS-backed on a
  * cluster), sized O(keys), checkpointed with the query — the shape that
  * scales to 1000 executors because each key's state is updated by
  * exactly one task per microbatch.
  */
object StatefulOps {

  case class EventIn(event_id: Long, ts: Timestamp, user_id: Long,
                     event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Int, sum: Double)

  // java.sql.Timestamp epoch-µs helpers — getTime alone is millis and
  // silently drops the µs component the event timestamps carry.
  private def toMicros(ts: Timestamp): Long =
    (ts.getTime - ts.getNanos / 1000000) * 1000L + ts.getNanos / 1000
  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
  case class SessionOut(user_id: Long, sess_start: Timestamp, sess_end: Timestamp,
                        n_events: Int, sv: Double)

  /** Sessionization with explicit state, expressed through the
    * custom-state API as the extension template for logic the builtins
    * lack (e.g. value-dependent gaps, per-session early triggers).
    *
    * BATCH-mode formulation: each group arrives complete in one call,
    * so state is emitted immediately and nothing carries over (tested
    * equivalent to q32's window formulation). A streaming deployment
    * must instead KEEP the open session in state across micro-batches
    * and close it via `GroupStateTimeout` (event-time timeout at
    * watermark + gap) — with the `NoTimeout`/reset shape used here, a
    * session spanning two micro-batches would fragment at the batch
    * boundary. For plain streaming sessions use
    * [[Streaming.sessionAggregates]] (`session_window` handles that
    * state machine natively). */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gapMinutes: Int = 30): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60 * 1000000L
    events.select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (userId, events, state: GroupState[List[SessionState]]) =>
          // batch mode: all of the user's events arrive in one call, in
          // arbitrary order — sort by event time, then fold into sessions.
          val sorted = events.toSeq.sortBy(e => (toMicros(e.ts), e.event_id))
          val sessions = sorted.foldLeft(List.empty[SessionState]) { (acc, e) =>
            val t = toMicros(e.ts)
            acc match {
              case head :: tail if t - head.last <= gapUs =>
                head.copy(last = t, n = head.n + 1, sum = head.sum + e.value) :: tail
              case _ =>
                SessionState(t, t, 1, e.value) :: acc
            }
          }
          state.update(Nil) // sessions emitted; nothing carried (batch mode)
          sessions.reverseIterator.map(s =>
            SessionOut(userId, fromMicros(s.start), fromMicros(s.last), s.n,
              BigDecimal(s.sum).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)).iterator
      }
  }
}
