package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time sessionization with custom keyed state — the
  * `flatMapGroupsWithState` shape a training-data ingest pipeline needs
  * (builder's brief: "KeyValueGroupedDataset.mapGroupsWithState /
  * flatMapGroupsWithState for custom state").
  *
  * Semantics: events for a key belong to one session while each gap between
  * consecutive events is < `gapSeconds`; a session closes when the event-time
  * watermark passes its end + gap (EventTimeTimeout), emitting one row
  * (key, session_start, session_end, events).
  *
  * Scale notes: state is O(1) per active key (start/end/count — no event
  * buffer); keys partition across executors by groupByKey hash; the
  * watermark bounds state lifetime so the store cannot grow with history.
  */
object Sessionize {

  case class Event(key: String, ts: Timestamp)
  case class SessionState(startMs: Long, endMs: Long, events: Long)
  case class Session(key: String, session_start: Timestamp, session_end: Timestamp, events: Long)

  def sessionize(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      gapSeconds: Long,
      watermark: String = "10 seconds",
  ): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L
    val typed = events
      .select(col(keyCol).cast("string").as("key"), col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermark)
      .as[Event]

    typed
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed session end + gap: close and emit
            val s = state.get
            state.remove()
            Iterator.single(Session(key, new Timestamp(s.startMs), new Timestamp(s.endMs), s.events))
          } else {
            // fold this micro-batch's events (sorted — batches are unordered)
            val sorted = rows.map(_.ts.getTime).toArray.sorted
            var closed = List.empty[Session]
            var cur    = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.endMs < gapMs =>
                  cur = Some(SessionState(s.startMs, math.max(s.endMs, t), s.events + 1))
                case Some(s) =>
                  closed ::= Session(key, new Timestamp(s.startMs), new Timestamp(s.endMs), s.events)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
