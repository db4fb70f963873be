package graft.stream

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom state (SURVEY.md §2.9 T6 extension):
  * `flatMapGroupsWithState` over per-user event streams, closing a session
  * when the gap exceeds `gapSec` — either observed in-batch or by event-time
  * timeout once the watermark passes the session's end + gap.
  *
  * This is the engine's demonstration of arbitrary stateful processing,
  * the capability tier above the built-in windowed aggregates: state is one
  * small record per active user key, partitioned by the grouping key, so it
  * scales horizontally with the state store.  The batch analog (identical
  * session definition) is the oracle-checked `q15_sessionization`.
  */
object Sessionize {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(start: Long, end: Long, n: Int)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int)

  def sessionize(events: Dataset[Ev], gapSec: Long = 1800L)
      (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapSec * 1000L
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed end+gap: the open session is final
            val s = state.get
            state.remove()
            Iterator(Session(user, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.end), s.n))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end > gapMs =>
                  closed += Session(user, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.end), s.n)
                  cur = Some(SessionState(t, t, 1))
                case Some(s) =>
                  cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.end + gapMs)
              case None => ()
            }
            closed.result().iterator
          }
      }
  }
}
