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
  * session definition) is the oracle-checked `q15_sessionization`, and
  * `SessionizeParitySpec` pins live ≡ batch on the real events table.
  *
  * All session arithmetic runs in exact integer MICROseconds (the
  * repo-wide event-time convention, `README.md` conventions table) — the
  * original millisecond form truncated `Timestamp` sub-ms digits, which
  * can flip a `gap > 30 min` comparison against the µs-exact batch
  * query on µs-resolution data.  Only the state-timeout registration
  * rounds (up, +1 ms): the timeout decides WHEN the final open session
  * flushes, never its contents. */
object Sessionize {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp)
  /** Open session in µs since epoch. */
  final case class SessionState(start: Long, end: Long, n: Int)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int)

  private def micros(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }
  private def toTs(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  def sessionize(events: Dataset[Ev], gapSec: Long = 1800L)
      (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapSec * 1000000L
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
            Iterator(Session(user, toTs(s.start), toTs(s.end), s.n))
          } else {
            val sorted = batch.toSeq.map(e => micros(e.ts)).sorted
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.end > gapUs =>
                  closed += Session(user, toTs(s.start), toTs(s.end), s.n)
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
                // ms-rounded UP so the µs-exact deadline is always covered
                state.setTimeoutTimestamp(Math.floorDiv(s.end + gapUs, 1000L) + 1L)
              case None => ()
            }
            closed.result().iterator
          }
      }
  }
}
