package graft.stream

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** LIVE trend/burst detection — the streaming form of the batch `a8`
  * query, and the capability the reference is named for ("Live Social
  * Media Sentiment TREND Tracker"): per-label tumbling-window counts
  * where each window, once final (watermark past its end), is compared
  * to the immediately preceding window and flagged as a burst when it
  * grew ≥ `factorBp` basis points (20000 = 2×; 15000 = the batch `a8`
  * threshold) with at least `minCount` posts.  Growth is checked in
  * integer basis points exactly as `a8` does (`n * 10000 >= factorBp *
  * prev_n`), so the live detector and the batch query share one rule —
  * TrendBurstParitySpec replays the real events table through both and
  * asserts identical flags.
  *
  * Built on `flatMapGroupsWithState` (not a windowed aggregate followed
  * by a second stateful compare, which append-mode chaining restricts):
  * state per label is the open windows' counts plus the last finalized
  * window — bounded by (#labels × watermark-horizon/window) tiny
  * entries, partitioned by the grouping key, so it scales horizontally
  * with the state store exactly like [[Sessionize]].
  *
  * Semantics match a8's adjacency guard: a window following a GAP
  * (its predecessor window saw zero posts) is never a burst — growth is
  * only claimed against an actually-adjacent predecessor, so sparse
  * traffic can't fake a trend.  Windows finalize in event-time order
  * within each key (append output, each window emitted exactly once). */
object TrendBurst {

  final case class Post(label: String, ts: java.sql.Timestamp)

  /** open = windowStart(ms) → count; last finalized window start/count
    * (-1 sentinel = none yet) carries the adjacency baseline. */
  final case class BurstState(open: Map[Long, Long], lastStart: Long, lastN: Long)

  final case class WindowFlag(label: String, window_start: java.sql.Timestamp,
      n: Long, prev_n: Long, burst: Boolean)

  def bursts(posts: Dataset[Post], windowSec: Long = 60L,
      watermarkDelay: String = "2 minutes", factorBp: Long = 20000L,
      minCount: Long = 3L)(implicit spark: SparkSession): Dataset[WindowFlag] = {
    import spark.implicits._
    val windowMs = windowSec * 1000L
    posts
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.label)
      .flatMapGroupsWithState[BurstState, WindowFlag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (label: String, batch: Iterator[Post], state: GroupState[BurstState]) =>
          val wm = state.getCurrentWatermarkMs()
          var st = state.getOption.getOrElse(BurstState(Map.empty, -1L, -1L))
          // 1) fold arrivals into their tumbling windows (timeout calls
          //    carry an empty iterator, so this is a no-op there)
          batch.foreach { p =>
            val start = Math.floorDiv(p.ts.getTime, windowMs) * windowMs
            st = st.copy(open = st.open.updated(start,
              st.open.getOrElse(start, 0L) + 1L))
          }
          // 2) finalize every window the watermark has passed, oldest
          //    first, threading the adjacency baseline through
          val (done, still) = st.open.partition { case (s, _) => s + windowMs <= wm }
          var lastStart = st.lastStart
          var lastN = st.lastN
          val out = done.toSeq.sortBy(_._1).map { case (s, n) =>
            val adjacent = lastStart == s - windowMs
            val prevN = if (adjacent) lastN else 0L
            val burst = adjacent && n >= minCount && n * 10000L >= factorBp * prevN
            lastStart = s; lastN = n
            WindowFlag(label, new java.sql.Timestamp(s), n, prevN, burst)
          }
          st = BurstState(still, lastStart, lastN)
          state.update(st)
          // 3) wake when the oldest open window can finalize even if no
          //    more posts arrive for this label (timeout must be beyond
          //    the current watermark; an empty open set just waits for
          //    the next arrival — state is one tiny record per label)
          if (still.nonEmpty) {
            val next = still.keys.min + windowMs
            state.setTimeoutTimestamp(math.max(next, wm + 1L))
          }
          out.iterator
      }
  }
}
