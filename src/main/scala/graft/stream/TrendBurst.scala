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
  * == Two-stage shape (the 100 TB design) ==
  *
  * Stage 1 is a plain watermarked windowed aggregation
  * (`groupBy(window(ts), label).count()` in append mode): Spark plans a
  * PARTIAL HashAggregate before the shuffle, so each input partition
  * map-side-combines its posts and the shuffle carries at most one row
  * per (partition, label, window) — never the raw firehose.  Append
  * mode emits each (label, window) count exactly once, when the
  * watermark passes the window end, so stage 1 doubles as the window
  * finalizer.
  *
  * Stage 2 is a label-keyed `flatMapGroupsWithState` over that
  * FINALIZED-WINDOW stream (a chained stateful operator, supported in
  * append mode on Spark 4.x): its input is one tiny row per finalized
  * window, and its state is one `(lastStart, lastN)` adjacency baseline
  * per label.  The hot-key hazard of shuffling raw posts to a
  * cardinality-~3 stateful key is gone — by the time rows reach the
  * label-keyed operator they are already reduced to window counts.
  *
  * State hygiene: a baseline is only useful while its adjacent
  * successor window (`lastStart + 2·windowMs` end) can still finalize;
  * once the watermark proves no successor arrived, the state removes
  * itself (event-time timeout), so reusing the operator over
  * high-cardinality keys (hashtags, users) cannot leak state.
  *
  * Semantics match a8's adjacency guard: a window following a GAP
  * (its predecessor window saw zero posts) is never a burst — growth is
  * only claimed against an actually-adjacent predecessor, so sparse
  * traffic can't fake a trend.  Windows finalize in event-time order
  * within each key (append output, each window emitted exactly once). */
object TrendBurst {

  final case class Post(label: String, ts: java.sql.Timestamp)

  /** Per-label finalized-window count from stage 1 (already final: the
    * watermark passed `window_start + windowMs` before this row exists).
    * `event_ts` is `window_time(window)` (= end − 1 ms) and exists to carry
    * the watermark metadata into stage 2 — projecting `window.start` alone
    * strips the event-time tag and event-time timeouts refuse to plan. */
  final case class WindowCount(label: String, window_start: java.sql.Timestamp,
      event_ts: java.sql.Timestamp, n: Long)

  /** Stage-2 state: the last finalized window per label — the adjacency
    * baseline.  One tiny record per label, self-removing (see scaladoc). */
  final case class BurstState(lastStart: Long, lastN: Long)

  final case class WindowFlag(label: String, window_start: java.sql.Timestamp,
      n: Long, prev_n: Long, burst: Boolean)

  def bursts(posts: Dataset[Post], windowSec: Long = 60L,
      watermarkDelay: String = "2 minutes", factorBp: Long = 20000L,
      minCount: Long = 3L)(implicit spark: SparkSession): Dataset[WindowFlag] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, window, window_time}
    val windowMs = windowSec * 1000L

    // stage 1: watermarked tumbling-window count. Partial (map-side)
    // aggregation reduces each partition to one row per (label, window)
    // BEFORE the shuffle; append mode emits each window exactly once,
    // when it is final.
    val counted: Dataset[WindowCount] = posts
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), s"$windowSec seconds"), col("label"))
      .agg(count(lit(1)).as("n"))
      .select(col("label"), col("window.start").as("window_start"),
        window_time(col("window")).as("event_ts"), col("n"))
      .as[WindowCount]

    // stage 2: tiny label-keyed compare over the finalized-window stream.
    counted
      .groupByKey(_.label)
      .flatMapGroupsWithState[BurstState, WindowFlag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (label: String, batch: Iterator[WindowCount], state: GroupState[BurstState]) =>
          val wm = state.getCurrentWatermarkMs()
          var lastStart = state.getOption.map(_.lastStart).getOrElse(-1L)
          var lastN = state.getOption.map(_.lastN).getOrElse(-1L)
          // Rows are already final; within a batch several windows of one
          // label can finalize together (a big watermark jump), so sort by
          // start.  Across batches finalization order is monotone in the
          // watermark, so the baseline always precedes its successor.
          val out = batch.toSeq.sortBy(_.window_start.getTime).map { wc =>
            val s = wc.window_start.getTime
            val adjacent = lastStart == s - windowMs
            val prevN = if (adjacent) lastN else 0L
            val burst = adjacent && wc.n >= minCount && wc.n * 10000L >= factorBp * prevN
            lastStart = s; lastN = wc.n
            WindowFlag(label, wc.window_start, wc.n, prevN, burst)
          }
          // A baseline only matters until its adjacent successor window
          // could have finalized: successor end = lastStart + 2·windowMs.
          // Past that watermark with no successor seen, the state is
          // provably dead — remove now, or schedule the removal (the
          // timeout callback arrives with an empty iterator).
          if (lastStart < 0L) {
            state.remove() // timeout fired for an already-empty key
          } else {
            val deadAt = lastStart + 2L * windowMs
            if (wm >= deadAt) state.remove()
            else {
              state.update(BurstState(lastStart, lastN))
              state.setTimeoutTimestamp(deadAt)
            }
          }
          out.iterator
      }
  }
}
