package graft.stream

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** LIVE rolling z-score anomaly detection — the streaming form of the
  * batch `a9` query, and the alerting complement to [[TrendBurst]]: where
  * the burst detector flags adjacent-window GROWTH, this flags windows
  * whose count sits ≥3σ off the trailing baseline of the last
  * `baselineWindows` OBSERVED windows for the same key ("this hour's
  * volume is ≥3σ off its trailing-day baseline" — the query a live
  * tracker pages on).
  *
  * The test is `a9`'s exact integer form: with a full baseline of W
  * observed windows carrying S = Σnᵢ and SS = Σnᵢ², a count x is
  * anomalous iff `(W·x − S)² > sigmaSq·(W·SS − S²)` (sigmaSq = 9 ⇒ 3σ,
  * population variance).  Run here in BigInt so no firehose count can
  * overflow; at the oracle SFs every term is small enough that the batch
  * query's int64/double-register arithmetic is exact too, which is what
  * AnomalyParitySpec leans on: the sf events table replayed live
  * reproduces batch `a9`'s oracle-checked rows exactly.  A zero-variance
  * baseline flags ANY deviation (lhs² > 0, rhs = 0) — the right alert
  * semantics for a flat series, same as batch.
  *
  * == Two-stage shape (the 100 TB design, as [[TrendBurst]]) ==
  *
  * Stage 1 is a watermarked tumbling-window count in append mode: the
  * PARTIAL HashAggregate map-side-combines raw events per partition, so
  * the shuffle carries one row per (partition, key, window) — the
  * key-cardinality-bound stateful stage never sees the raw stream.
  * Stage 2 is a key-keyed `flatMapGroupsWithState` whose input is one
  * tiny row per FINALIZED window and whose state is one ≤W-entry count
  * ring per key.
  *
  * == Baseline semantics (deliberately different from TrendBurst) ==
  *
  * `a9`'s frame is the last W OBSERVED windows (ROWS BETWEEN), not the
  * last W wall-clock windows: a traffic gap does not silently shrink or
  * age out the baseline, it just delays the next flag until W windows
  * have genuinely been seen.  The ring therefore never expires by event
  * time on its own — for reuse over high-cardinality keys (hashtags,
  * users) pass `idleTtlMs` and the state self-removes (event-time
  * timeout) after that long with no finalized window, at the cost of
  * re-arming (W fresh windows) when the key wakes; with the default
  * `None` the state is bounded by W × |keys|, which is the right trade
  * for the low-cardinality keys this runs on (event types, sentiment
  * labels).
  *
  * Replay hygiene: windows finalize in event-time order per key (append
  * mode emits each exactly once; within a batch we sort), so a row whose
  * start is ≤ the newest ring entry can only be a checkpoint-replayed
  * duplicate — it is dropped, making the operator idempotent across
  * restarts. */
object AnomalyZscore {

  final case class Event(key: String, ts: java.sql.Timestamp)

  /** Finalized per-key window count from stage 1.  `event_ts` is
    * `window_time(window)` and carries the event-time watermark tag into
    * stage 2 (see [[TrendBurst.WindowCount]]). */
  final case class WindowCount(key: String, window_start: java.sql.Timestamp,
      event_ts: java.sql.Timestamp, n: Long)

  /** Stage-2 state: the last ≤W finalized counts, oldest first, plus the
    * newest window start for monotonicity / duplicate-drop. */
  final case class Baseline(lastStart: Long, counts: Seq[Long])

  /** One row per ANOMALOUS window (quiet windows emit nothing, matching
    * batch `a9`): `base_sum` = S over the W-window baseline, `direction`
    * = sign(W·n − S) (+1 spike, −1 drop). */
  final case class AnomalyFlag(key: String, window_start: java.sql.Timestamp,
      n: Long, base_sum: Long, direction: Int)

  def anomalies(events: Dataset[Event], windowSec: Long = 3600L,
      watermarkDelay: String = "2 hours", baselineWindows: Int = 24,
      sigmaSq: Long = 9L, idleTtlMs: Option[Long] = None)(
      implicit spark: SparkSession): Dataset[AnomalyFlag] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, window, window_time}
    val W = baselineWindows
    val windowMs = windowSec * 1000L

    // stage 1: watermarked tumbling-window count (partial agg before the
    // shuffle; append mode = exactly-once window finalizer). Epoch-aligned
    // tumbling windows bucket identically to a9's date_trunc.
    val counted: Dataset[WindowCount] = events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), s"$windowSec seconds"), col("key"))
      .agg(count(lit(1)).as("n"))
      .select(col("key"), col("window.start").as("window_start"),
        window_time(col("window")).as("event_ts"), col("n"))
      .as[WindowCount]

    // stage 2: tiny key-keyed ring compare over the finalized-window stream.
    counted
      .groupByKey(_.key)
      .flatMapGroupsWithState[Baseline, AnomalyFlag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, batch: Iterator[WindowCount], state: GroupState[Baseline]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var lastStart = state.getOption.map(_.lastStart).getOrElse(Long.MinValue)
            var counts = state.getOption.map(_.counts.toVector).getOrElse(Vector.empty)
            val out = batch.toSeq.sortBy(_.window_start.getTime).flatMap { wc =>
              val s = wc.window_start.getTime
              if (s <= lastStart) None // checkpoint-replayed duplicate
              else {
                val flag = if (counts.size == W) {
                  val sum = counts.foldLeft(BigInt(0))(_ + _)
                  val ss = counts.foldLeft(BigInt(0))((a, c) => a + BigInt(c) * c)
                  val lhs = BigInt(W) * wc.n - sum
                  val rhs = BigInt(sigmaSq) * (BigInt(W) * ss - sum * sum)
                  if (lhs * lhs > rhs)
                    Some(AnomalyFlag(key, wc.window_start, wc.n, sum.toLong, lhs.signum))
                  else None
                } else None
                lastStart = s
                counts = (counts :+ wc.n).takeRight(W)
                flag
              }
            }
            if (counts.nonEmpty) {
              idleTtlMs match {
                case Some(ttl) =>
                  // idle clock starts at the newest window's end (event
                  // time, = lastStart + windowMs − 1, the stage-1 event_ts).
                  // If the watermark already proves the key idle past the
                  // TTL, expire NOW — a timeout timestamp behind the
                  // watermark is rejected by the state store.
                  val deadAt = lastStart + windowMs - 1L + ttl
                  if (state.getCurrentWatermarkMs() >= deadAt) state.remove()
                  else {
                    state.update(Baseline(lastStart, counts))
                    state.setTimeoutTimestamp(deadAt)
                  }
                case None => state.update(Baseline(lastStart, counts))
              }
            }
            out.iterator
          }
      }
  }
}
