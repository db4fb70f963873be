package graft.stream

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** LIVE Count-Min heavy hitters — the streaming form of the batch `a10`
  * query (reference: the dashboard's "top users" style rankings,
  * `dashboard/streamlit_app.py:329–352`, recomputed from the full
  * accumulated output; here the sketch is maintained incrementally so
  * the answer is always current without rescanning history).
  *
  * Identical sketch algebra to `a10` (`functions/CountMin.scala`): d
  * Carter–Wegman row hashes over `w` buckets, estimate = min over rows.
  * The SAME constants (`Analytics.CmsA/CmsB/CmsW/CmsD`) are used so
  * live≡batch parity holds at the STATE level: after replaying the whole
  * events table, every counter in the live sketch equals the batch
  * `graft_cms` aggregate's — pinned by `LiveHeavyHittersParitySpec`.
  *
  * == Two-stage shape (the 100 TB design, as [[TrendBurst]]/[[AnomalyZscore]]) ==
  *
  * Raw events are first EXPLODED into their d (row, bucket) coordinates
  * and counted per watermarked tumbling window: the PARTIAL HashAggregate
  * map-side-combines within each partition, so no matter the key
  * cardinality (users at a firehose SF) the shuffle and the stateful
  * window store carry AT MOST d·w rows per window — the sketch's
  * constant-width contract applied to the stream. Stage 2 is keyed by
  * hash-row index (d tiny groups) and folds finalized window deltas into
  * one w-counter array per row, emitting a snapshot per updated row per
  * batch. Point estimates / top-k are read off the snapshot (min over d
  * rows at each candidate's bucket coordinates) — exactly `a10`'s read
  * path, against state that is always one watermark behind now.
  *
  * Replay hygiene: stage 1's append mode finalizes each (window, row,
  * bucket) exactly once; within a stage-2 batch windows are folded in
  * event-time order and a window ≤ the newest folded one is a
  * checkpoint-replayed duplicate — its deltas are dropped whole, making
  * the operator idempotent across restarts (same contract as
  * [[AnomalyZscore]]).
  */
object LiveHeavyHitters {

  final case class Event(user_id: Long, ts: java.sql.Timestamp)

  /** Finalized per-window delta for one sketch cell: window `w0` added
    * `n` to row `i`, bucket `bkt`. `event_ts` carries the watermark tag. */
  final case class CellDelta(i: Int, bkt: Int,
      window_start: java.sql.Timestamp, event_ts: java.sql.Timestamp, n: Long)

  /** Stage-2 state per hash row: newest folded window start + counters. */
  final case class SketchRow(lastStart: Long, counters: Seq[Long])

  /** One snapshot row per updated hash row per batch: the full counter
    * vector for row `i` after folding windows up to `upto`. */
  final case class Snapshot(i: Int, upto: java.sql.Timestamp, counters: Seq[Long])

  /** Live sketch over `events`, snapshots in append mode. */
  def sketch(events: Dataset[Event], windowSec: Long = 3600L,
      watermarkDelay: String = "0 seconds")(
      implicit spark: SparkSession): Dataset[Snapshot] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.queries.Analytics.{CmsA, CmsB, CmsD, CmsW, KmvP}

    // stage 1: explode each event into its d sketch coordinates, then a
    // watermarked tumbling-window count. The partial agg combines before
    // the shuffle; a finalized window yields ≤ d·w tiny delta rows.
    val coords = (0 until CmsD).map { i =>
      struct(lit(i).as("i"),
        (((col("user_id") % KmvP) * CmsA(i) + CmsB(i)) % KmvP % CmsW)
          .cast("int").as("bkt"))
    }
    val deltas: Dataset[CellDelta] = events
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"), explode(array(coords: _*)).as("c"))
      .groupBy(window(col("ts"), s"$windowSec seconds"),
        col("c.i").as("i"), col("c.bkt").as("bkt"))
      .agg(count(lit(1)).as("n"))
      .select(col("i"), col("bkt"), col("window.start").as("window_start"),
        window_time(col("window")).as("event_ts"), col("n"))
      .as[CellDelta]

    // stage 2: d tiny groups, each folding its finalized window deltas
    // into one w-counter array; emits a snapshot per updated row.
    val w = CmsW
    deltas
      .groupByKey(_.i)
      .flatMapGroupsWithState[SketchRow, Snapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (i: Int, batch: Iterator[CellDelta], state: GroupState[SketchRow]) =>
          var lastStart = state.getOption.map(_.lastStart).getOrElse(Long.MinValue)
          val counters = state.getOption.map(_.counters.toArray)
            .getOrElse(new Array[Long](w))
          var touched = false
          batch.toSeq.groupBy(_.window_start.getTime).toSeq.sortBy(_._1)
            .foreach { case (start, cells) =>
              if (start > lastStart) { // else checkpoint-replayed duplicate
                cells.foreach { c =>
                  // negative user_id would hash to a negative bucket
                  // (Scala % keeps the dividend's sign) — fail LOUDLY
                  // like the batch kernel's require, never corrupt state
                  require(c.bkt >= 0 && c.bkt < w,
                    s"bucket ${c.bkt} out of [0, $w) — negative user_id?")
                  counters(c.bkt) += c.n
                }
                lastStart = start
                touched = true
              }
            }
          if (!touched) Iterator.empty
          else {
            state.update(SketchRow(lastStart, counters.toVector))
            Iterator.single(Snapshot(i,
              new java.sql.Timestamp(lastStart), counters.toVector))
          }
      }
  }

  /** `a10`'s read path over a set of live snapshot rows: estimate =
    * min over rows of the candidate's bucket counter; top-k by
    * (estimate desc, user_id). Driver-side helper for tests/serving —
    * the snapshot is d·w longs, never the key universe. */
  def topK(latest: Map[Int, Seq[Long]], candidates: Seq[Long], k: Int): Seq[(Long, Long)] = {
    import graft.queries.Analytics.{CmsA, CmsB, CmsD, CmsW, KmvP}
    require(latest.keySet == (0 until CmsD).toSet,
      s"need all $CmsD sketch rows, have ${latest.keySet}")
    candidates.map { u =>
      val est = (0 until CmsD).map { i =>
        val bkt = (((u % KmvP) * CmsA(i) + CmsB(i)) % KmvP % CmsW).toInt
        require(bkt >= 0, s"candidate $u hashes to a negative bucket")
        latest(i)(bkt)
      }.min
      (u, est)
    }.sortBy { case (u, est) => (-est, u) }.take(k)
  }
}
