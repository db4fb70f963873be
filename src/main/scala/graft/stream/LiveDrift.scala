package graft.stream

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** LIVE distribution-drift monitor — the streaming form of the batch
  * `a13` query (which is itself `a12`'s bounded-width KS drift): per
  * event_type, a 256-bin value histogram is maintained in keyed state
  * and, each time a finalized window folds in, the two-sample
  * Kolmogorov–Smirnov statistic is recomputed against a BROADCAST
  * reference distribution (the serving-skew alarm a deployed pipeline
  * pages on: "the live value distribution no longer looks like the
  * training corpus").
  *
  * Identical arithmetic to `a13` (`queries/Analytics.scala`): the same
  * integer-boundary bin assignment (`(floor(v) − fmin)·bins DIV
  * (fmax − fmin + 1)`, clamped to the grid — out-of-range live values
  * accumulate in the edge bins instead of corrupting state), and the
  * same exact integer statistic D·n_live·n_ref = max over the bin walk
  * of |c_live·n_ref − c_ref·n_live|, reported in basis points with the
  * product carried in BigInt so the 10⁴ step cannot overflow (a12's
  * decimal(38) reasoning).  `LiveDriftParitySpec` pins live≡batch
  * against the oracled a13 on the replayed real events table — the
  * sixth live≡batch parity pair (q15/T6, T10, T11, T12, a8/a9, this).
  *
  * == Two-stage shape (the 100 TB design, as [[LiveHeavyHitters]]) ==
  *
  * Raw events first bin scan-side and count per watermarked tumbling
  * window: the partial HashAggregate map-side-combines, so no matter
  * the value cardinality the shuffle and the windowed state carry AT
  * MOST |types|·bins rows per window — a13's bounded-walk contract
  * applied to the stream.  Stage 2 is keyed by event_type (|types|
  * tiny groups), folds finalized window deltas into one bins-counter
  * array per type — or, with `recentWindows = k`, a ≤k-entry ring of
  * per-window histograms (the trailing-horizon mode a deployed monitor
  * runs; see [[monitor]]) — and emits a drift alert per updated type
  * per batch against the reference histogram riding the closure (bins
  * longs per type — broadcast territory by construction).
  *
  * Replay hygiene: within a stage-2 batch windows fold in event-time
  * order and a window ≤ the newest folded one is a checkpoint-replayed
  * duplicate — dropped whole, making the operator idempotent across
  * restarts (the [[LiveHeavyHitters]]/[[AnomalyZscore]] contract).
  */
object LiveDrift {

  final case class Event(event_type: String, value: Double, ts: java.sql.Timestamp)

  /** Finalized per-window delta: window `window_start` added `n` events
    * of `event_type` to histogram bin `bin`. */
  final case class BinDelta(event_type: String, bin: Int,
      window_start: java.sql.Timestamp, event_ts: java.sql.Timestamp, n: Long)

  /** One finalized window's own histogram (ring mode). */
  final case class WindowHist(start: Long, counts: Seq[Long])

  /** Stage-2 state per type: newest folded window start + cumulative
    * histogram (cumulative mode; empty in ring mode) or the trailing
    * per-window ring (empty in cumulative mode) — only the active
    * mode's structure is serialized.  STATE-SCHEMA NOTE: adding `ring`
    * changed the flatMapGroupsWithState value schema vs the pre-ring
    * release; a checkpoint written by that version fails Spark's
    * state-schema compatibility check LOUDLY at restart (never corrupt
    * state) — restart such a monitor with a fresh checkpoint
    * (JobRunner's `freshStart`). */
  final case class Hist(lastStart: Long, counts: Seq[Long],
      ring: Seq[WindowHist] = Nil)

  /** One alert per updated type per batch: live-vs-reference KS after
    * folding windows up to `upto`. */
  final case class DriftAlert(event_type: String, upto: java.sql.Timestamp,
      n_live: Long, n_ref: Long, ks_scaled: Long, ks_bp: Long)

  /** a13's exact integer KS of a live histogram against a reference
    * histogram on the same grid: (n_live, n_ref, ks_scaled, ks_bp).
    * The walk products run in BigInt — c·n reaches n_live·n_ref, past
    * int64 once both sides hold ~3·10⁹ events (a long-lived monitor
    * against a large reference profile gets there), and a wrapped
    * product would silently under- or over-report the distance.  Only
    * the REPORTED ks_scaled saturates at Long.MaxValue past the int64
    * bound (read ks_bp there — it is exact at any count).  ks_bp is 0
    * when either side is empty (KS undefined — the volume alarms own
    * that case, as in a12/a13's n>0 filters). */
  def ksAgainst(live: Seq[Long], ref: Seq[Long]): (Long, Long, Long, Long) = {
    require(live.length == ref.length,
      s"histogram grids differ: ${live.length} vs ${ref.length} bins")
    val nL = live.sum
    val nR = ref.sum
    var cL = 0L; var cR = 0L; var ks = BigInt(0); var i = 0
    while (i < live.length) {
      cL += live(i); cR += ref(i)
      val d = (BigInt(cL) * nR - BigInt(cR) * nL).abs
      if (d > ks) ks = d
      i += 1
    }
    val scaled = if (ks > Long.MaxValue) Long.MaxValue else ks.toLong
    val bp = if (nL > 0 && nR > 0)
      (ks * 10000 / (BigInt(nL) * BigInt(nR))).toLong
    else 0L
    (nL, nR, scaled, bp)
  }

  /** Live drift alerts over `events` against `reference` (per-type
    * histograms on the [fmin, fmax] × `bins` grid — in production the
    * profile of the training corpus, here a13's period-0 side).
    *
    * `recentWindows` picks the live side's horizon:
    *  - 0 (default): CUMULATIVE since stream start — exactly a13's
    *    period-1-vs-period-0 semantics (the parity mode), right for
    *    bounded replays and batch-equivalent audits.  Its known trade:
    *    on an unbounded stream, sensitivity decays with age — a late
    *    shift must outweigh the whole accumulated history before the
    *    statistic moves, and the counts grow without bound.
    *  - k > 0: the live histogram is the SUM OF THE LAST k FINALIZED
    *    WINDOWS (a per-window ring in state, ≤ k·bins longs per type —
    *    the AnomalyZscore trailing-baseline pattern).  A deployed
    *    monitor runs this mode: a full distribution shift shows at
    *    full strength within k windows of onset, forever. */
  def monitor(events: Dataset[Event], reference: Map[String, Seq[Long]],
      fmin: Long, fmax: Long, bins: Int = 256, windowSec: Long = 3600L,
      watermarkDelay: String = "0 seconds", recentWindows: Int = 0)(
      implicit spark: SparkSession): Dataset[DriftAlert] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    require(fmax >= fmin, s"empty value grid: [$fmin, $fmax]")
    reference.foreach { case (t, h) =>
      require(h.length == bins, s"reference '$t' has ${h.length} bins, grid has $bins")
    }

    // stage 1: scan-side bin assignment (a13's integer arithmetic,
    // clamped to the grid), then a watermarked tumbling-window count —
    // the partial agg combines before the shuffle; a finalized window
    // yields ≤ |types|·bins tiny delta rows.
    //
    // The clamp happens in DOUBLE space FIRST: a poison value beyond
    // the int64 range (or with |v|·bins past 2^63) would otherwise
    // throw at the ANSI cast/multiply, killing the query AND
    // crash-looping every restart as the event replays from the
    // source.  After `least(greatest(v, fmin), fmax)` the cast and
    // multiply are bounded by the grid (±Infinity clamps to the edges
    // the same way); NaN needs its own guard — it propagates through
    // least/greatest and still throws at the ANSI cast — and lands in
    // the bottom edge bin (a sentinel-garbage reading, counted rather
    // than crash-looping; the batch a13 has no NaN contract at all —
    // it would raise).  The integer clamp stays as the backstop for
    // the edge where fmax's double rounding lands one past the top
    // bin.
    //
    // The UPPER bound additionally caps at the largest double strictly
    // below 2^63: Long.MaxValue is not double-representable, so for
    // fmax within 2^10 of it `fmax.toDouble` rounds UP to exactly 2^63
    // and the clamped value would still throw at the ANSI
    // CAST(floor(cv) AS BIGINT) — re-opening the crash loop the clamp
    // exists to prevent.  (The lower edge needs no twin: Long.MinValue
    // IS exactly −2^63 and casts fine, and `fmin.toDouble` can never
    // round below it.)  For any fmax under ~2^53 the min() is the
    // identity; near the top it moves the cap by ≤ 2048 ulps — inside
    // the top bin either way, and the integer backstop re-clamps.
    val castSafeHi = java.lang.Math.nextDown(Long.MaxValue.toDouble)
    val clamped = when(isnan(col("value")), lit(fmin.toDouble))
      .otherwise(least(greatest(col("value"), lit(fmin.toDouble)),
        lit(math.min(fmax.toDouble, castSafeHi))))
    val binCol = greatest(lit(0), least(lit(bins - 1),
      expr(s"(CAST(floor(cv) AS BIGINT) - ${fmin}L) * $bins DIV (${fmax}L - ${fmin}L + 1)")))
      .cast("int")
    val deltas: Dataset[BinDelta] = events
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"), col("event_type"), clamped.as("cv"))
      .select(col("ts"), col("event_type"), binCol.as("bin"))
      .groupBy(window(col("ts"), s"$windowSec seconds"),
        col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("bin"), col("window.start").as("window_start"),
        window_time(col("window")).as("event_ts"), col("n"))
      .as[BinDelta]

    // stage 2: |types| tiny groups, each folding its finalized window
    // deltas into one histogram; emits one alert per updated type.
    val recent = recentWindows
    require(recent >= 0, s"recentWindows must be >= 0, got $recent")
    deltas
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[Hist, DriftAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (typ: String, batch: Iterator[BinDelta], state: GroupState[Hist]) =>
          var lastStart = state.getOption.map(_.lastStart).getOrElse(Long.MinValue)
          val counts = state.getOption.map(_.counts.toArray)
            .getOrElse(new Array[Long](bins))
          // a checkpoint written under a different mode or bin count is
          // detectable here IN BOTH DIRECTIONS (ring mode persists empty
          // counts, cumulative mode persists exactly `bins`; the Spark
          // state-schema check can't tell them apart — the schema is
          // unchanged) — fail loudly rather than mis-index the restored
          // histogram or silently discard accumulated history on a
          // cumulative→ring flip
          state.getOption.foreach { h =>
            if (recent == 0)
              require(h.counts.length == bins,
                s"restored state has ${h.counts.length} bins, monitor expects $bins — " +
                  "mode/bins changed across a checkpoint; restart fresh")
            else {
              require(h.counts.isEmpty,
                "restored state carries a cumulative histogram but the monitor runs " +
                  "in ring mode (recentWindows > 0) — mode changed across a " +
                  "checkpoint; restart fresh")
              require(h.ring.forall(_.counts.length == bins),
                s"restored ring has a window with ${h.ring.map(_.counts.length).distinct} " +
                  s"bins, monitor expects $bins — bins changed across a checkpoint; " +
                  "restart fresh")
            }
          }
          var ring = state.getOption.map(_.ring.toVector).getOrElse(Vector.empty)
          var touched = false
          batch.toSeq.groupBy(_.window_start.getTime).toSeq.sortBy(_._1)
            .foreach { case (start, cells) =>
              if (start > lastStart) { // else checkpoint-replayed duplicate
                val target =
                  if (recent == 0) counts else new Array[Long](bins)
                cells.foreach { c =>
                  require(c.bin >= 0 && c.bin < bins,
                    s"bin ${c.bin} out of [0, $bins) — clamp broken?")
                  target(c.bin) += c.n
                }
                if (recent > 0)
                  ring = (ring :+ WindowHist(start, target.toVector)).takeRight(recent)
                lastStart = start
                touched = true
              }
            }
          if (!touched) Iterator.empty
          else {
            // ring mode never reads the cumulative vector — persist an
            // empty one instead of bins dead zero longs per type
            state.update(Hist(lastStart,
              if (recent == 0) counts.toVector else Vector.empty, ring))
            val live =
              if (recent == 0) counts.toSeq
              else (0 until bins).map(i => ring.iterator.map(_.counts(i)).sum)
            val ref = reference.getOrElse(typ, Seq.fill(bins)(0L))
            val (nL, nR, ks, bp) = ksAgainst(live, ref)
            Iterator.single(DriftAlert(typ,
              new java.sql.Timestamp(lastStart), nL, nR, ks, bp))
          }
      }
  }
}
