package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.streaming.OutputMode

/** Ring-mode (trailing-horizon) parity for the drift monitor — the mode
  * a DEPLOYED monitor actually runs (`recentWindows = k`), which round
  * 8 shipped with only the cumulative mode batch-pinned:
  *
  *  1. Live ≡ batch on the REAL events table, ACROSS A CHECKPOINTED
  *     RESTART: period 0 is the broadcast reference, period 1 replays
  *     through a file source in two runs with a stop in between, and
  *     each type's final alert must equal an independently-computed
  *     trailing-k-window statistic — a13's bin arithmetic over only
  *     the last k finalized tumbling windows per type, with the KS
  *     walk re-derived in the spec (not via `ksAgainst`, so the
  *     operator's own arithmetic is cross-checked, the
  *     AnomalyParitySpec discipline).
  *  2. The mode-flip guards fire IN BOTH DIRECTIONS across a
  *     checkpoint (ADVICE r8: the cumulative→ring direction silently
  *     discarded history — the state schema is identical, so only the
  *     operator itself can catch the flip), and a bins change under a
  *     ring checkpoint is equally loud. */
class LiveDriftRingParitySpec extends SparkSpec {

  /** Independent exact-integer KS walk (BigInt), deliberately NOT
    * `LiveDrift.ksAgainst`. */
  private def ksWalk(live: Seq[Long], ref: Seq[Long]): (Long, Long, Long, Long) = {
    val nL = live.sum; val nR = ref.sum
    var cL = BigInt(0); var cR = BigInt(0); var best = BigInt(0)
    live.indices.foreach { i =>
      cL += live(i); cR += ref(i)
      val d = (cL * nR - cR * nL).abs
      if (d > best) best = d
    }
    val scaled = if (best > Long.MaxValue) Long.MaxValue else best.toLong
    val bp = if (nL > 0 && nR > 0) (best * 10000 / (BigInt(nL) * nR)).toLong else 0L
    (nL, nR, scaled, bp)
  }

  test("ring-mode final alerts == batch trailing-k windows across a restart (sf0.01)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._

    val dir = sf("sf0.01")
    val raw = graft.tables.Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"), col("ts"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getTimestamp(2), r.getLong(3)))
    assert(raw.length >= 500, s"fixture too small: ${raw.length}")

    val minmax = raw.map(_._4).min + raw.map(_._4).max
    val fmin = math.floor(raw.map(_._2).min).toLong
    val fmax = math.floor(raw.map(_._2).max).toLong
    val bins = 256
    def bin(v: Double): Int = {
      val cv = math.min(math.max(v, fmin.toDouble), fmax.toDouble)
      math.min(bins - 1, math.max(0,
        ((math.floor(cv).toLong - fmin) * bins / (fmax - fmin + 1)).toInt))
    }
    val (p0, p1) = raw.partition(r => r._4 * 2 <= minmax)
    assert(p0.nonEmpty && p1.nonEmpty)
    val reference = p0.groupBy(_._1).map { case (t, rows) =>
      val h = new Array[Long](bins)
      rows.foreach(r => h(bin(r._2)) += 1L)
      t -> h.toSeq
    }

    // batch truth: per type, the last k finalized tumbling windows of
    // period 1 (epoch-aligned 3600 s), histogrammed with a13's bin
    // arithmetic, walked independently
    val k = 3
    val winUs = 3600L * 1000000L
    def winStart(us: Long): Long = us / winUs * winUs
    val expected = p1.groupBy(_._1).map { case (t, rows) =>
      val lastK = rows.map(r => winStart(r._4)).distinct.sorted.takeRight(k).toSet
      val h = new Array[Long](bins)
      rows.filter(r => lastK.contains(winStart(r._4))).foreach(r => h(bin(r._2)) += 1L)
      t -> ((ksWalk(h.toSeq, reference.getOrElse(t, Seq.fill(bins)(0L))), lastK.max))
    }

    // live: file-source replay split at the time midpoint, with a full
    // stop + checkpointed restart between the halves
    val dirs = restartDirs("ldr")
    def jsonOf(r: (String, Double, java.sql.Timestamp, Long)): String =
      s"""{"event_type": "${r._1}", "value": ${r._2}, "ts": "${r._3}"}"""
    def start() = LiveDrift.monitor(
      spark.readStream.schema("event_type STRING, value DOUBLE, ts TIMESTAMP")
        .json(dirs.in).as[LiveDrift.Event],
      reference, fmin, fmax, bins, windowSec = 3600L, recentWindows = k)
      .writeStream.format("json")
      .option("path", dirs.out).option("checkpointLocation", dirs.cp)
      .outputMode(OutputMode.Append).start()

    val sorted = p1.sortBy(_._4)
    val (h1, h2) = sorted.splitAt(sorted.length / 2)
    val q1 = start()
    try { dirs.writeBatch("b0.json", h1.map(jsonOf).toSeq); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start()
    try {
      dirs.writeBatch("b1.json", h2.map(jsonOf).toSeq)
      q2.processAllAvailable()
      dirs.writeBatch("b2.json", Seq(
        """{"event_type": "__sentinel__", "value": 0.0, "ts": "2026-01-01 00:00:00"}"""))
      q2.processAllAvailable()
    } finally q2.stop()

    val live = spark.read
      .schema("event_type STRING, upto TIMESTAMP, n_live BIGINT, n_ref BIGINT, " +
        "ks_scaled BIGINT, ks_bp BIGINT")
      .json(dirs.out).as[LiveDrift.DriftAlert].collect()
      .filter(_.event_type != "__sentinel__")
      .groupBy(_.event_type).map { case (t, as) => t -> as.maxBy(_.upto.getTime) }

    val both = expected.keySet.filter(reference.contains)
    assert(both.nonEmpty, "no event type spans both periods — parity is vacuous")
    assert(both.subsetOf(live.keySet),
      s"types missing live alerts: ${both.diff(live.keySet)}")
    both.foreach { t =>
      val ((nL, nR, ks, bp), lastStart) = expected(t)
      val a = live(t)
      assert((a.n_live, a.n_ref, a.ks_scaled, a.ks_bp) == ((nL, nR, ks, bp)),
        s"$t: live (${a.n_live}, ${a.n_ref}, ${a.ks_scaled}, ${a.ks_bp}) " +
          s"!= batch trailing-$k ($nL, $nR, $ks, $bp)")
      assert(a.upto.getTime * 1000L == lastStart,
        s"$t: upto ${a.upto} != newest folded window start ${lastStart}")
    }
  }

  private def failsLoudly(q: => org.apache.spark.sql.streaming.StreamingQuery,
      needle: String, feed: RestartDirs => Unit, dirs: RestartDirs): Unit = {
    val query = q
    try {
      feed(dirs)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        query.processAllAvailable()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains(needle)),
        s"expected loud '$needle' failure, got: ${messages(e)}")
    } finally query.stop()
  }

  test("mode/bins flips across a checkpoint fail loudly in every direction") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val ref10 = Map("m" -> Seq.fill(10)(1L))
    val ref5 = Map("m" -> Seq.fill(5)(1L))

    def runAndStop(dirs: RestartDirs, recent: Int, batch: String,
        lines: Seq[String]): Unit = {
      val q = LiveDrift.monitor(
        spark.readStream.schema("event_type STRING, value DOUBLE, ts TIMESTAMP")
          .json(dirs.in).as[LiveDrift.Event],
        ref10, 0L, 9L, 10, windowSec = 60L, recentWindows = recent)
        .writeStream.format("json")
        .option("path", dirs.out).option("checkpointLocation", dirs.cp)
        .outputMode(OutputMode.Append).start()
      try { dirs.writeBatch(batch, lines); q.processAllAvailable() } finally q.stop()
    }
    val w0 = Seq("""{"event_type": "m", "value": 2.0, "ts": "2024-01-01 12:00:01"}""",
      """{"event_type": "m", "value": 7.0, "ts": "2024-01-01 12:02:00"}""")
    val later = Seq("""{"event_type": "m", "value": 3.0, "ts": "2024-01-01 12:10:00"}""")

    // cumulative checkpoint → ring monitor: the ADVICE direction (was
    // silently discarding the accumulated histogram)
    val d1 = restartDirs("ld-flip1")
    runAndStop(d1, recent = 0, "b0.json", w0)
    failsLoudly(
      LiveDrift.monitor(
        spark.readStream.schema("event_type STRING, value DOUBLE, ts TIMESTAMP")
          .json(d1.in).as[LiveDrift.Event],
        ref10, 0L, 9L, 10, windowSec = 60L, recentWindows = 2)
        .writeStream.format("json")
        .option("path", d1.out).option("checkpointLocation", d1.cp)
        .outputMode(OutputMode.Append).start(),
      "ring mode", _.writeBatch("b1.json", later), d1)

    // ring checkpoint → cumulative monitor (the direction that already
    // failed loudly; pinned so it stays loud)
    val d2 = restartDirs("ld-flip2")
    runAndStop(d2, recent = 2, "b0.json", w0)
    failsLoudly(
      LiveDrift.monitor(
        spark.readStream.schema("event_type STRING, value DOUBLE, ts TIMESTAMP")
          .json(d2.in).as[LiveDrift.Event],
        ref10, 0L, 9L, 10, windowSec = 60L, recentWindows = 0)
        .writeStream.format("json")
        .option("path", d2.out).option("checkpointLocation", d2.cp)
        .outputMode(OutputMode.Append).start(),
      "restored state has 0 bins", _.writeBatch("b1.json", later), d2)

    // ring checkpoint → ring monitor with DIFFERENT bins
    val d3 = restartDirs("ld-flip3")
    runAndStop(d3, recent = 2, "b0.json", w0)
    failsLoudly(
      LiveDrift.monitor(
        spark.readStream.schema("event_type STRING, value DOUBLE, ts TIMESTAMP")
          .json(d3.in).as[LiveDrift.Event],
        ref5, 0L, 9L, 5, windowSec = 60L, recentWindows = 2)
        .writeStream.format("json")
        .option("path", d3.out).option("checkpointLocation", d3.cp)
        .outputMode(OutputMode.Append).start(),
      "bins changed across a checkpoint", _.writeBatch("b1.json", later), d3)
  }
}
