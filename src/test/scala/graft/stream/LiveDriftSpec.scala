package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Unit behavior of the live drift monitor: alert arithmetic against the
  * closed-form statistic, out-of-range clamping, cumulative folding,
  * duplicate-window drop, bounded state under value-cardinality stress,
  * and checkpointed-restart survival. Live≡batch parity against the
  * oracled `a13` is pinned separately in [[LiveDriftParitySpec]]. */
class LiveDriftSpec extends SparkSpec {

  private def ev(t: String, v: Double, iso: String) = LiveDrift.Event(
    t, v, java.sql.Timestamp.from(java.time.Instant.parse(iso)))

  // 10-bin identity grid over values 0..9 — bin(v) == floor(v)
  private val Fmin = 0L
  private val Fmax = 9L
  private val Bins = 10

  test("ksAgainst: closed forms (disjoint mass = max, equal hists = 0, empty side = 0 bp)") {
    // live all in bin 0, ref all in bin 9 → at bin 0: |4·3 − 0·4| = 12 = nL·nR
    val live = Seq(4L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
    val ref = Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 3L)
    assert(LiveDrift.ksAgainst(live, ref) == ((4L, 3L, 12L, 10000L)))
    assert(LiveDrift.ksAgainst(live, live) == ((4L, 4L, 0L, 0L)))
    assert(LiveDrift.ksAgainst(live, Seq.fill(10)(0L)) == ((4L, 0L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      LiveDrift.ksAgainst(live, Seq(1L)): Unit
    }
  }

  test("alerts fold finalized windows cumulatively; clamp catches out-of-range values") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ref = Map("m" -> Seq(2L, 2L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    val input = MemoryStream[LiveDrift.Event]
    val q = LiveDrift.monitor(input.toDS(), ref, Fmin, Fmax, Bins, windowSec = 60L)
      .writeStream.format("memory").queryName("ld_unit")
      .outputMode(OutputMode.Append).start()
    try {
      // w0: values 0, 1, plus out-of-range 100.0 (→ bin 9) and −5.0 (→ bin 0),
      // and POISON values past the int64 range (±1e300): the clamp must run
      // in double space BEFORE the ANSI cast/multiply, or a single such
      // event kills the query and crash-loops every restart (ADVICE r8)
      input.addData(ev("m", 0.0, "2024-01-01T00:00:10Z"),
        ev("m", 1.0, "2024-01-01T00:00:20Z"),
        ev("m", 100.0, "2024-01-01T00:00:30Z"),
        ev("m", -5.0, "2024-01-01T00:00:40Z"),
        ev("m", 1e300, "2024-01-01T00:00:50Z"),
        ev("m", -1e300, "2024-01-01T00:00:55Z"),
        ev("m", Double.NaN, "2024-01-01T00:00:57Z"),
        ev("m", Double.PositiveInfinity, "2024-01-01T00:00:58Z"),
        ev("m", Double.NegativeInfinity, "2024-01-01T00:00:59Z"))
      q.processAllAvailable()
      input.addData(ev("m", 1.0, "2024-01-01T00:01:10Z")) // finalizes w0
      q.processAllAvailable()
      val a0 = spark.table("ld_unit").as[LiveDrift.DriftAlert].collect()
      assert(a0.length == 1, s"got ${a0.toSeq}")
      // bin 0: {0.0, -5.0, -1e300, NaN, -Inf}; bin 9: {100.0, 1e300, +Inf}
      val liveHist0 = Seq(5L, 1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 3L)
      val want0 = LiveDrift.ksAgainst(liveHist0, ref("m"))
      assert((a0.head.n_live, a0.head.n_ref, a0.head.ks_scaled, a0.head.ks_bp) == want0,
        s"got ${a0.head}, want $want0")
      assert(a0.head.upto.toInstant.toString == "2024-01-01T00:00:00Z")
      // sentinel finalizes w1 → cumulative histogram (5 events)
      input.addData(ev("zz", 0.0, "2024-01-01T02:00:00Z"))
      q.processAllAvailable()
      val latest = spark.table("ld_unit").as[LiveDrift.DriftAlert].collect()
        .filter(_.event_type == "m").maxBy(_.upto.getTime)
      val liveHist1 = Seq(5L, 2L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 3L)
      val want1 = LiveDrift.ksAgainst(liveHist1, ref("m"))
      assert((latest.n_live, latest.n_ref, latest.ks_scaled, latest.ks_bp) == want1)
    } finally q.stop()
  }

  test("scale shape: 5k distinct values leave <= |types|*bins windowed-state rows") {
    // a13's bounded-walk contract on the stream: thousands of distinct
    // raw values collapse to <= bins cells per (type, window) BEFORE the
    // shuffle, and stage 2 holds exactly one histogram row per type.
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ref = Map("hot" -> Seq.fill(Bins)(1L))
    val input = MemoryStream[LiveDrift.Event]
    val q = LiveDrift.monitor(input.toDS(), ref, 0L, 4999L, Bins, windowSec = 60L)
      .writeStream.format("memory").queryName("ld_scale")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((0 until 5000).map(v =>
        ev("hot", v + 0.25, "2024-01-01T12:00:30Z")): _*)
      q.processAllAvailable()
      input.addData(ev("hot", 0.0, "2024-01-01T12:02:00Z")) // finalize w0
      q.processAllAvailable()
      val ops = q.recentProgress.reverseIterator
        .map(_.stateOperators).find(_.nonEmpty).getOrElse(fail("no state ops"))
      val aggRows = ops.find(_.operatorName.contains("stateStoreSave"))
        .map(_.numRowsTotal).getOrElse(-1L)
      val fmgwsRows = ops.find(_.operatorName.contains("flatMapGroupsWithState"))
        .map(_.numRowsTotal).getOrElse(-1L)
      assert(aggRows >= 0 && aggRows <= 2L * Bins,
        s"windowed state tracked values, not bins: $aggRows rows for 5k distinct values")
      assert(fmgwsRows == 1L, s"stage-2 state must be 1 histogram row, got $fmgwsRows")
      val latest = spark.table("ld_scale").as[LiveDrift.DriftAlert].collect()
        .maxBy(_.upto.getTime)
      assert(latest.n_live == 5000L, s"dropped events: ${latest.n_live}")
    } finally q.stop()
  }

  test("histogram state survives a checkpointed restart (no loss, no double-fold)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val cp = java.nio.file.Files.createTempDirectory("ld-cp").toString
    val out = java.nio.file.Files.createTempDirectory("ld-out").toString
    val in = java.nio.file.Files.createTempDirectory("ld-in").toString
    def writeLines(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(in, name),
        lines.mkString("\n").getBytes): Unit
    val ref = Map("m" -> Seq(1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L))
    def start() = LiveDrift.monitor(
      spark.readStream.schema("event_type STRING, value DOUBLE, ts TIMESTAMP")
        .json(in).as[LiveDrift.Event], ref, Fmin, Fmax, Bins, windowSec = 60L)
      .writeStream.format("json")
      .option("path", out).option("checkpointLocation", cp)
      .outputMode(OutputMode.Append).start()

    // run 1: w0 holds 3 values in bin 2; the 12:01 row finalizes it — the
    // histogram lands in STATE — then STOP.
    val q1 = start()
    try {
      writeLines("b0.json", Seq(
        """{"event_type": "m", "value": 2.5, "ts": "2024-01-01 12:00:01"}""",
        """{"event_type": "m", "value": 2.5, "ts": "2024-01-01 12:00:02"}""",
        """{"event_type": "m", "value": 2.5, "ts": "2024-01-01 12:00:03"}"""))
      q1.processAllAvailable()
      writeLines("b1.json", Seq(
        """{"event_type": "m", "value": 7.5, "ts": "2024-01-01 12:01:30"}"""))
      q1.processAllAvailable()
    } finally q1.stop()

    // run 2: finalize w1 with a far sentinel. The folded histogram must
    // hold 4 events (3 pre-restart in bin 2, 1 in bin 7) — state crossed
    // the stop; a loss would show 1, a double-fold 7.
    val q2 = start()
    try {
      writeLines("b2.json", Seq(
        """{"event_type": "zz", "value": 0.0, "ts": "2024-01-01 14:00:00"}"""))
      q2.processAllAvailable()
    } finally q2.stop()

    val latest = spark.read
      .schema("event_type STRING, upto TIMESTAMP, n_live BIGINT, n_ref BIGINT, " +
        "ks_scaled BIGINT, ks_bp BIGINT")
      .json(out).as[LiveDrift.DriftAlert].collect()
      .filter(_.event_type == "m").maxBy(_.upto.getTime)
    val wantHist = Seq(0L, 0L, 3L, 0L, 0L, 0L, 0L, 1L, 0L, 0L)
    val want = LiveDrift.ksAgainst(wantHist, ref("m"))
    assert((latest.n_live, latest.n_ref, latest.ks_scaled, latest.ks_bp) == want,
      s"post-restart alert ${latest} != closed form $want")
  }

  test("recentWindows ring: a shift shows at full strength within k windows") {
    // Cumulative mode dilutes a late shift under the accumulated
    // history; the k-window ring forgets it.  Feed 3 on-reference
    // windows then 2 fully-shifted ones: with recentWindows=2 the final
    // live histogram holds ONLY shifted mass → D = 1 (10000 bp), while
    // cumulative mode still carries the old mass and scores lower.
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ref = Map("m" -> Seq(5L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    def feed(input: MemoryStream[LiveDrift.Event], q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      // w0..w2: value 0 (reference bin); w3..w4: value 9 (shifted)
      input.addData(
        ev("m", 0.0, "2024-01-01T00:00:10Z"), ev("m", 0.0, "2024-01-01T00:00:20Z"),
        ev("m", 0.0, "2024-01-01T00:01:10Z"),
        ev("m", 0.0, "2024-01-01T00:02:10Z"),
        ev("m", 9.0, "2024-01-01T00:03:10Z"), ev("m", 9.0, "2024-01-01T00:03:20Z"),
        ev("m", 9.0, "2024-01-01T00:04:10Z"))
      q.processAllAvailable()
      input.addData(ev("zz", 0.0, "2024-01-01T02:00:00Z")) // finalize all
      q.processAllAvailable()
    }
    val inRing = MemoryStream[LiveDrift.Event]
    val qRing = LiveDrift.monitor(inRing.toDS(), ref, Fmin, Fmax, Bins,
      windowSec = 60L, recentWindows = 2)
      .writeStream.format("memory").queryName("ld_ring")
      .outputMode(OutputMode.Append).start()
    try { feed(inRing, qRing) } finally qRing.stop()
    val ring = spark.table("ld_ring").as[LiveDrift.DriftAlert].collect()
      .filter(_.event_type == "m").maxBy(_.upto.getTime)
    // last 2 windows = w3 (2 events) + w4 (1 event), all shifted mass
    assert(ring.n_live == 3L && ring.ks_bp == 10000L,
      s"ring monitor should see only the shifted tail: $ring")

    val inCum = MemoryStream[LiveDrift.Event]
    val qCum = LiveDrift.monitor(inCum.toDS(), ref, Fmin, Fmax, Bins, windowSec = 60L)
      .writeStream.format("memory").queryName("ld_cum")
      .outputMode(OutputMode.Append).start()
    try { feed(inCum, qCum) } finally qCum.stop()
    val cum = spark.table("ld_cum").as[LiveDrift.DriftAlert].collect()
      .filter(_.event_type == "m").maxBy(_.upto.getTime)
    assert(cum.n_live == 7L && cum.ks_bp < 10000L,
      s"cumulative monitor should dilute the shift under history: $cum")
  }

  test("a replayed duplicate window is dropped whole (fold idempotence)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ref = Map("m" -> Seq.fill(Bins)(1L))
    val input = MemoryStream[LiveDrift.Event]
    val q = LiveDrift.monitor(input.toDS(), ref, Fmin, Fmax, Bins, windowSec = 60L)
      .writeStream.format("memory").queryName("ld_dup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev("m", 3.0, "2024-01-01T00:00:05Z"))
      input.addData(ev("m", 3.0, "2024-01-01T00:02:05Z")) // finalizes w0
      q.processAllAvailable()
      // the monitor's guard is lastStart-based, so re-feeding the SAME
      // finalized window's events (a synthetic replay: earlier event-time
      // after the watermark passed) must not re-fold — the windowed agg
      // drops them as late, and even if re-delivered, stage 2's
      // lastStart check rejects starts <= the newest folded one
      input.addData(ev("m", 3.0, "2024-01-01T00:00:06Z"))
      q.processAllAvailable()
      val alerts = spark.table("ld_dup").as[LiveDrift.DriftAlert].collect()
        .filter(_.event_type == "m")
      assert(alerts.map(_.n_live).max == 1L,
        s"duplicate window double-folded: ${alerts.toSeq}")
    } finally q.stop()
  }
}
