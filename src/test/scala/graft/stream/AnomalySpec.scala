package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming rolling z-score anomaly detection (the live form of batch
  * a9): flags appear only after the observed baseline arms, a
  * zero-variance baseline flags any deviation, traffic gaps delay arming
  * but never silently shrink the observed-window frame, idle-TTL state
  * removal forces a clean re-arm, and the count ring survives a
  * checkpointed restart. */
class AnomalySpec extends SparkSpec {

  private def ev(key: String, iso: String) =
    AnomalyZscore.Event(key, java.sql.Timestamp.from(java.time.Instant.parse(iso)))

  /** n events for `key` inside the minute starting at `hhmm`. */
  private def minuteOf(key: String, hhmm: String, n: Int): Seq[AnomalyZscore.Event] =
    Seq.tabulate(n)(i => ev(key, f"2024-01-01T$hhmm:${i % 60}%02dZ"))

  test("spike flags only after the baseline arms; zero-variance flags any deviation") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[AnomalyZscore.Event]
    val flags = AnomalyZscore.anomalies(input.toDS(), windowSec = 60L,
      watermarkDelay = "0 seconds", baselineWindows = 4)
    val q = flags.writeStream.format("memory").queryName("anom")
      .outputMode(OutputMode.Append).start()
    try {
      // w0..w3: 5 each (the arming baseline — no flags possible yet);
      // w4: 6 against a ZERO-VARIANCE baseline of 5s → lhs=4·6−20=4,
      //     rhs=9·(4·100−400)=0 → 16>0 flags, direction +1, base_sum 20;
      // w5: 5 against baseline {5,5,5,6} → lhs²=1, rhs=9·(4·111−441)=27
      //     → quiet;
      // w6: 50 against baseline {5,5,6,5} (same moments) → 179²>27 flags.
      input.addData(
        (minuteOf("a", "12:00", 5) ++ minuteOf("a", "12:01", 5) ++
          minuteOf("a", "12:02", 5) ++ minuteOf("a", "12:03", 5) ++
          minuteOf("a", "12:04", 6) ++ minuteOf("a", "12:05", 5) ++
          minuteOf("a", "12:06", 50)): _*)
      q.processAllAvailable()
      input.addData(ev("a", "2024-01-01T12:08:00Z")) // finalize w6
      q.processAllAvailable()
      val rows = spark.table("anom").collect().map(r =>
        (r.getString(0), r.getTimestamp(1).toInstant.toString,
          r.getLong(2), r.getLong(3), r.getInt(4))).toSet
      assert(rows == Set(
        ("a", "2024-01-01T12:04:00Z", 6L, 20L, 1),
        ("a", "2024-01-01T12:06:00Z", 50L, 21L, 1)), s"got $rows")
    } finally q.stop()
  }

  test("a volume DROP flags with direction −1") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[AnomalyZscore.Event]
    val flags = AnomalyZscore.anomalies(input.toDS(), windowSec = 60L,
      watermarkDelay = "0 seconds", baselineWindows = 4)
    val q = flags.writeStream.format("memory").queryName("anom_drop")
      .outputMode(OutputMode.Append).start()
    try {
      // flat 5s, then n=1: lhs=4·1−20=−16 → 256 > rhs=0: a −1 drop alert
      input.addData(
        (minuteOf("d", "12:00", 5) ++ minuteOf("d", "12:01", 5) ++
          minuteOf("d", "12:02", 5) ++ minuteOf("d", "12:03", 5) ++
          minuteOf("d", "12:04", 1)): _*)
      q.processAllAvailable()
      input.addData(ev("d", "2024-01-01T12:06:00Z"))
      q.processAllAvailable()
      val rows = spark.table("anom_drop").collect().map(r =>
        (r.getString(0), r.getTimestamp(1).toInstant.toString,
          r.getLong(2), r.getLong(3), r.getInt(4))).toSet
      assert(rows == Set(("d", "2024-01-01T12:04:00Z", 1L, 20L, -1)), s"got $rows")
    } finally q.stop()
  }

  test("a traffic gap delays nothing away: the OBSERVED baseline carries across it") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[AnomalyZscore.Event]
    val flags = AnomalyZscore.anomalies(input.toDS(), windowSec = 60L,
      watermarkDelay = "0 seconds", baselineWindows = 4)
    val q = flags.writeStream.format("memory").queryName("anom_gap")
      .outputMode(OutputMode.Append).start()
    try {
      // 4 observed windows, then 6 silent minutes, then a spike: a9's
      // ROWS-frame semantics mean the pre-gap windows still form the
      // baseline — the spike must flag against base_sum=20.
      input.addData(
        (minuteOf("g", "12:00", 5) ++ minuteOf("g", "12:01", 5) ++
          minuteOf("g", "12:02", 5) ++ minuteOf("g", "12:03", 5) ++
          minuteOf("g", "12:10", 20)): _*)
      q.processAllAvailable()
      input.addData(ev("g", "2024-01-01T12:12:00Z"))
      q.processAllAvailable()
      val rows = spark.table("anom_gap").collect().map(r =>
        (r.getString(0), r.getTimestamp(1).toInstant.toString,
          r.getLong(2), r.getLong(3), r.getInt(4))).toSet
      assert(rows == Set(("g", "2024-01-01T12:10:00Z", 20L, 20L, 1)), s"got $rows")
    } finally q.stop()
  }

  test("idle TTL removes state and the key must re-arm from scratch") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[AnomalyZscore.Event]
    val flags = AnomalyZscore.anomalies(input.toDS(), windowSec = 60L,
      watermarkDelay = "0 seconds", baselineWindows = 2,
      idleTtlMs = Some(5L * 60000L)) // 5 minutes idle → drop the ring
    val q = flags.writeStream.format("memory").queryName("anom_ttl")
      .outputMode(OutputMode.Append).start()
    try {
      // arm (w0,w1), flag at w2 — then the key goes idle while another
      // key advances the watermark far past the TTL.
      input.addData(
        (minuteOf("t", "12:00", 5) ++ minuteOf("t", "12:01", 5) ++
          minuteOf("t", "12:02", 50) ++ minuteOf("other", "12:03", 1)): _*)
      q.processAllAvailable()
      input.addData(ev("other", "2024-01-01T13:00:00Z")) // watermark >> TTL
      q.processAllAvailable()
      input.addData(ev("other", "2024-01-01T14:00:00Z")) // fire the timeout
      q.processAllAvailable()
      // the key wakes: a huge window against a REMOVED ring must NOT flag
      // (ring empty = unarmed), and two fresh windows later it flags again.
      input.addData(
        (minuteOf("t", "15:00", 90) ++ minuteOf("t", "15:01", 5) ++
          minuteOf("t", "15:02", 5) ++ minuteOf("t", "15:03", 40)): _*)
      q.processAllAvailable()
      input.addData(ev("other", "2024-01-01T16:00:00Z"))
      q.processAllAvailable()
      val tRows = spark.table("anom_ttl").collect()
        .filter(_.getString(0) == "t").map(r =>
          (r.getTimestamp(1).toInstant.toString, r.getLong(2), r.getLong(3))).toSet
      // 12:02 flagged pre-idle.  15:00 (n=90) must NOT flag: the ring was
      // removed, so the key is unarmed — had the TTL failed to fire, the
      // surviving {5,50} ring would instead flag 15:01 as a −1 drop
      // (lhs²=16900 > rhs=14400), so the assertion detects a dead TTL.
      // 15:02 vs re-armed {90,5}: lhs²=7225 ≤ rhs=65025, quiet;
      // 15:03 vs {5,5}: lhs=2·40−10=70 → 4900 > 0: flags.
      assert(tRows == Set(
        ("2024-01-01T12:02:00Z", 50L, 10L),
        ("2024-01-01T15:03:00Z", 40L, 10L)), s"got $tRows")
    } finally q.stop()
  }

  test("high-cardinality idle TTL: 10k keys' state plateaus, expires to the live set, re-arms") {
    // The contract a 100 TB operator needs from idleTtlMs: state is
    // bounded by the LIVE key set, not by every key ever seen.  Plant
    // 10,000 one-window keys, let the TTL expire them, and assert the
    // flatMapGroupsWithState state-store row count (the ring count) drops
    // from ~10k to the handful of still-live keys — then wake an expired
    // key and assert it re-arms from scratch (W fresh windows before any
    // flag).  The metric is the gate: ring sizes here are 1 (< W), so
    // flag outputs alone could not distinguish a dead TTL.
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[AnomalyZscore.Event]
    val flags = AnomalyZscore.anomalies(input.toDS(), windowSec = 60L,
      watermarkDelay = "0 seconds", baselineWindows = 2,
      idleTtlMs = Some(5L * 60000L))
    val q = flags.writeStream.format("memory").queryName("anom_hc")
      .outputMode(OutputMode.Append).start()
    def ringRows(): Long = q.recentProgress.reverseIterator
      .flatMap(_.stateOperators.filter(_.operatorName.contains("flatMapGroupsWithState")))
      .map(_.numRowsTotal).buffered.headOption.getOrElse(-1L)
    try {
      val keys = (0 until 10000).map(i => s"k$i")
      // phase 1: every key posts ONE event in w0; the driver key advances
      // the watermark so w0 finalizes → one ring per key in the store
      input.addData(keys.map(k => ev(k, "2024-01-01T12:00:00Z")): _*)
      input.addData(ev("driver", "2024-01-01T12:01:30Z"))
      q.processAllAvailable()
      input.addData(ev("driver", "2024-01-01T12:02:30Z")) // finalize driver w1
      q.processAllAvailable()
      val armed = ringRows()
      assert(armed >= 10000 && armed <= 10002,
        s"expected ~10001 rings after arming, store has $armed")
      // phase 2: watermark far past every deadAt (12:00:59.999 + 5 min),
      // then one more batch so the event-time timeouts fire
      input.addData(ev("driver", "2024-01-01T13:00:00Z"))
      q.processAllAvailable()
      input.addData(ev("driver", "2024-01-01T14:00:00Z"))
      q.processAllAvailable()
      val expired = ringRows()
      assert(expired >= 0 && expired <= 2,
        s"TTL did not shrink state to the live set: $expired rings remain " +
          s"(was $armed) — ring count must track LIVE keys, not keys ever seen")
      // phase 3: an expired key wakes with a huge window — it must be
      // UNARMED (no flag), and flags again only after W fresh windows
      input.addData(
        (minuteOf("k42", "15:00", 90) ++ minuteOf("k42", "15:01", 5) ++
          minuteOf("k42", "15:02", 5) ++ minuteOf("k42", "15:03", 40)): _*)
      q.processAllAvailable()
      input.addData(ev("driver", "2024-01-01T16:00:00Z"))
      q.processAllAvailable()
      val k42 = spark.table("anom_hc").collect()
        .filter(_.getString(0) == "k42").map(r =>
          (r.getTimestamp(1).toInstant.toString, r.getLong(2), r.getLong(3))).toSet
      // 15:00 (n=90) unarmed → quiet; 15:02 vs {90,5} quiet; 15:03 vs
      // {5,5}: lhs=2·40−10=70 → 4900 > 0 flags — the re-armed baseline is
      // built ONLY from post-expiry windows
      assert(k42 == Set(("2024-01-01T15:03:00Z", 40L, 10L)), s"got $k42")
    } finally q.stop()
  }

  test("the count ring survives a checkpointed restart") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val cp = java.nio.file.Files.createTempDirectory("anom-cp").toString
    val out = java.nio.file.Files.createTempDirectory("anom-out").toString
    val in = java.nio.file.Files.createTempDirectory("anom-in").toString
    def writeLines(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(in, name),
        lines.mkString("\n").getBytes)
    def source(): org.apache.spark.sql.Dataset[AnomalyZscore.Event] =
      spark.readStream.schema("key STRING, ts TIMESTAMP")
        .json(in).as[AnomalyZscore.Event]
    def start() = AnomalyZscore.anomalies(source(), windowSec = 60L,
      watermarkDelay = "0 seconds", baselineWindows = 2)
      .writeStream.format("json")
      .option("path", out).option("checkpointLocation", cp)
      .outputMode(OutputMode.Append).start()
    def lines(key: String, hhmm: String, n: Int): Seq[String] =
      Seq.tabulate(n)(i =>
        s"""{"key": "$key", "ts": "2024-01-01 $hhmm:${f"${i % 60}%02d"}"}""")

    // run 1: finalize w0 (n=3) and w1 (n=4) — the armed W=2 ring — and
    // STOP.  The watermark-advancing batch lands n=4 in w2 (12:02), a
    // count CHOSEN to evaluate quiet against the [3,4] ring after the
    // restart (lhs²=1 ≤ rhs=9), so the only flag comes from the spike.
    val q1 = start()
    try {
      writeLines("b0.json", lines("r", "12:00", 3) ++ lines("r", "12:01", 4))
      q1.processAllAvailable()
      writeLines("b1.json", lines("r", "12:02", 4).map(_.replace("12:02:0", "12:02:3")))
      q1.processAllAvailable()
    } finally q1.stop()

    // run 2: the spike lands in w3 (n=49).  When it finalizes, the ring
    // is [4,4] — w1's 4 crossed the stop inside the state store.  Had
    // state been lost, the ring at that point would hold only w2 (size
    // 1 < W) and NOTHING could flag.
    val q2 = start()
    try {
      writeLines("b2.json", lines("r", "12:03", 49))
      q2.processAllAvailable()
      writeLines("b3.json", Seq("""{"key": "r", "ts": "2024-01-01 12:05:00"}"""))
      q2.processAllAvailable()
    } finally q2.stop()

    val got = spark.read.schema(
      "key STRING, window_start TIMESTAMP, n BIGINT, base_sum BIGINT, direction INT")
      .json(out).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toInstant.toString,
        r.getLong(2), r.getLong(3), r.getInt(4))).toSet
    assert(got == Set(("r", "2024-01-01T12:03:00Z", 49L, 8L, 1)), s"got $got")
  }
}
