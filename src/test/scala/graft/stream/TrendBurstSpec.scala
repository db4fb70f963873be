package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming trend/burst detection (the live form of batch a8): a planted
  * burst must flag within one window of the watermark passing it, gaps
  * must not fake growth (adjacency guard), and windows with no successor
  * traffic on their own key must still finalize via event-time timeout
  * when OTHER keys advance the global watermark. */
class TrendBurstSpec extends SparkSpec {

  private def post(label: String, iso: String) =
    TrendBurst.Post(label, java.sql.Timestamp.from(java.time.Instant.parse(iso)))

  test("planted burst flags within one window; gap windows never flag") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TrendBurst.Post]
    // 60 s windows, zero-delay watermark (tests drive time explicitly)
    val flags = TrendBurst.bursts(input.toDS(), windowSec = 60L,
      watermarkDelay = "0 seconds", factor = 2L, minCount = 3L)
    val q = flags.writeStream
      .format("memory").queryName("bursts").outputMode(OutputMode.Append).start()
    try {
      // w0 (12:00): 3 pos posts; w1 (12:01): 8 pos posts — a 2.7× burst.
      // neg: 5 posts in w0, then silence in w1, then 10 in w2 — a GAP:
      // w2 must NOT flag despite 10 ≥ 2×0.
      input.addData(
        (Seq("12:00:05", "12:00:25", "12:00:45").map(t => post("pos", s"2024-01-01T${t}Z")) ++
          Seq("12:01:02", "12:01:10", "12:01:18", "12:01:26", "12:01:34",
            "12:01:42", "12:01:50", "12:01:58").map(t => post("pos", s"2024-01-01T${t}Z")) ++
          Seq("12:00:10", "12:00:20", "12:00:30", "12:00:40", "12:00:50")
            .map(t => post("neg", s"2024-01-01T${t}Z")) ++
          Seq.tabulate(10)(i => post("neg", f"2024-01-01T12:02:${i * 5}%02dZ"))): _*)
      q.processAllAvailable()
      // advance the watermark past w2's end (12:03) with one later event;
      // every planted window is now final — the burst must appear in THIS
      // micro-batch (within one window of arrival)
      input.addData(post("pos", "2024-01-01T12:03:30Z"))
      q.processAllAvailable()
      val rows = spark.table("bursts").collect().map(r =>
        (r.getString(0), r.getTimestamp(1).toInstant.toString,
          r.getLong(2), r.getLong(3), r.getBoolean(4))).toSet
      assert(rows == Set(
        ("pos", "2024-01-01T12:00:00Z", 3L, 0L, false),  // no predecessor
        ("pos", "2024-01-01T12:01:00Z", 8L, 3L, true),   // 8 ≥ 2×3: burst
        ("neg", "2024-01-01T12:00:00Z", 5L, 0L, false),
        ("neg", "2024-01-01T12:02:00Z", 10L, 0L, false)), // gap: guarded
        s"got $rows")
    } finally q.stop()
  }

  test("a quiet key's open window finalizes by timeout when other keys advance the watermark") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TrendBurst.Post]
    val flags = TrendBurst.bursts(input.toDS(), windowSec = 60L,
      watermarkDelay = "0 seconds", factor = 2L, minCount = 3L)
    val q = flags.writeStream
      .format("memory").queryName("bursts_to").outputMode(OutputMode.Append).start()
    try {
      input.addData(
        post("quiet", "2024-01-01T12:00:10Z"),
        post("busy", "2024-01-01T12:00:20Z"))
      q.processAllAvailable()
      // only "busy" ever speaks again; its events push the global
      // watermark past quiet's w0, whose finalization must then fire via
      // the event-time timeout (empty-iterator path)
      input.addData(post("busy", "2024-01-01T12:05:00Z"))
      q.processAllAvailable()
      input.addData(post("busy", "2024-01-01T12:06:00Z"))
      q.processAllAvailable()
      val byKey = spark.table("bursts_to").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toInstant.toString)).toSet
      assert(byKey.contains(("quiet", "2024-01-01T12:00:00Z")),
        s"quiet key's window never finalized: $byKey")
    } finally q.stop()
  }
}
