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
      watermarkDelay = "0 seconds", factorBp = 20000L, minCount = 3L)
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

  test("burst state survives a checkpointed restart (adjacency baseline crosses the stop)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cp = java.nio.file.Files.createTempDirectory("burst-cp").toString
    val out = java.nio.file.Files.createTempDirectory("burst-out").toString
    val in = java.nio.file.Files.createTempDirectory("burst-in").toString
    // file source, not MemoryStream: a restarted MemoryStream restarts
    // its offsets at 0, so its post-restart batches read as already
    // committed — the file source is the one that recovers offsets
    def writeLines(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(in, name),
        lines.mkString("\n").getBytes)
    def source(): org.apache.spark.sql.Dataset[TrendBurst.Post] =
      spark.readStream
        .schema("label STRING, ts TIMESTAMP")
        .json(in).as[TrendBurst.Post]
    def start() = TrendBurst.bursts(source(), windowSec = 60L,
      watermarkDelay = "0 seconds", factorBp = 20000L, minCount = 3L)
      .writeStream.format("json")
      .option("path", out).option("checkpointLocation", cp)
      .outputMode(OutputMode.Append).start()

    // run 1: finalize w0 (3 posts) — it becomes the adjacency baseline
    // held in the state store — then STOP.  w1 opens with 8 posts but
    // cannot finalize yet (watermark stops at :01:58).
    writeLines("b1.json", Seq(
      """{"label": "pos", "ts": "2024-01-01 12:00:10"}""",
      """{"label": "pos", "ts": "2024-01-01 12:00:30"}""",
      """{"label": "pos", "ts": "2024-01-01 12:00:50"}""",
      """{"label": "pos", "ts": "2024-01-01 12:01:02"}""",
      """{"label": "pos", "ts": "2024-01-01 12:01:10"}""",
      """{"label": "pos", "ts": "2024-01-01 12:01:18"}""",
      """{"label": "pos", "ts": "2024-01-01 12:01:26"}""",
      """{"label": "pos", "ts": "2024-01-01 12:01:34"}""",
      """{"label": "pos", "ts": "2024-01-01 12:01:42"}""",
      """{"label": "pos", "ts": "2024-01-01 12:01:50"}""",
      """{"label": "pos", "ts": "2024-01-01 12:01:58"}"""))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()

    // run 2: SAME checkpoint — the :02:30 straggler finalizes w1, whose
    // burst verdict needs BOTH the open w1 counts and the w0 baseline
    // recovered from the state store
    writeLines("b2.json", Seq("""{"label": "pos", "ts": "2024-01-01 12:02:30"}"""))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()

    val rows = spark.read.json(out)
      .select("label", "window_start", "n", "prev_n", "burst").collect()
      .map(r => (r.getString(0), r.getAs[String]("window_start"),
        r.getAs[Long]("n"), r.getAs[Long]("prev_n"), r.getAs[Boolean]("burst")))
    val w1 = rows.filter(_._3 == 8L)
    assert(w1.length == 1, s"w1 emitted ${w1.length} times across the restart: ${rows.mkString(";")}")
    assert(w1.head._4 == 3L && w1.head._5,
      s"post-restart w1 lost its pre-restart baseline: ${w1.head}")
  }

  test("a quiet key's open window finalizes by timeout when other keys advance the watermark") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TrendBurst.Post]
    val flags = TrendBurst.bursts(input.toDS(), windowSec = 60L,
      watermarkDelay = "0 seconds", factorBp = 20000L, minCount = 3L)
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
