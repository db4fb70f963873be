package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Stream-stream interval joins (attribution) and stream-static
  * enrichment: in-horizon clicks match, out-of-horizon clicks don't,
  * and the left-outer null row for an unconverted view is emitted ONLY
  * after the watermark proves no click can still arrive — the defining
  * stream-stream outer-join semantic. */
class StreamJoinSpec extends SparkSpec {

  private def ts(iso: String) =
    java.sql.Timestamp.from(java.time.Instant.parse(iso))
  private def view(u: Long, id: Long, iso: String) =
    StreamJoin.View(u, id, ts(iso))
  private def click(u: Long, id: Long, iso: String) =
    StreamJoin.Click(u, id, ts(iso))

  test("inner interval join: only clicks within the horizon attribute") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[StreamJoin.View]
    val clicks = MemoryStream[StreamJoin.Click]
    // 600 s horizon: u1's click at +5 min matches, u1's click at +20 min
    // does not; u2's click 10 s BEFORE the view does not (click_ts >= view_ts).
    val joined = StreamJoin.inner(views.toDS(), clicks.toDS(), horizonSec = 600L)
    val q = joined.writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append).start()
    try {
      views.addData(
        view(1L, 100L, "2024-01-01T12:00:00Z"),
        view(2L, 200L, "2024-01-01T12:00:00Z"))
      clicks.addData(
        click(1L, 9001L, "2024-01-01T12:05:00Z"),   // in horizon → match
        click(1L, 9002L, "2024-01-01T12:20:00Z"),   // past horizon → no
        click(2L, 9003L, "2024-01-01T11:59:50Z"),   // before the view → no
        click(3L, 9004L, "2024-01-01T12:01:00Z"))   // no view for u3 → no
      q.processAllAvailable()
      val rows = spark.table("attr").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      assert(rows == Set((1L, 100L, 9001L)), s"got ${rows.mkString(", ")}")
    } finally q.stop()
  }

  test("left-outer: unconverted view emits its null row only after the watermark closes the horizon") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[StreamJoin.View]
    val clicks = MemoryStream[StreamJoin.Click]
    val joined = StreamJoin.leftOuter(views.toDS(), clicks.toDS(),
      horizonSec = 600L, delay = "0 seconds")
    val q = joined.writeStream.format("memory").queryName("attr_outer")
      .outputMode(OutputMode.Append).start()
    try {
      views.addData(
        view(1L, 100L, "2024-01-01T12:00:00Z"),  // will convert
        view(2L, 200L, "2024-01-01T12:00:00Z"))  // never converts
      clicks.addData(click(1L, 9001L, "2024-01-01T12:03:00Z"))
      q.processAllAvailable()
      val early = spark.table("attr_outer").collect()
        .map(r => (r.getLong(1), Option(r.get(3)))).toSet
      // matched pair may emit immediately; the null row for view 200 MUST
      // NOT exist yet — its horizon (12:10) is still open
      assert(early == Set((100L, Some(9001L))), s"premature null row: $early")
      // advance both watermarks past 12:10 (min of the two is the global
      // watermark) — the unconverted view's null row must now flush
      views.addData(view(9L, 900L, "2024-01-01T12:30:00Z"))
      clicks.addData(click(9L, 9900L, "2024-01-01T12:30:00Z"))
      q.processAllAvailable()
      val late = spark.table("attr_outer").collect()
        .map(r => (r.getLong(1), Option(r.get(3)))).toSet
      assert(late.contains((200L, None)),
        s"null row for unconverted view missing after watermark: $late")
    } finally q.stop()
  }

  test("stream-static: dimension enrichment joins the batch dim per micro-batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[StreamJoin.View]
    val dim = Seq((1L, "gold"), (2L, "free")).toDF("user_id", "tier")
    val enriched = StreamJoin.enrichWithDim(views.toDS().toDF(), dim)
    val q = enriched.writeStream.format("memory").queryName("enriched_dim")
      .outputMode(OutputMode.Append).start()
    try {
      views.addData(
        view(1L, 100L, "2024-01-01T12:00:00Z"),
        view(3L, 300L, "2024-01-01T12:00:00Z")) // not in dim → null tier
      q.processAllAvailable()
      val rows = spark.table("enriched_dim").collect()
        .map(r => (r.getLong(r.fieldIndex("view_id")),
          Option(r.get(r.fieldIndex("tier"))))).toSet
      assert(rows == Set((100L, Some("gold")), (300L, None)), s"got $rows")
    } finally q.stop()
  }
}
