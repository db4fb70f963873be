package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Left-outer interval-join semantics under a REAL watermark delay with
  * deliberately late data — the round-5 parity runs were happy-path
  * (delay = 0, nothing late).  With delay = 30 s and horizon = 600 s:
  *
  *  (a) a click whose event time is inside its view's horizon but which
  *      ARRIVES after the watermark closed that horizon must NOT join —
  *      the view's buffered state is already dropped and the late click
  *      is filtered by the watermark, so attribution cannot resurrect;
  *
  *  (b) the unconverted view's null row is emitted EXACTLY ONCE, and only
  *      in the micro-batch where the watermark first proves no matching
  *      click can still arrive (watermark past view_ts + horizon) — never
  *      earlier, never again (no duplicate, no retraction) even when the
  *      straggler later shows up. */
class StreamJoinLateDataSpec extends SparkSpec {

  private def ts(iso: String) =
    java.sql.Timestamp.from(java.time.Instant.parse(iso))
  private def view(u: Long, id: Long, iso: String) =
    StreamJoin.View(u, id, ts(iso))
  private def click(u: Long, id: Long, iso: String) =
    StreamJoin.Click(u, id, ts(iso))

  test("30s-delay left-outer: late click never joins; null row emits exactly once, on time") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[StreamJoin.View]
    val clicks = MemoryStream[StreamJoin.Click]
    val joined = StreamJoin.leftOuter(views.toDS(), clicks.toDS(),
      horizonSec = 600L, delay = "30 seconds")
    val q = joined.writeStream.format("memory").queryName("attr_late")
      .outputMode(OutputMode.Append).start()
    def rows() = spark.table("attr_late").collect()
      .map(r => (r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Long])))

    try {
      // batch 1: u1 converts; u2 does not (yet). Watermark stays before
      // u2's horizon end (12:10), so no null row may exist.
      views.addData(
        view(1L, 100L, "2024-01-01T12:00:00Z"),
        view(2L, 200L, "2024-01-01T12:00:00Z"))
      clicks.addData(click(1L, 9001L, "2024-01-01T12:05:00Z"))
      q.processAllAvailable()
      assert(!rows().exists(_._1 == 200L),
        s"null row before the watermark closed the horizon: ${rows().toSeq}")

      // batch 2: both sides advance to 12:15 ⇒ watermark = 12:14:30,
      // past u2's horizon end (12:10) + delay ⇒ the null row must flush NOW.
      views.addData(view(8L, 800L, "2024-01-01T12:15:00Z"))
      clicks.addData(click(8L, 9800L, "2024-01-01T12:15:00Z"))
      q.processAllAvailable()
      assert(rows().count(_ == (200L, None)) == 1,
        s"expected exactly one null row for view 200: ${rows().toSeq}")

      // batch 3: the STRAGGLER — event time 12:08 is inside u2's horizon,
      // but the watermark (12:14:30) already dropped u2's view state and
      // filters this click as late. It must neither join nor disturb the
      // already-emitted null row.
      clicks.addData(click(2L, 9002L, "2024-01-01T12:08:00Z"))
      q.processAllAvailable()
      // one more watermark advance to flush anything the straggler
      // might wrongly have buffered
      views.addData(view(9L, 900L, "2024-01-01T12:40:00Z"))
      clicks.addData(click(9L, 9900L, "2024-01-01T12:40:00Z"))
      q.processAllAvailable()

      val finalRows = rows()
      assert(!finalRows.exists(_._2.contains(9002L)),
        s"late click joined after its view's state was dropped: ${finalRows.toSeq}")
      assert(finalRows.count(_._1 == 200L) == 1 &&
        finalRows.count(_ == (200L, None)) == 1,
        s"view 200 must have exactly its single null row: ${finalRows.toSeq}")
      // sanity: on-time matches all attributed
      assert(finalRows.contains((100L, Some(9001L))) &&
        finalRows.contains((800L, Some(9800L))), s"lost on-time matches: ${finalRows.toSeq}")
    } finally q.stop()
  }
}
