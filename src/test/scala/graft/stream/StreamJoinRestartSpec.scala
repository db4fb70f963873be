package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.streaming.OutputMode

/** Join-state durability: a view buffered in the stream-stream join's
  * state store (no click yet) must survive a checkpointed stop/start and
  * still attribute a click that only arrives AFTER recovery — the
  * operational property that lets a 100 TB attribution pipeline restart
  * executors without dropping in-flight matches. File sources (not
  * MemoryStream) so offsets recover, same pattern as TrendBurstSpec's
  * restart test. */
class StreamJoinRestartSpec extends SparkSpec {

  test("buffered view state survives restart and matches a post-recovery click") {
    import spark.implicits._
    val cp = java.nio.file.Files.createTempDirectory("sj-cp").toString
    val out = java.nio.file.Files.createTempDirectory("sj-out").toString
    val inV = java.nio.file.Files.createTempDirectory("sj-views").toString
    val inC = java.nio.file.Files.createTempDirectory("sj-clicks").toString
    def write(dir: String, name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        lines.mkString("\n").getBytes)
    def start() = {
      val views = spark.readStream
        .schema("user_id LONG, view_id LONG, view_ts TIMESTAMP")
        .json(inV).as[StreamJoin.View]
      val clicks = spark.readStream
        .schema("user_id LONG, click_id LONG, click_ts TIMESTAMP")
        .json(inC).as[StreamJoin.Click]
      StreamJoin.inner(views, clicks, horizonSec = 600L, delay = "0 seconds")
        .writeStream.format("json")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode(OutputMode.Append).start()
    }

    // run 1: the view arrives, no click — it sits in join state. A second
    // user's matched pair proves the join is live before the stop.
    write(inV, "v1.json", Seq(
      """{"user_id": 1, "view_id": 100, "view_ts": "2024-01-01 12:00:00"}""",
      """{"user_id": 2, "view_id": 200, "view_ts": "2024-01-01 12:00:00"}"""))
    write(inC, "c1.json", Seq(
      """{"user_id": 2, "click_id": 9200, "click_ts": "2024-01-01 12:01:00"}"""))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()

    // run 2: SAME checkpoint — user 1's click arrives only now, within the
    // horizon; it can match only if view 100 was recovered from state.
    write(inC, "c2.json", Seq(
      """{"user_id": 1, "click_id": 9100, "click_ts": "2024-01-01 12:05:00"}"""))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()

    val rows = spark.read.json(out)
      .select("view_id", "click_id").collect()
      .map(r => (r.getAs[Long]("view_id"), r.getAs[Long]("click_id"))).toSet
    assert(rows == Set((200L, 9200L), (100L, 9100L)),
      s"post-restart attribution wrong: $rows")
  }
}
